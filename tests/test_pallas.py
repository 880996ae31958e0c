"""Pallas kernel parity tests (interpret mode — runs on the CPU backend).

The fused coordinate-descent kernel must reproduce the XLA reference path's
iterate exactly (same Gauss-Seidel order, same maintained-residual algebra);
these tests pin that contract without TPU hardware via ``interpret=True``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flashdeconv_tpu.ops.bcd import (
    coordinate_descent,
    coordinate_descent_pallas,
    neighbor_sum,
)


def _operands(n=1024, k=7, deg=6, seed=0):
    rng = np.random.RandomState(seed)
    beta = jnp.asarray(np.abs(rng.randn(n, k)), jnp.float32)
    Xs = rng.randn(k, 64)
    XtX = jnp.asarray(Xs @ Xs.T, jnp.float32)
    Xty = jnp.asarray(np.abs(rng.randn(n, k)) * 5, jnp.float32)
    nbr = jnp.asarray(rng.randint(0, n + 1, size=(n, deg)), jnp.int32)
    nnb = jnp.asarray((np.asarray(nbr) < n).sum(1), jnp.float32)
    beta_ext = jnp.concatenate([beta, jnp.zeros((1, k), jnp.float32)])
    ns = neighbor_sum(beta_ext, nbr)
    return beta, Xty, XtX, ns, nnb


@pytest.mark.parametrize("lam,rho", [(0.0, 0.0), (0.5, 0.1), (3.0, 2.0)])
def test_pallas_matches_xla_path(lam, rho):
    beta, Xty, XtX, ns, nnb = _operands()
    ref = coordinate_descent(
        beta, Xty, XtX, ns, nnb, jnp.float32(lam), jnp.float32(rho)
    )
    out = coordinate_descent_pallas(
        beta, Xty, XtX, ns, nnb, jnp.float32(lam), jnp.float32(rho),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_multiblock_grid():
    beta, Xty, XtX, ns, nnb = _operands(n=2048, k=12, seed=3)
    ref = coordinate_descent(
        beta, Xty, XtX, ns, nnb, jnp.float32(1.0), jnp.float32(0.5)
    )
    out = coordinate_descent_pallas(
        beta, Xty, XtX, ns, nnb, jnp.float32(1.0), jnp.float32(0.5),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_padded_rows_stay_zero():
    """All-zero rows with zero Xty and no neighbors must remain exactly zero."""
    beta, Xty, XtX, ns, nnb = _operands(n=1024, k=5, seed=1)
    dead = np.zeros(1024, dtype=bool)
    dead[1000:] = True
    beta = beta.at[1000:].set(0.0)
    Xty = Xty.at[1000:].set(0.0)
    ns = ns.at[1000:].set(0.0)
    nnb = nnb.at[1000:].set(0.0)
    out = coordinate_descent_pallas(
        beta, Xty, XtX, ns, nnb, jnp.float32(0.7), jnp.float32(0.2),
        interpret=True,
    )
    assert np.all(np.asarray(out)[dead] == 0.0)
