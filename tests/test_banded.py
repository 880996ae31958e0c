"""Banded neighbor-sum decomposition: host split + device parity."""

import numpy as np
import pytest
from scipy import sparse

import jax.numpy as jnp

from flashdeconv_tpu.ops.bcd import neighbor_sum, neighbor_sum_banded
from flashdeconv_tpu.utils.graph import (
    adjacency_to_padded,
    banded_split,
    build_knn_graph,
    grid_coords,
)


def _grid_graph(side=40, k=6):
    coords = grid_coords(side=side)
    return build_knn_graph(coords, k=k), coords


class TestBandedSplit:
    def test_reconstructs_adjacency(self):
        A, _ = _grid_graph()
        n = A.shape[0]
        offsets, masks, A_rest = banded_split(A)
        # rebuild: edge (i, i+o) for every mask bit + rest
        rows, cols = [], []
        for u, o in enumerate(offsets):
            r = np.flatnonzero(masks[u])
            rows.append(r)
            cols.append(r + o)
        rows = np.concatenate(rows + [A_rest.tocoo().row])
        cols = np.concatenate(cols + [A_rest.tocoo().col])
        A2 = sparse.csr_matrix(
            (np.ones(rows.size), (rows, cols)), shape=(n, n)
        )
        assert (A2 != A.tocsr()).nnz == 0

    def test_grid_is_fully_banded(self):
        A, _ = _grid_graph()
        offsets, masks, A_rest = banded_split(A, max_offsets=16)
        # kNN on a uniform grid concentrates on <=16 offsets entirely
        assert A_rest.nnz / A.nnz < 0.05
        assert offsets.size <= 16
        assert 0 not in offsets.tolist()

    def test_random_coords_low_coverage_returns_rest(self):
        rng = np.random.RandomState(0)
        coords = rng.rand(500, 2) * 100
        A = build_knn_graph(coords, k=6)
        offsets, masks, A_rest = banded_split(A, min_coverage=0.9)
        if offsets.size == 0:  # rejected: everything in rest
            assert (A_rest != A.tocsr()).nnz == 0

    def test_empty_graph(self):
        A = sparse.csr_matrix((10, 10))
        offsets, masks, A_rest = banded_split(A)
        assert offsets.size == 0 and A_rest.nnz == 0


class TestNeighborSumBanded:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_gather_path(self, seed):
        A, _ = _grid_graph(side=30)
        n = A.shape[0]
        rng = np.random.RandomState(seed)
        beta = jnp.asarray(rng.randn(n, 6))

        nbr, _ = adjacency_to_padded(A)
        beta_ext = jnp.concatenate([beta, jnp.zeros((1, 6))])
        expected = neighbor_sum(beta_ext, jnp.asarray(nbr))

        offsets, masks, A_rest = banded_split(A)
        if A_rest.nnz:
            rest_nbr, _ = adjacency_to_padded(A_rest)
        else:
            rest_nbr = np.zeros((n, 0), dtype=np.int32)
        halo = int(np.max(np.abs(offsets))) if offsets.size else 0
        out = neighbor_sum_banded(
            beta, tuple(int(o) for o in offsets),
            jnp.asarray(masks, beta.dtype), jnp.asarray(rest_nbr), halo,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   atol=1e-12)

    def test_matches_spmv(self):
        """Banded + rest must equal A @ beta exactly."""
        A, _ = _grid_graph(side=25, k=8)
        n = A.shape[0]
        rng = np.random.RandomState(3)
        beta_np = rng.randn(n, 4)
        offsets, masks, A_rest = banded_split(A, max_offsets=8)
        if A_rest.nnz:
            rest_nbr, _ = adjacency_to_padded(A_rest)
        else:
            rest_nbr = np.zeros((n, 0), dtype=np.int32)
        halo = int(np.max(np.abs(offsets))) if offsets.size else 0
        out = neighbor_sum_banded(
            jnp.asarray(beta_np), tuple(int(o) for o in offsets),
            jnp.asarray(masks, jnp.float64), jnp.asarray(rest_nbr), halo,
        )
        np.testing.assert_allclose(np.asarray(out), A @ beta_np, atol=1e-12)


def test_bcd_solve_banded_matches_gather():
    """bcd_solve must give identical results whether or not the banded path
    triggers (force both by problem size around the 8192 threshold)."""
    from flashdeconv_tpu.core.solver import bcd_solve

    side = 96  # 9216 spots >= 8192 threshold -> banded path on grid
    A, coords = _grid_graph(side=side)
    n = A.shape[0]
    rng = np.random.RandomState(0)
    k_types, d = 6, 32
    Xs = rng.randn(k_types, d)
    Ys = np.abs(rng.randn(n, k_types)) @ Xs + 0.05 * rng.randn(n, d)

    beta_banded, info_b = bcd_solve(
        Ys, Xs, A, lambda_=0.3, rho=0.01, max_iter=30, dtype=np.float64
    )

    # same problem with the graph shuffled so banding is rejected
    perm = rng.permutation(n)
    inv = np.empty(n, dtype=int)
    inv[perm] = np.arange(n)
    A_shuf = A.tocsr()[perm][:, perm]
    beta_shuf, info_s = bcd_solve(
        Ys[perm], Xs, A_shuf, lambda_=0.3, rho=0.01, max_iter=30,
        dtype=np.float64,
    )
    np.testing.assert_allclose(beta_shuf[inv], beta_banded, atol=1e-9)
    assert info_b["n_iterations"] == info_s["n_iterations"]


def test_bcd_solve_reorders_scrambled_grid_with_coords():
    """With coords given, a scrambled grid is row-major re-sorted internally
    (banded fast path) and the result still comes back in input order."""
    from flashdeconv_tpu.core.solver import bcd_solve

    side = 96
    A, coords = _grid_graph(side=side)
    n = A.shape[0]
    rng = np.random.RandomState(1)
    k_types, d = 5, 24
    Xs = rng.randn(k_types, d)
    Ys = np.abs(rng.randn(n, k_types)) @ Xs + 0.05 * rng.randn(n, d)

    beta_ref, _ = bcd_solve(
        Ys, Xs, A, lambda_=0.3, rho=0.01, max_iter=30, dtype=np.float64
    )

    perm = rng.permutation(n)
    inv = np.empty(n, dtype=int)
    inv[perm] = np.arange(n)
    A_shuf = A.tocsr()[perm][:, perm]
    beta_shuf, _ = bcd_solve(
        Ys[perm], Xs, A_shuf, lambda_=0.3, rho=0.01, max_iter=30,
        dtype=np.float64, coords=coords[perm],
    )
    np.testing.assert_allclose(beta_shuf[inv], beta_ref, atol=1e-9)


def test_banded_solve_bitwise_deterministic():
    """sha256 of beta bytes identical across runs on the banded path."""
    import hashlib
    from flashdeconv_tpu.core.solver import bcd_solve

    side = 96  # 9216 spots -> banded path triggers
    A, coords = _grid_graph(side=side)
    n = A.shape[0]
    rng = np.random.RandomState(7)
    Xs = rng.randn(5, 24)
    Ys = np.abs(rng.randn(n, 5)) @ Xs + 0.05 * rng.randn(n, 24)

    digests = set()
    for _ in range(2):
        beta, _ = bcd_solve(Ys, Xs, A, lambda_=0.4, rho=0.01, max_iter=20,
                            dtype=np.float64)
        digests.add(hashlib.sha256(np.ascontiguousarray(beta)).hexdigest())
    assert len(digests) == 1


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_cross_tier_fuzz(seed):
    """Randomized-config agreement across THREE independent solve tiers:
    banded (grid order), gather (scrambled — banding rejected, no coords
    hint), and the 4-shard halo solve. K, sketch dim, lambda/rho, and
    graph flavor (kNN grid vs radius-with-ties) all drawn per seed, so
    odd K / non-multiple dims / tie-broken adjacencies get standing
    coverage beyond the hand-picked parity cases above."""
    from flashdeconv_tpu.core.solver import bcd_solve
    from flashdeconv_tpu.parallel import sharded_bcd_solve
    from flashdeconv_tpu.utils.graph import build_radius_graph

    rng = np.random.RandomState(seed)
    side = int(rng.choice([93, 96]))  # >= 8192 spots: banded path engages
    k_types = int(rng.choice([1, 3, 7, 13]))
    d = int(rng.choice([17, 32, 48]))
    lam = float(10.0 ** rng.uniform(-1.5, 0.7))
    rho = float(10.0 ** rng.uniform(-2.5, -1.5))
    A, coords = _grid_graph(side=side)
    if seed % 2:  # radius graph: degree ties + denser rows
        A = build_radius_graph(coords, radius=1.5)
    n = A.shape[0]
    Xs = rng.randn(k_types, d)
    Ys = np.abs(rng.randn(n, k_types)) @ Xs + 0.05 * rng.randn(n, d)
    kw = dict(lambda_=lam, rho=rho, max_iter=15, dtype=np.float64)

    beta_banded, info_b = bcd_solve(Ys, Xs, A, **kw)
    assert np.isfinite(beta_banded).all()

    perm = rng.permutation(n)
    inv = np.empty(n, dtype=int)
    inv[perm] = np.arange(n)
    beta_gather, info_g = bcd_solve(
        Ys[perm], Xs, A.tocsr()[perm][:, perm], **kw
    )
    np.testing.assert_allclose(beta_gather[inv], beta_banded, atol=1e-9)
    assert info_b["n_iterations"] == info_g["n_iterations"]

    beta_sh, info_sh = sharded_bcd_solve(
        Ys, Xs, A, coords=coords, n_shards=4, strategy="halo", **kw
    )
    np.testing.assert_allclose(beta_sh, beta_banded, atol=1e-8)
    assert info_sh["n_iterations"] == info_b["n_iterations"]
