"""Kernel experiment: .at[k].set row write vs jnp.where full-array select
inside the fused banded sweep's GS loop. Times one sweep at the 1M shape."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashdeconv_tpu.ops import bcd as B

x = jnp.ones((256, 256)); (x @ x).block_until_ready()
print("probe ok")

# Build 1M-grid banded operands via bench problem
from bench import make_problem
from flashdeconv_tpu.core.solver import prepare_bcd
from flashdeconv_tpu.utils.graph import build_knn_graph

n = 1_000_000
Y, X, coords = make_problem(n, 20, 512)
A = build_knn_graph(coords, k=6)
prob = prepare_bcd(Y, X, A, coords=coords)
assert prob.use_fused_banded, "fused not eligible?!"
h, block = prob.h_blocks, prob.fused_block
print("h", h, "block", block, "offsets", len(prob.offsets))

beta0 = prob._beta0(None)
carry0 = B.to_fused_carry(beta0, h, block)
lam = jnp.float32(0.1); rho = jnp.float32(0.01 * prob.mean_diag)

sweep_args = (prob.Xty_t_d, prob.XtX_d, prob.masks_d, prob.nnb_row_d,
              lam, rho)


def time_sweep(fn, tag, iters=30):
    out = fn(carry0)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = carry0
        for _ in range(iters):
            c, d, a = fn(c)
        jax.block_until_ready((c, d, a))
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
    print(f"{tag}: {best*1e3:.3f} ms/sweep")
    return out


base = jax.jit(lambda c: B.fused_banded_sweep(
    c, *sweep_args, prob.offsets, h, block=block))
out_base = time_sweep(base, "baseline(where)")


# ---- variant: .at[k].set row write ----
def make_kernel_at(offsets, h, block, n_blocks_total):
    def kernel(lam_ref, rho_ref, *refs):
        beta_views = refs[: 2 * h + 1]
        xty_ref, masks_ref, nnb_ref, xtx_ref = refs[2 * h + 1: 2 * h + 5]
        out_beta_ref, out_diff_ref, out_abs_ref = refs[2 * h + 5:]
        i = pl.program_id(0)
        is_mid = jnp.logical_and(i >= h, i < n_blocks_total - h)

        @pl.when(is_mid)
        def _mid():
            lam = lam_ref[0, 0]
            rho = rho_ref[0, 0]
            win = jnp.concatenate([v[:] for v in beta_views], axis=1)
            K = win.shape[0]
            ns = jnp.zeros((K, block), dtype=win.dtype)
            masks = masks_ref[:]
            for u, off in enumerate(offsets):
                sl = lax.slice_in_dim(
                    win, h * block + off, h * block + off + block, axis=1)
                ns = ns + masks[u: u + 1, :] * sl
            beta_old = lax.slice_in_dim(win, h * block, (h + 1) * block,
                                        axis=1)
            xtx = xtx_ref[:]
            xty = xty_ref[:]
            r = jax.lax.dot_general(
                xtx, beta_old, (((1,), (0,)), ((), ())),
                precision=B._PREC, preferred_element_type=jnp.float32)
            denom_base = lam * nnb_ref[:]
            beta = beta_old
            for k in range(K):
                old = beta[k: k + 1, :]
                diag_k = xtx[k, k]
                resid = xty[k: k + 1, :] - r[k: k + 1, :] \
                    + diag_k * old + lam * ns[k: k + 1, :]
                denom = diag_k + denom_base
                new = jnp.where(
                    denom > 1e-10, jnp.maximum(resid - rho, 0.0) / denom,
                    0.0)
                delta = new - old
                r = r + xtx[:, k: k + 1] * delta
                beta = lax.dynamic_update_slice_in_dim(beta, new, k, axis=0)
            out_beta_ref[:] = beta
            out_diff_ref[i, 0] = jnp.max(jnp.abs(beta - beta_old))
            out_abs_ref[i, 0] = jnp.max(jnp.abs(beta_old))

        @pl.when(jnp.logical_not(is_mid))
        def _edge():
            out_beta_ref[:] = jnp.zeros_like(out_beta_ref)
            out_diff_ref[i, 0] = 0.0
            out_abs_ref[i, 0] = 0.0
    return kernel


def fused_sweep_at(beta_ext_t, Xty_t, XtX, masks, nnb_row, lambda_, rho,
                   offsets, h, block):
    K, n_ext = beta_ext_t.shape
    n_solve = n_ext - 2 * h * block
    n_blocks_total = n_ext // block
    n_mid = n_solve // block
    grid = (n_blocks_total,)
    lam2d = jnp.reshape(jnp.asarray(lambda_, jnp.float32), (1, 1))
    rho2d = jnp.reshape(jnp.asarray(rho, jnp.float32), (1, 1))
    kernel = make_kernel_at(offsets, h, block, n_blocks_total)

    def view_map(j):
        return lambda i: (0, jnp.clip(i + j - h, 0, n_blocks_total - 1))

    def data_map(i):
        return (0, jnp.clip(i - h, 0, n_mid - 1))

    U = masks.shape[0]
    beta_specs = [
        pl.BlockSpec((K, block), view_map(j), memory_space=pltpu.VMEM)
        for j in range(2 * h + 1)
    ]
    out_beta, diff_p, abs_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *beta_specs,
            pl.BlockSpec((K, block), data_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((U, block), data_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), data_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks_total, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_blocks_total, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, n_ext), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks_total, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks_total, 1), jnp.float32),
        ],
    )(lam2d, rho2d, *([beta_ext_t] * (2 * h + 1)), Xty_t, masks, nnb_row,
      XtX)
    return out_beta, jnp.max(diff_p), jnp.max(abs_p)


var = jax.jit(lambda c: fused_sweep_at(
    c, *sweep_args, prob.offsets, h, block))
out_var = time_sweep(var, "variant(at-set)")

b0 = np.asarray(out_base[0]); b1 = np.asarray(out_var[0])
print("bit-identical:", np.array_equal(b0, b1),
      "maxdiff:", np.abs(b0 - b1).max())
