"""Device kernels for the block-coordinate-descent deconvolution solve.

TPU-native reformulation of the reference's Numba sweep (reference
``flashdeconv/core/solver.py:29-184``): the reference runs a *sequential*
Gauss-Seidel loop over K cell types inside each spot while sweeping spots in
parallel with Jacobi neighbor reads. Here the spot axis is fully vectorized —
coordinate k is updated for **all spots at once** as (N,)-wide VPU ops, and
the maintained residual ``r = beta @ XtX`` is updated with a rank-1 outer
product per coordinate. This preserves the reference's iterate path exactly
(Gauss-Seidel within spot, Jacobi across spots) while mapping the heavy work
onto MXU matmuls and fused VPU elementwise ops.

Data layout: the spatial graph is a padded neighbor table ``nbr_idx`` of
shape (N, max_deg) whose padding slots point at an all-zero sentinel row
appended to beta, so masked neighbor sums need no branching.

All functions are shape-polymorphic pure JAX and are reused verbatim inside
``shard_map`` by the distributed solver (:mod:`flashdeconv_tpu.parallel`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Unroll the coordinate loop at trace time up to this many cell types: K is
# static and small, and unrolled static slices compile to much tighter code
# than a fori_loop with dynamic slices. The cap exists for COMPILE time,
# not numerics: the fori_loop tier is bitwise-identical (pinned by
# tests/test_reference_parity.py::test_fori_loop_tier_bitwise_equals_
# unrolled), but unrolling K~130-160 coordinate updates into a 1M-spot
# banded while-loop body blew past 35 minutes of XLA compile (measured on
# the remote chip, 2026-08-19) where the rolled form compiles in seconds.
# 64 covers every realistic cell-type panel on the unrolled fast path; the
# Pallas kernels (K <= 128) have their own always-unrolled in-VMEM loop
# and are not governed by this cap.
_UNROLL_MAX_K = 64

# Full-f32 MXU precision for the (tiny) solver matmuls: residual maintenance
# subtracts quantities of similar magnitude (Xty - r), so the default bf16
# MXU passes would inject ~1e-2 relative noise into the iterate path. These
# matmuls are O(N*K^2) — negligible next to the gathers — so exactness is
# free.
_PREC = lax.Precision.HIGHEST


def soft_threshold(x, threshold):
    """Elementwise soft-thresholding prox for the L1 penalty."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - threshold, 0.0)


def neighbor_sum(beta_ext: jnp.ndarray, nbr_idx: jnp.ndarray) -> jnp.ndarray:
    """Sum of beta rows over each spot's (padded) neighbor list.

    Parameters
    ----------
    beta_ext : (M, K) — beta rows indexable by every entry of ``nbr_idx``;
        padding entries must point at all-zero rows of this buffer.
    nbr_idx : (N, max_deg) int32

    Returns
    -------
    (N, K) neighbor sums.

    The gather is accumulated one degree-slot at a time (max_deg is a small
    static constant) to avoid materializing an (N, max_deg, K) temporary.
    """
    max_deg = nbr_idx.shape[1]
    acc = jnp.take(beta_ext, nbr_idx[:, 0], axis=0)
    for d in range(1, max_deg):
        acc = acc + jnp.take(beta_ext, nbr_idx[:, d], axis=0)
    return acc


def overflow_sum(
    beta_ext: jnp.ndarray,
    ov_src: jnp.ndarray,
    ov_dst: jnp.ndarray,
    n_spots: int,
) -> jnp.ndarray:
    """Neighbor-sum contribution of overflow edges (degree-capped graphs).

    When the padded neighbor table is capped at a quantile degree
    (:func:`flashdeconv_tpu.utils.graph.adjacency_to_padded_capped`), the few
    edges of pathological hub spots that do not fit are carried as an edge
    list and accumulated here with one deterministic ``segment_sum`` —
    keeping solver memory O(N * cap) regardless of the max degree, the role
    CSR plays in the reference (reference
    ``flashdeconv/core/solver.py:363-365``).

    Parameters
    ----------
    beta_ext : (M, K) — beta with the zero sentinel row appended
    ov_src : (E,) int32 destination spot of each overflow edge
    ov_dst : (E,) int32 neighbor index (gathers from ``beta_ext``)
    n_spots : static int, number of output rows
    """
    contrib = jnp.take(beta_ext, ov_dst, axis=0)
    return jax.ops.segment_sum(contrib, ov_src, num_segments=n_spots)


def neighbor_sum_banded(
    beta: jnp.ndarray,
    offsets: Tuple[int, ...],
    masks: jnp.ndarray,
    rest_nbr_idx: jnp.ndarray,
    halo: int,
) -> jnp.ndarray:
    """Neighbor sum over a banded + remainder adjacency decomposition.

    The banded part (:func:`flashdeconv_tpu.utils.graph.banded_split`) turns
    each diagonal offset into a contiguous shifted slice of beta times a
    per-spot 0/1 mask — streaming HBM reads instead of the random row gather,
    which is DMA-latency-bound on TPU. Remainder edges (irregular boundary
    cases) still go through the padded-table gather; on grid data they are
    typically none.

    Parameters
    ----------
    beta : (N, K)
    offsets : static tuple of ints — diagonal offsets (|o| <= ``halo``).
        Static so the shifts are *static* slices: XLA fuses them into one
        streaming pass, and under GSPMD a spot-sharded beta turns each shift
        into a neighbor-shard halo exchange instead of an all-gather.
    masks : (U, N) f32 — edge-exists mask per offset
    rest_nbr_idx : (N, R) int32 padded table (R may be 0); padding == N
    halo : static int, max |offset| (pad width)
    """
    n = beta.shape[0]
    ns = jnp.zeros_like(beta)
    if len(offsets) > 0:
        beta_pad = jnp.pad(beta, ((halo, halo), (0, 0)))
        for u, off in enumerate(offsets):
            sl = lax.slice_in_dim(beta_pad, halo + off, halo + off + n, axis=0)
            ns = ns + masks[u][:, None] * sl
    if rest_nbr_idx.shape[1] > 0:
        zero_row = jnp.zeros((1, beta.shape[1]), dtype=beta.dtype)
        beta_ext = jnp.concatenate([beta, zero_row], axis=0)
        ns = ns + neighbor_sum(beta_ext, rest_nbr_idx)
    return ns


def _coord_update(beta, r, k, Xty, XtX, nbr_sum, n_nbrs, lambda_, rho, static: bool):
    """Gauss-Seidel update of coordinate k for every spot simultaneously.

    Solves the 1-D subproblem of
    0.5*||y_i - beta_i X||^2 + 0.5*lambda*sum_j ||beta_i - beta_j||^2 + rho*|beta_ik|
    with all other coordinates fixed, using the maintained residual
    r_i = XtX @ beta_i (updated rank-1 after the coordinate moves).
    """
    if static:
        old = beta[:, k : k + 1]                     # (N, 1)
        r_k = r[:, k : k + 1]
        xty_k = Xty[:, k : k + 1]
        ns_k = nbr_sum[:, k : k + 1]
        diag_k = XtX[k, k]
        row_k = XtX[k : k + 1, :]                    # (1, K)
    else:
        old = lax.dynamic_slice_in_dim(beta, k, 1, axis=1)
        r_k = lax.dynamic_slice_in_dim(r, k, 1, axis=1)
        xty_k = lax.dynamic_slice_in_dim(Xty, k, 1, axis=1)
        ns_k = lax.dynamic_slice_in_dim(nbr_sum, k, 1, axis=1)
        row_k = lax.dynamic_slice_in_dim(XtX, k, 1, axis=0)
        diag_k = lax.dynamic_slice(row_k, (0, k), (1, 1))[0, 0]

    # Partial residual excluding coordinate k's own contribution, plus the
    # spatial attraction toward the neighbor mean.
    resid = xty_k - r_k + diag_k * old + lambda_ * ns_k
    denom = diag_k + lambda_ * n_nbrs[:, None]
    # soft-threshold then clamp at zero == relu(resid - rho) / denom for rho>=0
    new = jnp.where(
        denom > 1e-10, jnp.maximum(resid - rho, 0.0) / denom, jnp.zeros_like(old)
    )
    delta = new - old
    # rank-1 residual refresh
    r = r + jnp.dot(delta, row_k, precision=_PREC)
    if static:
        beta = beta.at[:, k : k + 1].set(new)
    else:
        beta = lax.dynamic_update_slice_in_dim(beta, new, k, axis=1)
    return beta, r


def coordinate_descent(
    beta: jnp.ndarray,
    Xty: jnp.ndarray,
    XtX: jnp.ndarray,
    nbr_sum: jnp.ndarray,
    n_nbrs: jnp.ndarray,
    lambda_,
    rho,
) -> jnp.ndarray:
    """One full Gauss-Seidel pass over the K coordinates of every spot.

    beta (N, K) is the Jacobi read buffer already used for ``nbr_sum``; the
    returned array is the updated buffer.
    """
    K = beta.shape[1]
    # (N, K) maintained residual, one MXU matmul
    r = jnp.dot(beta, XtX, precision=_PREC)

    if K <= _UNROLL_MAX_K:
        for k in range(K):
            beta, r = _coord_update(
                beta, r, k, Xty, XtX, nbr_sum, n_nbrs, lambda_, rho, static=True
            )
        return beta

    def body(k, carry):
        b, rr = carry
        return _coord_update(
            b, rr, k, Xty, XtX, nbr_sum, n_nbrs, lambda_, rho, static=False
        )

    beta, _ = lax.fori_loop(0, K, body, (beta, r))
    return beta


# The Gauss-Seidel pass runs the MXU-panel formulation whenever K spans
# more than one 8-sublane tile: the classic pass's rank-1 residual refresh
# is a full-(K, B) VPU FMA after EVERY coordinate — O(K^2 * B) work (the
# reference's Numba loop pays the same O(K^2)/spot smoothly on CPU,
# reference ``flashdeconv/core/solver.py:75-99``) — while the panel pass
# confines the per-coordinate refresh to the panel's own rows and moves
# the cross-panel corrections onto the (otherwise idle) MXU. At K <= 8
# the two passes are the same computation (a single panel), so the
# classic pass runs as written.
_GS_PANEL_ENGAGE_K = 8

# Panel widths of the MXU-panel pass. VPU work scales with P (within-panel
# rank-1 on (P, B) rows), MXU utilization improves with P (the per-panel
# correction matmul's contraction dim is the finished-coordinate count, its
# output rows are P). At small K the rank-1 refresh dominates, so the
# narrowest tile (8 = one sublane tile) wins — measured 8% per sweep at
# the 1M x 20 headline shape (2.45 -> 2.26 ms, interleaved A/B); at large
# K the per-panel matmuls carry the bulk of the MACs and 16 (two sublane
# tiles per panel op) balances VPU vs MXU on v5e.
_GS_PANEL_P_SMALL = 8
_GS_PANEL_P = 16
_GS_PANEL_WIDE_K = 64


def _gs_panel_width(n_types: int) -> Optional[int]:
    """Panel width :func:`gs_pass` uses at this K — None = classic pass.

    Shared by the VMEM gate (:func:`fused_banded_vmem_bytes`), which must
    account for the panel pass's extra resident delta rows exactly when
    the dispatch engages it.
    """
    if n_types <= _GS_PANEL_ENGAGE_K:
        return None
    return _GS_PANEL_P_SMALL if n_types <= _GS_PANEL_WIDE_K else _GS_PANEL_P


def gs_inv_den(XtX, n_nbrs, lam):
    """Per-solve reciprocal Gauss-Seidel denominator, positivity-guarded.

    ``1 / (diag(XtX) + lam * degree)`` with ``den <= 1e-10 -> 0`` so
    ``num * inv_den`` yields the guarded 0.0 branch-free (num is finite
    and >= 0, matching the reference's den guard at reference
    ``flashdeconv/core/solver.py:88-93``).

    The denominator is SWEEP-INVARIANT (degree, diag and lam are fixed
    for a solve), so every Pallas GS caller computes this ONCE per solve
    in XLA and streams the (K, B) result into the kernels — removing the
    per-sweep in-kernel degree column-sum, denominator FMA, guard compare
    and reciprocal (a multi-instruction Newton sequence on the VPU) from
    an instruction-issue-bound loop (round-5 ablation,
    docs/performance_guide.md). Both Pallas tiers (fused and unfused)
    consume THE SAME precomputed array, so their bitwise equality
    (hw_parity check 1) is preserved by construction. The f64 XLA path
    (:func:`coordinate_descent`) keeps its own in-sweep denominator and
    is untouched.

    ``n_nbrs``: (B,) or (1, B) float degrees. Returns (K, B).
    """
    diag = jnp.diagonal(XtX)[:, None]
    den = diag + lam * jnp.reshape(n_nbrs, (1, -1)).astype(XtX.dtype)
    return jnp.where(den > 1e-10, 1.0 / den, 0.0)


def _gs_prologue(beta_old, xty, xtx, ns, lam, rho):
    """Shared hoisted prologue of both Gauss-Seidel passes.

    Returns C, the coordinate-order-independent numerator part
    ``C = xty + lam*ns - r0 + diag(xtx)*beta_old - rho`` as one
    full-(K, B) computation. The (likewise coordinate-order-independent)
    reciprocal denominator is sweep-invariant and precomputed per solve
    (:func:`gs_inv_den`), not here.
    """
    K = beta_old.shape[0]
    r0 = jax.lax.dot_general(
        xtx, beta_old, (((1,), (0,)), ((), ())),
        precision=_PREC, preferred_element_type=jnp.float32,
    )                                      # (K, B)
    # diag(xtx) as a (K, 1) column (Mosaic lowers the masked row-sum of the
    # tiny (K, K) tile; there is no diagonal-extract primitive).
    rid = lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cid = lax.broadcasted_iota(jnp.int32, (K, K), 1)
    diag = jnp.sum(jnp.where(rid == cid, xtx, 0.0), axis=1, keepdims=True)

    return (xty + lam * ns - r0 + diag * beta_old) - rho   # (K, B)


def _gs_pass_kb(beta_old, xty, xtx, ns, inv_den, lam, rho):
    """(K, B)-layout Gauss-Seidel coordinate pass — THE iterate semantics.

    Shared by both Pallas kernels (:func:`_cd_block_kernel` and the fused
    banded kernel) so their iterate paths cannot diverge: beta row k is
    updated from the maintained residual ``r = XtX @ beta`` (rank-1
    refreshed after each coordinate), matching the reference per-spot loop
    (reference ``flashdeconv/core/solver.py:75-99``) vectorized over the B
    spots on the 128-wide vector lanes.

    All operands are VMEM-resident values: beta_old/xty/ns/inv_den
    (K, B), xtx (K, K); lam/rho scalars. ``inv_den`` is the per-solve
    precomputed reciprocal denominator (:func:`gs_inv_den`). Returns the
    updated (K, B) beta.

    VPU schedule (this loop is instruction-throughput bound — at K=20,
    B=2048 the sweep kernel spends ~all of its time here, far above the
    HBM stream time): every quantity that does not depend on the
    in-sweep coordinate order is hoisted out of the loop as ONE
    full-(K, B) op (all 8 sublanes busy) instead of K per-row (1, B)
    ops (1/8 of the VPU each):

    - the constant part of the numerator, ``C = xty + lam*ns - r0 +
      diag(xtx)*beta_old - rho``, so the per-coordinate residual is a
      single subtract of the accumulated rank-1 corrections;
    - the RECIPROCAL denominator with its positivity guard pre-applied
      (``den<=1e-10 -> 0``, so ``num * inv_den`` yields the guarded 0.0
      without a per-row compare+select — num is finite and >= 0). The
      f32 divide is a multi-instruction Newton sequence on the VPU;
      paying it once full-(K, B) instead of K times (1, B) is a direct
      cycle cut in an issue-bound loop.

    The loop body is then 3 per-row (1, B) ops — subtract, clip, and the
    fused ``delta = num*inv - beta_old`` multiply-subtract — plus the
    full-(K, B) rank-1 accumulator refresh. The loop collects DELTA rows
    and the updated beta is reassembled at the end as one full-(K, B)
    ``deltas + beta_old`` add (one more hoisted row-op saved per
    coordinate; non-negativity is preserved exactly: for x >= 0, b >= 0
    both representable, fl(fl(x - b) + b) >= 0 by rounding
    monotonicity). Measured ~15% faster per sweep than the direct-form
    loop at 1M x 20 before the round-5 reciprocal/delta-form rework.

    Numerics: algebraically identical to the reference update
    (reference ``flashdeconv/core/solver.py:75-99``); the hoisting
    reassociates f32 additions and rounds the division as
    reciprocal-multiply, so this pass differs from the XLA
    :func:`coordinate_descent` fallback by a few ulp per sweep
    (hw_parity check 2 bounds it at 1e-5). Both Pallas paths share THIS
    function (via :func:`gs_pass`), so fused and unfused Pallas sweeps
    remain bit-identical to each other; the f64 CPU path (XLA) and its
    reference parity are untouched.
    """
    K = beta_old.shape[0]
    C = _gs_prologue(beta_old, xty, xtx, ns, lam, rho)

    acc = jnp.zeros_like(beta_old)         # accumulated rank-1 corrections
    deltas = []
    for k in range(K):
        num = jnp.maximum(C[k : k + 1, :] - acc[k : k + 1, :], 0.0)
        # Row k is untouched before its own turn, so the current carry
        # row equals beta_old's — read it there directly.
        delta = num * inv_den[k : k + 1, :] - beta_old[k : k + 1, :]
        acc = acc + xtx[:, k : k + 1] * delta  # rank-1 refresh, exact f32
        deltas.append(delta)
    return jnp.concatenate(deltas, axis=0) + beta_old


def _gs_pass_kb_panel(beta_old, xty, xtx, ns, inv_den, lam, rho,
                      panel: int = _GS_PANEL_P):
    """MXU-panel Gauss-Seidel pass — same iterate semantics, less VPU work.

    The classic :func:`_gs_pass_kb` refreshes the maintained residual with
    a full-(K, B) rank-1 VPU FMA after EVERY coordinate — O(K^2 * B) VPU
    work that the sweep kernel's instruction budget is dominated by at
    every K above one sublane tile (the sweep is VPU-issue-bound, see
    docs/performance_guide.md). Here coordinates are
    processed in static panels of ``panel``: within a panel the rank-1
    recurrence runs on the panel's own (P, B) rows only (the only rows
    whose corrections are needed before the panel ends), and each panel's
    residual corrections from ALL finished coordinates arrive as ONE
    ``(P, a) x (a, B)`` matmul of the accumulated delta rows — MXU work,
    at f32-equivalent precision (``precision=HIGHEST``). Total VPU cost
    drops from K^2*B to K*P*B; the K^2*B/2 MAC bulk rides the MXU.

    Algebraically identical to the classic pass coordinate-for-coordinate
    (the per-coordinate numerator subtracts exactly the deltas of the
    coordinates before it); f32 sums are reassociated across panels, which
    the Pallas numerics contract allows. Dispatch between the two passes
    lives in :func:`gs_pass`, shared by both Pallas kernels, so fused and
    unfused Pallas sweeps stay mutually bit-identical at every K.
    """
    K, B = beta_old.shape
    C = _gs_prologue(beta_old, xty, xtx, ns, lam, rho)

    delta_panels = []            # finished panels' delta rows, (P_i, B)
    a = 0
    while a < K:
        b = min(a + panel, K)
        p = b - a
        if delta_panels:
            prefix = (delta_panels[0] if len(delta_panels) == 1
                      else jnp.concatenate(delta_panels, axis=0))  # (a, B)
            acc_p = jax.lax.dot_general(
                xtx[a:b, :a], prefix, (((1,), (0,)), ((), ())),
                precision=_PREC, preferred_element_type=jnp.float32,
            )                                                      # (P, B)
        else:
            acc_p = jnp.zeros((p, B), dtype=beta_old.dtype)
        pdeltas = []
        for i in range(p):
            k = a + i
            num = jnp.maximum(C[k : k + 1, :] - acc_p[i : i + 1, :], 0.0)
            delta = num * inv_den[k : k + 1, :] - beta_old[k : k + 1, :]
            # Panel-local rank-1 refresh: only the P panel rows (exact f32
            # FMA, same in-panel association as the classic pass).
            acc_p = acc_p + xtx[a:b, k : k + 1] * delta
            pdeltas.append(delta)
        delta_panels.append(jnp.concatenate(pdeltas, axis=0))
        a = b
    return jnp.concatenate(delta_panels, axis=0) + beta_old


def gs_pass(beta_old, xty, xtx, ns, inv_den, lam, rho):
    """The Gauss-Seidel coordinate pass both Pallas kernels run.

    Dispatches on the static K (:func:`_gs_panel_width`): the classic
    exact-FMA pass at K <= 8 (where the panel pass would be the identical
    computation), the MXU-panel pass above — panel 8 through K = 64
    (measured 8% faster per sweep at 1M x 20 than the classic pass's
    full-(K, B) rank-1 refresh), panel 16 beyond. Because BOTH kernels
    call this one function, fused and unfused Pallas sweeps remain
    mutually bit-identical at every K (hw_parity check 1).
    """
    p = _gs_panel_width(beta_old.shape[0])
    if p is not None:
        return _gs_pass_kb_panel(beta_old, xty, xtx, ns, inv_den, lam, rho,
                                 panel=p)
    return _gs_pass_kb(beta_old, xty, xtx, ns, inv_den, lam, rho)


def _cd_block_kernel(lam_ref, rho_ref, beta_ref, xty_ref, ns_ref, inv_ref,
                     xtx_ref, out_ref):
    """Pallas TPU kernel: full Gauss-Seidel coordinate pass for one spot block.

    Operates in the transposed (K, B) layout: the spot axis rides the 128-wide
    vector lanes, so every per-coordinate op is a full-lane (1, B) row op and
    the rank-1 residual refresh is a (K, B) broadcast FMA — the natural (B, K)
    layout would leave 128-K lanes idle on every instruction. The whole
    per-spot state (beta block + maintained residual r = XtX @ beta) lives in
    VMEM for all K coordinate updates, so HBM sees exactly one read and one
    write of each (N, K) operand per sweep.
    """
    out_ref[:] = gs_pass(
        beta_ref[:], xty_ref[:], xtx_ref[:], ns_ref[:], inv_ref[:],
        lam_ref[0, 0], rho_ref[0, 0],
    )


def coordinate_descent_pallas(
    beta: jnp.ndarray,
    Xty: jnp.ndarray,
    XtX: jnp.ndarray,
    nbr_sum: jnp.ndarray,
    n_nbrs: jnp.ndarray,
    lambda_,
    rho,
    block: int = 2048,
    interpret: bool = False,
    inv_den: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused-VMEM Gauss-Seidel pass (TPU Pallas); same iterate path as
    :func:`coordinate_descent`.

    Requires beta.shape[0] to be a multiple of ``block`` (the solver driver
    pads once before the solve loop; padded rows are all-zero and stay zero
    through the update since their Xty/neighbor sums are zero). The XLA-level
    transposes into the kernel's (K, B) layout cost two streaming passes over
    the operands — a fraction of what they buy in lane utilization.

    ``inv_den``: optional per-solve (K, n) reciprocal denominator
    (:func:`gs_inv_den`); computed here from ``n_nbrs`` when not given.
    Loop drivers pass it precomputed so the reciprocal is not re-evaluated
    every sweep.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, K = beta.shape
    block = min(block, n)
    assert n % block == 0, f"n ({n}) must be a multiple of block ({block})"
    grid = (n // block,)

    if inv_den is None:
        inv_den = gs_inv_den(XtX, n_nbrs, lambda_)

    lam2d = jnp.reshape(jnp.asarray(lambda_, jnp.float32), (1, 1))
    rho2d = jnp.reshape(jnp.asarray(rho, jnp.float32), (1, 1))

    col_block = lambda i: (0, i)
    out_t = pl.pallas_call(
        _cd_block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((K, block), col_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block), col_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block), col_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block), col_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, block), col_block, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * K * K * 2,
            bytes_accessed=4 * (5 * n * K + K * K),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        lam2d, rho2d, beta.T, Xty.T, nbr_sum.T, inv_den, XtX,
    )
    return out_t.T


#: Per-core scoped-VMEM budget for the fused banded kernel's working set.
#: The hardware limit is 16 MB. RE-CALIBRATED round 5 (2026-08-20)
#: against the CURRENT kernel (inv_den stream + delta-form GS pass) by
#: compiling+running the borderline configs on the chip: PASS
#: (K=128,h=2,B=1024) 12,615,680 B, (K=256,h=8,B=256) 12,591,104 B,
#: (K=64,h=2,B=2048) 12,648,448 B; FAIL (K=160,h=1,B=1024)
#: 13,139,968 B, (K=160,h=2,B=1024) 15.8M, (K=20,h=1,B=8192) 16.0M.
#: The measured boundary sits in (12,648,448, 13,139,968] — gate at
#: 12.25 MiB. (The round-3 table against the pre-inv-stream kernel:
#: failures (K=128,h=1,B=2048) 21M+, (K=96,h=4,B=2048) 25M,
#: (K=20,h=1,B=16384) 32M — all still comfortably rejected.)
FUSED_VMEM_BUDGET_BYTES = 12_845_056  # 12.25 MiB


def fused_banded_vmem_bytes(n_types: int, n_bands: int, h: int,
                            block: int = 2048, rest: bool = False,
                            alias: bool = False) -> int:
    """Estimated VMEM working set of :func:`fused_banded_sweep` per grid step.

    Streams (double-buffered by the pipeline): ONE beta block in, one out,
    one Xty block, one uint8 masks block — plus, when engaged, the
    ``ns_rest_t`` rest-edge stream (``rest=True``: one more (K, block)
    input) and the overlap split's aliased dummy input (``alias=True``).
    Scratch: the rolling (2h+1)-block beta window. Values: the
    concatenated window plus the Gauss-Seidel pass's live set — 5 (K, B)
    blocks for the delta-form pass (C, the neighbor sum, the rank-1
    accumulator, the collected delta rows, the reassembled output; the
    denominator is a streamed input since round 5, not an in-kernel
    value), +1 when the MXU-panel dispatch engages (see the ``gs_live``
    accounting below — the authoritative inventory the gate was
    hardware-recalibrated against). The eligibility gates
    (``BCDProblem``, ``GspmdBandedProblem``) require this to fit
    :data:`FUSED_VMEM_BUDGET_BYTES` — otherwise a legal-looking config
    (large K x large halo) dies at Mosaic compile time instead of falling
    back to the unfused banded path; callers whose kernel will carry the
    rest stream / alias input MUST pass the flags, or a config planned at
    the gate boundary can exceed the calibrated Mosaic limit at runtime.
    Calibration table: see :data:`FUSED_VMEM_BUDGET_BYTES`.
    """
    kp = -(-n_types // 8) * 8              # sublane-padded K
    kb = kp * block * 4
    streams = 4 * kb * 2                   # beta in + out + Xty + inv, x2
    if rest:
        streams += 2 * kb                  # ns_rest_t block, x2
    if alias:
        streams += 2 * kb                  # aliased dummy input block
    masks = n_bands * block * 2            # uint8 masks block, x2
    scratch = (2 * h + 1) * kb             # rolling window scratch
    # GS pass live set: ~5 (K, B) blocks for the classic pass (C, ns,
    # the rank-1 accumulator, the collected delta rows, the reassembled
    # output — the round-5 delta-form loop dropped the separate new-rows
    # list, and the denominator is a stream now, not an in-kernel
    # value); the MXU-panel pass (whenever the dispatch engages it — see
    # _gs_panel_width) additionally keeps the accumulated delta rows
    # resident across panels (+1 block).
    gs_live = 5 + (1 if _gs_panel_width(n_types) is not None else 0)
    values = (2 * h + 1) * kb + gs_live * kb
    return streams + masks + scratch + values


#: Fused-kernel block sizes the planner may choose, largest first. All are
#: multiples of the 128-lane width and divide 2048 (the solver's spot-axis
#: padding granularity), so any planned block tiles any padded carry. The
#: largest block that fits VMEM wins: fewer grid steps, wider VPU rows.
FUSED_BLOCK_CANDIDATES = (2048, 1024, 512, 256)

#: Single-device candidate list: leads with 4096 — fewer grid steps
#: amortize the per-block window-roll/stats overhead (~5% per sweep at
#: 1M x 20, fori-protocol A/B vs 2048; the VMEM gate limits it to
#: K <~ 32). A 4096 block does NOT divide the 2048 padding granularity,
#: so BCDProblem bumps its spot-axis padding to the planned block; the
#: sharded planners keep the 2048-led list (per-shard lengths are padded
#: to 2048, and the block size never changes the iterate — the sweep
#: math is elementwise in the block dimension — so mixed-block
#: single-vs-mesh solves stay bitwise identical).
FUSED_BLOCK_CANDIDATES_1D = (4096,) + FUSED_BLOCK_CANDIDATES


def plan_fused_banded(
    n_types: int,
    n_bands: int,
    halo: int,
    max_h: int = 8,
    max_local: Optional[int] = None,
    candidates: Tuple[int, ...] = FUSED_BLOCK_CANDIDATES,
    rest: bool = False,
    alias: bool = False,
) -> Optional[Tuple[int, int]]:
    """Pick the fused banded kernel's (block, h) for a problem, or None.

    Walks ``candidates`` largest-first and returns the first block whose
    working set fits :data:`FUSED_VMEM_BUDGET_BYTES` with an admissible
    block-halo ``h = ceil(halo / block)`` (``1 <= h <= max_h``; and
    ``h * block <= max_local`` when given — the sharded mesh path's
    ppermute reaches adjacent shards only, so the halo blocks must fit
    inside one neighbor shard). Shrinking the block is what carries the
    fused kernel past the K ~ 80 envelope of a fixed 2048 block: the
    (K, B) working set scales linearly in B, so K = 96-128 fits at
    B = 1024, K ~ 160-200 at B = 512, and K ~ 256 at B = 256 — closing
    the large-K cliff to the XLA fori tier (the reference's Numba loop
    handles any K at smooth O(K^2)/spot cost, reference
    ``flashdeconv/core/solver.py:75-99``).
    """
    for block in candidates:
        h = -(-halo // block) if halo > 0 else 1
        if not (1 <= h <= max_h):
            continue
        if max_local is not None and h * block > max_local:
            continue
        if fused_banded_vmem_bytes(
            n_types, n_bands, h, block, rest=rest, alias=alias
        ) <= FUSED_VMEM_BUDGET_BYTES:
            return block, h
    return None


def _make_fused_banded_kernel(offsets: Tuple[int, ...], h: int, block: int,
                              n_blocks_total: int, has_rest: bool = False,
                              store_edges: bool = True,
                              has_alias: bool = False):
    """Build the fully fused banded-sweep kernel for a static band set.

    Software-pipelined streaming schedule: grid step ``i`` DMAs beta block
    ``min(i, nbt-1)`` of the transposed carry (K, n_solve + 2*h*block),
    appends it to a rolling (2h+1)-block VMEM scratch window, and processes
    + writes block ``i - h`` — so HBM reads every beta block EXACTLY once
    per sweep (the previous schedule fetched a fresh (2h+1)-block window
    per grid step, (2h+1)x the traffic). The kernel fuses, entirely in
    VMEM: the banded neighbor sum (static shifted slices of the window),
    the full Gauss-Seidel coordinate pass (identical iterate path to
    :func:`_cd_block_kernel` — both call :func:`gs_pass` on the per-solve
    precomputed reciprocal denominator, see :func:`gs_inv_den`) and the
    per-block convergence statistics (max |delta|, max |old|). Edge slabs
    (the h pad blocks on each side) write zeros.

    Per-block runtime skipping of sparse bands was tried and REMOVED
    (round 5): wrapping a band's FMA in ``lax.cond`` on a host-computed
    any-nonzero bitmask measured 25% SLOWER than unconditionally running
    all 16 bands (branches fence Mosaic's instruction scheduling), and
    the sparse bands' nonzeros are scattered across ~every block anyway.
    Sparse bands are instead spilled out of the kernel entirely by the
    band-cap + rest-stream mechanism (see :func:`fused_banded_sweep`'s
    ``ns_rest_t``).
    """
    from jax.experimental import pallas as pl

    def kernel(lam_ref, rho_ref, beta_in_ref, xty_ref, masks_ref, inv_ref,
               xtx_ref, *rest):
        rest = list(rest)
        nsr_ref = rest.pop(0) if has_rest else None
        if has_alias:
            rest.pop(0)  # donated alias buffer: storage only, never read
        out_beta_ref, out_diff_ref, out_abs_ref, win_ref = rest
        i = pl.program_id(0)
        # Mid (data) slabs j = i - h with j in [h, nbt - h): processed at
        # steps i in [2h, nbt).
        is_mid = jnp.logical_and(i >= 2 * h, i < n_blocks_total)
        jc = jnp.clip(i - h, 0, n_blocks_total - 1)

        # Roll the window left one block and append the fetched block. The
        # shifted part is loaded as a value first, so the overlapping store
        # cannot alias; both values then feed the compute directly (no
        # re-load of the scratch).
        shifted = win_ref[:, block:]             # (K, 2h*block)
        newblk = beta_in_ref[:]                  # (K, block)
        win_ref[:, : 2 * h * block] = shifted
        win_ref[:, 2 * h * block :] = newblk

        @pl.when(is_mid)
        def _mid():
            lam = lam_ref[0, 0]
            rho = rho_ref[0, 0]
            win = jnp.concatenate([shifted, newblk], axis=1)
            K = win.shape[0]

            # Banded neighbor sum from the window: data column j of the
            # center slab sits at window column h*block + j, its offset-o
            # neighbor at h*block + j + o — a static slice per band. The
            # 0/1 masks arrive uint8 (4x less HBM than f32) and widen here
            # (via int32 — Mosaic has no direct uint8->f32 cast).
            masksf = masks_ref[:]
            if jnp.issubdtype(masksf.dtype, jnp.integer):
                masksf = masksf.astype(jnp.int32)
            masksf = masksf.astype(win.dtype)
            ns = jnp.zeros((K, block), dtype=win.dtype)
            for u, off in enumerate(offsets):
                sl = lax.slice_in_dim(
                    win, h * block + off, h * block + off + block, axis=1
                )
                ns = ns + masksf[u : u + 1, :] * sl
            if has_rest:
                # Rest-edge totals (spilled sparse bands + native
                # remainder), precomputed per sweep into the streamed
                # ns_rest buffer; ONE add after the bands — the same
                # association as neighbor_sum_banded's bands + rest-total.
                ns = ns + nsr_ref[:]

            beta_old = lax.slice_in_dim(
                win, h * block, (h + 1) * block, axis=1
            )                                   # (K, B) center slab
            beta = gs_pass(
                beta_old, xty_ref[:], xtx_ref[:], ns, inv_ref[:], lam, rho
            )
            out_beta_ref[:] = beta
            out_diff_ref[0, jc] = jnp.max(jnp.abs(beta - beta_old))
            out_abs_ref[0, jc] = jnp.max(jnp.abs(beta_old))

        @pl.when(jnp.logical_not(is_mid))
        def _edge():
            if store_edges:
                out_beta_ref[:] = jnp.zeros_like(out_beta_ref)
            # store_edges=False (aliased sub-range form): the edge steps'
            # out_map is CLAMPED into the call's own data blocks, and not
            # storing leaves each revisited VMEM block holding the data
            # step's store, which is what flushes — so the aliased output
            # buffer's other regions are never touched.
            out_diff_ref[0, jc] = 0.0
            out_abs_ref[0, jc] = 0.0

    return kernel


def build_fused_rest_tables(rest_nbr_idx, sentinel: int, h: int,
                            block: int):
    """Compact per-sweep gather tables for the fused path's rest edges.

    The band-cap (:func:`flashdeconv_tpu.utils.graph.cap_sparse_bands`)
    spills near-empty bands out of the fused kernel — each spilled band
    cost a full-(K, B) FMA pass per sweep for <0.2% real edges (round-5
    ablation: ~38 us/band at 1M x 20, ~6 of 16 grid-kNN bands are
    boundary artifacts). The spilled edges (plus any native remainder)
    are instead applied as a compact XLA scatter into a persistent
    (K, n_solve) ``ns_rest`` buffer that the kernel streams: per sweep
    only the ~T touched columns are recomputed (slot-ordered gather from
    the transposed carry, matching :func:`neighbor_sum`'s association
    bitwise) and scattered in place — O(T*K) work and bytes instead of
    O(n*K) per spilled band.

    ``rest_nbr_idx``: the (n_solve, R) padded gather table
    (:func:`flashdeconv_tpu.utils.graph.adjacency_to_padded`), padding
    slots == ``sentinel``. Returns ``(touched, slot_cols)`` int32 host
    arrays — touched data columns (T,) padded to a lane multiple by
    repeating the last entry (the duplicate scatter writes the same
    value — deterministic), and (R, T) absolute carry columns per slot
    (sentinel -> column 0, a left-pad zero column of the single-device
    carry) — or ``(None, None)`` when the table has no real edges.
    """
    import numpy as np

    t = np.asarray(rest_nbr_idx)
    touched = np.flatnonzero((t != sentinel).any(axis=1))
    if touched.size == 0:
        return None, None
    pad = (-touched.size) % 128
    touched_p = np.concatenate(
        [touched, np.full(pad, touched[-1], dtype=touched.dtype)]
    ).astype(np.int32)
    slots = t[touched_p]                          # (T, R)
    cols = np.where(
        slots == sentinel, 0, slots + h * block
    ).astype(np.int32).T                          # (R, T)
    return touched_p, np.ascontiguousarray(cols)


def rest_ns_update(ns_rest, carry_ext_t, touched, slot_cols):
    """Refresh the persistent rest-edge neighbor-sum buffer in place.

    Gathers the pre-sweep beta values of every rest edge from the
    transposed carry (slot-by-slot, the exact accumulation order of
    :func:`neighbor_sum` so the fused iterate stays bitwise equal to the
    unfused banded+rest path) and scatters the per-spot totals into the
    touched columns of ``ns_rest``. All other columns remain exactly
    +0.0 from the per-solve init; XLA performs the scatter in place when
    ``ns_rest`` is loop-carried (only ~T*K elements move per sweep).
    """
    vals = jnp.take(carry_ext_t, slot_cols[0], axis=1)
    for sl in range(1, slot_cols.shape[0]):
        vals = vals + jnp.take(carry_ext_t, slot_cols[sl], axis=1)
    return ns_rest.at[:, touched].set(vals)


def fused_banded_sweep(
    beta_ext_t: jnp.ndarray,
    Xty_t: jnp.ndarray,
    XtX: jnp.ndarray,
    masks: jnp.ndarray,
    inv_den_t: jnp.ndarray,
    lambda_,
    rho,
    offsets: Tuple[int, ...],
    h: int,
    block: int = 2048,
    ns_rest_t: Optional[jnp.ndarray] = None,
    sub: Optional[Tuple[int, int]] = None,
    out_alias: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fully fused banded BCD sweep on the transposed padded carry.

    Parameters
    ----------
    beta_ext_t : (K, n_solve + 2*h*block) f32 — transposed beta with ``h``
        pad blocks on each side (all-zero single-device; neighbor-shard
        halo blocks under the GSPMD mesh path — the carry stays in this
        layout for the whole solve loop; see ``BCDProblem``).
    Xty_t : (K, n_solve); masks : (U, n_solve) 0/1, uint8 (preferred — 4x
        less HBM per sweep) or float32 (widened in-kernel either way).
    inv_den_t : (K, n_solve) per-solve reciprocal denominator
        (:func:`gs_inv_den` on the degree vector) — streamed, replacing
        the old in-kernel degree column-sum + reciprocal (sweep-invariant
        work that an instruction-issue-bound kernel should not repeat).
    offsets : static band offsets, each |o| <= h*block.
    ns_rest_t : optional (K, n_solve) rest-edge neighbor-sum stream
        (:func:`rest_ns_update` refreshes its touched columns each
        sweep) — added once after the band FMAs; lets the band-cap spill
        near-empty bands out of the kernel (each spilled band was a full
        (K, B) FMA pass per sweep for <0.2% real edges).
    sub : optional static ``(carry_start, data_start, n_data_blocks)``
        — run the sweep on a SUB-RANGE: the sub-problem's window blocks
        begin at block ``carry_start`` of whatever carry operand is
        given (which may be the full resident carry, or a small
        assembled ``[halo | edge-data]`` buffer), its data blocks are
        GLOBAL data blocks ``[data_start, data_start + n_data_blocks)``
        (indexing Xty/masks/inv/ns_rest, and fixing the output position
        under ``out_alias``). The 2h window "pad" blocks hold REAL
        surrounding beta, and the per-block math is bit-identical to the
        full call's, so a boundary/interior split recomposes the full
        sweep exactly. This is how the GSPMD mesh path overlaps its
        ppermute halo exchange with interior compute: the interior
        sub-call has no data dependency on the halo transfer, and the
        boundary sub-calls consume the transfer through ~MB-scale
        assembled side buffers instead of a full-carry update (a
        dynamic-update-slice of the 84 MB carry measured as a full
        copy). Output is the sub-carry ``(K, (n_data_blocks + 2h) *
        block)`` with zero-written pad slots — or, with ``out_alias``,
        the full carry updated in place.
    out_alias : optional full-carry-shaped (K, n_ext) buffer, DONATED:
        the output becomes this buffer with ONLY the sub-range's data
        blocks rewritten (``input_output_aliases`` + edge steps that
        don't store), so a boundary/interior split recomposes the full
        sweep with ZERO copies — the measured alternative (slicing each
        sub-call's output and concatenating) cost ~30% of the sweep.
        Requires ``sub``.
    Returns ``(new beta_ext_t, max_diff, max_abs)`` — stats reduced over
    per-block partials (a (n_blocks,) max, fused by XLA).

    HBM traffic per sweep: ONE read + ONE write of beta, one read of
    Xty, one uint8 read of masks — the streaming minimum. Grid step i
    fetches beta block min(i, nbt-1) into a rolling VMEM scratch window
    and processes block i-h (grid runs h steps past the carry), so no
    beta block is ever DMA'd twice. The unfused path reads beta once PER
    OFFSET (~18x on grid kNN) plus the separate coordinate-pass and
    sweep_stats passes and the per-sweep (N, K) <-> (K, B) transposes —
    all of which disappear here.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, n_ext = beta_ext_t.shape
    if sub is None:
        assert (n_ext - 2 * h * block) % block == 0
        carry_start, data_start, n_mid = 0, 0, (n_ext - 2 * h * block) \
            // block
    else:
        carry_start, data_start, n_mid = sub
    n_solve = n_mid * block
    assert n_solve > 0
    assert (carry_start + n_mid + 2 * h) * block <= n_ext
    n_blocks_total = n_mid + 2 * h
    grid = (n_blocks_total + h,)

    lam2d = jnp.reshape(jnp.asarray(lambda_, jnp.float32), (1, 1))
    rho2d = jnp.reshape(jnp.asarray(rho, jnp.float32), (1, 1))

    assert out_alias is None or sub is not None
    kernel = _make_fused_banded_kernel(
        offsets, h, block, n_blocks_total,
        has_rest=ns_rest_t is not None,
        store_edges=out_alias is None,
        has_alias=out_alias is not None,
    )

    def beta_map(i):
        # Streaming fetch: block i, clipped (trailing steps re-map to the
        # last block, whose DMA the pipeline skips as the index is equal).
        return (0, jnp.minimum(i, n_blocks_total - 1) + carry_start)

    def data_map(i):
        # Data slab for the processed block j = i - h (data arrays carry
        # no pad blocks, so the data index is j - h = i - 2h).
        return (0, jnp.clip(i - 2 * h, 0, n_mid - 1) + data_start)

    if out_alias is None:
        def out_map(i):
            return (0, jnp.clip(i - h, 0, n_blocks_total - 1))
        out_cols = n_blocks_total * block
    else:
        # Aliased full-carry output: visit ONLY this call's own data
        # blocks (edge steps clamp into the range and don't store — the
        # revisited VMEM block flushes the data step's store). Data
        # block d sits at carry block d + h of the full buffer.
        def out_map(i):
            return (0, data_start + h + jnp.clip(i - 2 * h, 0, n_mid - 1))
        out_cols = out_alias.shape[1]

    U = masks.shape[0]
    msize = masks.dtype.itemsize
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((K, block), beta_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((K, block), data_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((U, block), data_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((K, block), data_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((K, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [lam2d, rho2d, beta_ext_t, Xty_t, masks, inv_den_t, XtX]
    if ns_rest_t is not None:
        in_specs.append(
            pl.BlockSpec((K, block), data_map, memory_space=pltpu.VMEM)
        )
        operands.append(ns_rest_t)
    io_aliases = {}
    if out_alias is not None:
        # Dummy-spec'd donated buffer (its blocks are never read by the
        # kernel; the alias just makes the output share its storage).
        in_specs.append(
            pl.BlockSpec((K, block), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(out_alias)
        io_aliases = {len(operands) - 1: 0}
    out_beta, diff_p, abs_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((K, block), out_map, memory_space=pltpu.VMEM),
            # Per-block scalar stats: one SMEM-resident (1, n_blocks)
            # buffer revisited by every grid step (sub-(8, 128) blocks are
            # not lowerable on TPU), indexed by the processed-block id in
            # the kernel. Lane-major (1, n) — the transposed (n, 1) layout
            # pads every row to 128 lanes and blows the 1 MB SMEM budget
            # at ~5k blocks (hit at 10M spots).
            pl.BlockSpec((1, n_blocks_total), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_blocks_total), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (K, out_cols if out_alias is not None
                 else n_blocks_total * block), jnp.float32,
            ),
            jax.ShapeDtypeStruct((1, n_blocks_total), jnp.float32),
            jax.ShapeDtypeStruct((1, n_blocks_total), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, (2 * h + 1) * block), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_solve * K * (K + len(offsets)) * 2,
            # beta read + write + Xty read + inv_den read + uint8 masks
            bytes_accessed=(
                4 * (2 * n_ext * K + 2 * n_solve * K + K * K)
                + msize * n_solve * U
            ),
            transcendentals=0,
        ),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(*operands)
    return out_beta, jnp.max(diff_p), jnp.max(abs_p)


@partial(
    jax.jit,
    static_argnames=("offsets", "max_iter", "h", "block", "interpret"),
)
def bcd_iterate_banded_fused(
    beta_ext_t0, Xty_t, XtX, masks, nnb, lambda_, rho, tol,
    max_iter: int, offsets: Tuple[int, ...], h: int, block: int = 2048,
    rest_touched=None, rest_slot_cols=None, iter_cap=None,
    interpret: bool = False,
):
    """Fused solve loop whose carry is the transposed padded beta; same
    convergence semantics as :func:`bcd_iterate_banded` (the sweep math is
    identical — only the memory schedule changed). ``nnb`` is the
    (n_solve,) degree vector; the sweep-invariant reciprocal denominator
    is computed from it ONCE here (:func:`gs_inv_den`) and streamed into
    every sweep. ``rest_touched``/``rest_slot_cols``
    (:func:`build_fused_rest_tables`) activate the rest-stream: a
    persistent (K, n_solve) ns_rest buffer rides the loop carry, its
    touched columns refreshed from the pre-sweep beta each iteration
    (Jacobi reads, like the bands)."""
    inv_den_t = gs_inv_den(XtX, nnb, lambda_)
    if rest_touched is None:
        return converge_loop(
            lambda beta_ext: fused_banded_sweep(
                beta_ext, Xty_t, XtX, masks, inv_den_t, lambda_, rho,
                offsets, h, block=block, interpret=interpret,
            ),
            beta_ext_t0, tol, max_iter, iter_cap=iter_cap,
        )

    ns_rest0 = jnp.zeros_like(Xty_t)

    def sweep(state):
        ext, nsr = state
        nsr = rest_ns_update(nsr, ext, rest_touched, rest_slot_cols)
        out, d, a = fused_banded_sweep(
            ext, Xty_t, XtX, masks, inv_den_t, lambda_, rho,
            offsets, h, block=block, ns_rest_t=nsr, interpret=interpret,
        )
        return (out, nsr), d, a

    state, n_iter, rel = converge_loop(
        sweep, (beta_ext_t0, ns_rest0), tol, max_iter, iter_cap=iter_cap,
    )
    return state[0], n_iter, rel


@partial(jax.jit, static_argnames=("h", "block"))
def to_fused_carry(beta0: jnp.ndarray, h: int, block: int) -> jnp.ndarray:
    """(n_solve, K) beta -> the fused kernel's transposed padded carry."""
    n_solve, K = beta0.shape
    carry = jnp.zeros((K, n_solve + 2 * h * block), dtype=beta0.dtype)
    return lax.dynamic_update_slice(carry, beta0.T, (0, h * block))


@partial(jax.jit, static_argnames=("h", "block"))
def from_fused_carry(beta_ext_t: jnp.ndarray, h: int, block: int
                     ) -> jnp.ndarray:
    """Transposed padded carry -> (n_solve, K) beta."""
    n_solve = beta_ext_t.shape[1] - 2 * h * block
    return lax.slice_in_dim(
        beta_ext_t, h * block, h * block + n_solve, axis=1
    ).T


@partial(jax.jit, static_argnames=("offsets", "h", "block"))
def objective_terms_banded_fused(
    beta_ext_t, Xty_t, XtX, YtY, offsets: Tuple[int, ...], masks,
    lambda_, rho, h: int, block: int,
    nnb=None, rest_touched=None, rest_slot_cols=None,
):
    """Objective on the fused carry's transposed layout — same algebra as
    :func:`objective_terms_banded`, shifts taken directly from the carry's
    own zero padding (h*block >= halo by construction). ``masks`` may be
    uint8 (the fused solve's resident copy) or float. The per-spot
    degree is ``nnb`` when given (required under the band-cap, where the
    masks no longer carry every edge); their column sum otherwise.
    ``rest_touched``/``rest_slot_cols`` add the spilled rest edges'
    neighbor sums (one add after the bands — the association of
    :func:`neighbor_sum_banded`)."""
    n_solve = Xty_t.shape[1]
    beta_t = lax.slice_in_dim(
        beta_ext_t, h * block, h * block + n_solve, axis=1
    )
    cross = jnp.sum(beta_t * Xty_t)
    BtB = jnp.dot(beta_t, beta_t.T, precision=_PREC)
    quad = jnp.sum(BtB * XtX)
    fidelity = 0.5 * (YtY - 2.0 * cross + quad)

    masksf = masks.astype(beta_t.dtype)
    if nnb is None:
        nnb_row = jnp.sum(masksf, axis=0, keepdims=True)
    else:
        nnb_row = jnp.reshape(nnb, (1, -1)).astype(beta_t.dtype)
    ns_t = jnp.zeros_like(beta_t)
    for u, off in enumerate(offsets):
        sl = lax.slice_in_dim(
            beta_ext_t, h * block + off, h * block + off + n_solve, axis=1
        )
        ns_t = ns_t + masksf[u : u + 1, :] * sl
    if rest_touched is not None:
        ns_t = ns_t + rest_ns_update(
            jnp.zeros_like(beta_t), beta_ext_t, rest_touched,
            rest_slot_cols,
        )
    deg_term = jnp.sum(nnb_row * jnp.sum(beta_t * beta_t, axis=0,
                                         keepdims=True))
    adj_term = jnp.sum(beta_t * ns_t)
    spatial = 0.5 * lambda_ * (deg_term - adj_term)

    sparsity = rho * jnp.sum(jnp.abs(beta_t))
    return fidelity + spatial + sparsity


@partial(
    jax.jit,
    static_argnames=("offsets", "max_iter", "h", "block", "n_spots",
                     "interpret"),
)
def fused_solve_program(
    beta0, Xty_t, XtX, masks, nnb, YtY, inv_perm,
    lambda_, rho, tol, iter_cap,
    offsets: Tuple[int, ...], max_iter: int, h: int, block: int,
    n_spots: int, rest_touched=None, rest_slot_cols=None,
    interpret: bool = False,
):
    """The WHOLE fused-banded solve as ONE compiled program.

    init -> carry transpose -> converge loop -> final objective -> carry
    un-transpose -> un-pad -> un-permute, returning ``(beta (n_spots, K),
    n_iter, rel_change, objective)``. On a remote-attached chip every
    separately dispatched step costs ~1-1.5 ms of tunnel command latency
    even when the compute is microseconds — a warm 1M-spot solve spent
    ~14 ms on the 6-7 dispatches around the loop (measured; see
    docs/performance_guide.md). One program + one bundled scalar fetch is
    the dispatch minimum: warm solve = 1 RTT + device time.

    ``beta0`` may be None (uniform 1/K init built on device — no upload)
    or an (n_solve, K) array; ``inv_perm`` may be None (identity). Both
    arms are separate jit cache entries. ``n_spots`` is static, so the
    executable is specialized to the exact spot count (not just the
    2048-bucket); the persistent compile cache absorbs the one-time cost.
    The math is exactly the composition of :func:`to_fused_carry`,
    :func:`bcd_iterate_banded_fused`, :func:`objective_terms_banded_fused`
    and :func:`from_fused_carry` — each stage's values are identical to
    the separately-dispatched form.
    """
    K, n_solve = Xty_t.shape
    if beta0 is None:
        beta0 = jnp.zeros((n_solve, K), dtype=Xty_t.dtype)
        beta0 = beta0.at[:n_spots].set(1.0 / K)
    carry = jnp.zeros((K, n_solve + 2 * h * block), dtype=beta0.dtype)
    carry = lax.dynamic_update_slice(carry, beta0.T, (0, h * block))
    carry, n_iter, rel = bcd_iterate_banded_fused(
        carry, Xty_t, XtX, masks, nnb, lambda_, rho, tol, max_iter,
        offsets, h, block=block, rest_touched=rest_touched,
        rest_slot_cols=rest_slot_cols,
        iter_cap=iter_cap, interpret=interpret,
    )
    obj = objective_terms_banded_fused(
        carry, Xty_t, XtX, YtY, offsets, masks, lambda_, rho, h, block,
        nnb=nnb, rest_touched=rest_touched, rest_slot_cols=rest_slot_cols,
    )
    beta = lax.slice_in_dim(
        carry, h * block, h * block + n_solve, axis=1
    ).T[:n_spots]
    if inv_perm is not None:
        beta = jnp.take(beta, inv_perm, axis=0)
    return beta, n_iter, rel, obj


@partial(
    jax.jit,
    static_argnames=("tier", "offsets", "halo", "max_iter", "use_pallas",
                     "n_spots"),
)
def solve_program(
    beta0, operands, inv_perm, lambda_, rho, tol, iter_cap,
    tier: str, offsets: Optional[Tuple[int, ...]], halo: int,
    max_iter: int, use_pallas: bool, n_spots: int,
):
    """The gather / unfused-banded solve as ONE compiled program.

    The non-fused analog of :func:`fused_solve_program` (same dispatch-
    latency rationale): converge loop + final objective + un-pad +
    un-permute in a single dispatch. ``operands`` is a dict pytree of the
    prepared device arrays — ``Xty``/``XtX``/``YtY``/``nnb`` plus, for
    ``tier="banded"``, ``masks``/``rest``; for ``tier="gather"``,
    ``nbr`` and optional ``ov_src``/``ov_dst``. ``beta0`` may be None
    (uniform 1/K over the first ``n_spots`` rows, built on device).
    The math is exactly the composition of the separately-dispatched
    :func:`bcd_iterate`/:func:`bcd_iterate_banded` and
    :func:`objective_terms`/:func:`objective_terms_banded`.
    """
    Xty = operands["Xty"]
    if beta0 is None:
        n_solve, K = Xty.shape
        beta0 = jnp.zeros((n_solve, K), dtype=Xty.dtype)
        beta0 = beta0.at[:n_spots].set(1.0 / K)
    if tier == "banded":
        beta, n_iter, rel = bcd_iterate_banded(
            beta0, Xty, operands["XtX"], offsets, operands["masks"],
            operands["rest"], operands["nnb"], lambda_, rho, tol,
            max_iter, halo, use_pallas, iter_cap=iter_cap,
        )
        obj = objective_terms_banded(
            beta, Xty, operands["XtX"], operands["YtY"], offsets,
            operands["masks"], operands["rest"], operands["nnb"],
            lambda_, rho, halo,
        )
    else:  # "gather"
        beta, n_iter, rel = bcd_iterate(
            beta0, Xty, operands["XtX"], operands["nbr"], operands["nnb"],
            lambda_, rho, tol, max_iter, use_pallas=use_pallas,
            iter_cap=iter_cap, ov_src=operands.get("ov_src"),
            ov_dst=operands.get("ov_dst"),
        )
        obj = objective_terms(
            beta, Xty, operands["XtX"], operands["YtY"], operands["nbr"],
            operands["nnb"], lambda_, rho, ov_src=operands.get("ov_src"),
            ov_dst=operands.get("ov_dst"),
        )
    beta = beta[:n_spots]
    if inv_perm is not None:
        beta = jnp.take(beta, inv_perm, axis=0)
    return beta, n_iter, rel, obj


def sweep_stats(
    beta_out: jnp.ndarray,
    beta_in: jnp.ndarray,
    spot_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused convergence statistics of one sweep: (max |delta|, max |old|).

    Matches the reference's per-sweep reduction (reference
    ``flashdeconv/core/solver.py:173-183``); masked rows (padding) are
    excluded.
    """
    diffs = jnp.max(jnp.abs(beta_out - beta_in), axis=1)
    abs_old = jnp.max(jnp.abs(beta_in), axis=1)
    if spot_mask is not None:
        diffs = jnp.where(spot_mask, diffs, 0.0)
        abs_old = jnp.where(spot_mask, abs_old, 0.0)
    return jnp.max(diffs), jnp.max(abs_old)


def converge_loop(sweep_fn, beta0, tol, max_iter: int, iter_cap=None):
    """Fused solve loop shared by every solver variant.

    ``sweep_fn(beta) -> (beta_new, max_diff, max_abs)``. Stops when
    max_diff / (max_abs + 1e-10) < tol (reference convergence rule,
    ``flashdeconv/core/solver.py:385-413``); the satisfying sweep is still
    applied. Returns (beta, n_iterations, rel_change).

    ``max_iter`` is the static (compile-time) bound; ``iter_cap`` is an
    optional *traced* bound so callers can run shorter chunks without
    recompiling (e.g. the verbose driver's tail chunk). ``beta0`` may be
    any pytree (e.g. the rest-stream fused loop carries (carry, ns_rest));
    the convergence scalars take the first leaf's dtype.
    """
    big = jnp.asarray(jnp.inf, dtype=jax.tree_util.tree_leaves(beta0)[0].dtype)

    def cond(carry):
        _, it, rel = carry
        go = jnp.logical_and(it < max_iter, rel >= tol)
        if iter_cap is not None:
            go = jnp.logical_and(go, it < iter_cap)
        return go

    def body(carry):
        beta, it, _ = carry
        beta_new, max_diff, max_abs = sweep_fn(beta)
        rel = max_diff / (max_abs + 1e-10)
        return beta_new, it + 1, rel

    return lax.while_loop(cond, body, (beta0, jnp.int32(0), big))


def chunked_verbose_solve(run_chunk, eval_objective, beta0, max_iter: int,
                          tol: float, log=print):
    """Host-chunked fused loop on the reference logging cadence.

    Shared by every solver variant's ``verbose=True`` path: runs the fused
    device loop in chunks whose boundaries land on the reference's objective
    cadence (after sweeps 0, 10, 20, ..., reference
    ``flashdeconv/core/solver.py:399-404``) so the trajectory is observable
    without a host round-trip per sweep. One divergence from the reference:
    when the solve converges mid-chunk, the objective is also sampled at the
    converged sweep.

    Parameters
    ----------
    run_chunk : callable(beta, cap_traced) -> (beta, n_done, rel_change) —
        the jitted fused loop with a *traced* iteration cap (same compiled
        executable as the non-verbose full solve).
    eval_objective : callable(beta) -> jax scalar (async-dispatched).
    beta0 : initial device buffer.
    max_iter, tol : solve budget and stopping rule.

    Returns (beta, n_iter, rel_change, converged, objectives).
    """
    objectives: list = []
    beta_d = beta0
    converged = False
    rel_change = float("inf")
    n_iter = 0
    next_chunk = 1  # first boundary = sweep 0, then every 10
    while n_iter < max_iter:
        n_chunk = min(next_chunk, max_iter - n_iter)
        next_chunk = 10
        beta_d, it_d, rel_d = run_chunk(
            beta_d, jnp.asarray(n_chunk, dtype=jnp.int32)
        )
        rel_change = float(rel_d)
        n_iter += int(it_d)
        obj = float(eval_objective(beta_d))
        objectives.append(obj)
        log(
            f"Iteration {n_iter - 1}: objective = {obj:.6f}, "
            f"rel_change = {rel_change:.6e}"
        )
        if rel_change < tol:
            converged = True
            log(f"Converged at iteration {n_iter - 1}")
            break
    return beta_d, n_iter, rel_change, converged, objectives


def bcd_sweep(
    beta_in: jnp.ndarray,
    Xty: jnp.ndarray,
    XtX: jnp.ndarray,
    nbr_idx: jnp.ndarray,
    n_nbrs: jnp.ndarray,
    lambda_,
    rho,
    spot_mask: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
    ov_src: Optional[jnp.ndarray] = None,
    ov_dst: Optional[jnp.ndarray] = None,
    inv_den: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One BCD sweep with fused convergence statistics (single device).

    Parameters
    ----------
    beta_in : (N, K) current abundances (read-only Jacobi buffer)
    Xty : (N, K) precomputed Y_sketch @ X_sketch.T
    XtX : (K, K) Gram matrix of the sketched signatures
    nbr_idx : (N, max_deg) int32, padding slots == N (the sentinel row)
    n_nbrs : (N,) float, true neighbor counts
    spot_mask : optional (N,) bool — False rows are padding (sharded solver);
        their convergence stats are ignored.
    ov_src, ov_dst : optional (E,) int32 overflow edge lists for
        degree-capped neighbor tables (see :func:`overflow_sum`).

    Returns
    -------
    (beta_out (N, K), max_diff scalar, max_abs_old scalar)
    """
    zero_row = jnp.zeros((1, beta_in.shape[1]), dtype=beta_in.dtype)
    beta_ext = jnp.concatenate([beta_in, zero_row], axis=0)
    nbr_sum = neighbor_sum(beta_ext, nbr_idx)
    if ov_src is not None:
        nbr_sum = nbr_sum + overflow_sum(
            beta_ext, ov_src, ov_dst, beta_in.shape[0]
        )

    if use_pallas:
        beta_out = coordinate_descent_pallas(
            beta_in, Xty, XtX, nbr_sum, n_nbrs, lambda_, rho,
            inv_den=inv_den,
        )
    else:
        beta_out = coordinate_descent(
            beta_in, Xty, XtX, nbr_sum, n_nbrs, lambda_, rho
        )
    return (beta_out, *sweep_stats(beta_out, beta_in, spot_mask))


@partial(jax.jit, static_argnames=("max_iter", "use_pallas"))
def bcd_iterate(
    beta0: jnp.ndarray,
    Xty: jnp.ndarray,
    XtX: jnp.ndarray,
    nbr_idx: jnp.ndarray,
    n_nbrs: jnp.ndarray,
    lambda_,
    rho,
    tol,
    max_iter: int,
    use_pallas: bool = False,
    iter_cap=None,
    ov_src: Optional[jnp.ndarray] = None,
    ov_dst: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused solve loop: sweeps until rel-change < tol or max_iter sweeps.

    Matches the reference driver semantics (reference
    ``flashdeconv/core/solver.py:385-413``): the convergence statistic of
    sweep t is max_i max_k |Delta beta| / (max_i max_k |beta_old| + 1e-10),
    and the sweep that satisfies it is still applied.

    Returns (beta, n_iterations, rel_change). Runs entirely on device inside
    one compiled while-loop — the host only sees the final state.
    """
    inv_den = gs_inv_den(XtX, n_nbrs, lambda_) if use_pallas else None
    return converge_loop(
        lambda beta: bcd_sweep(
            beta, Xty, XtX, nbr_idx, n_nbrs, lambda_, rho,
            use_pallas=use_pallas, ov_src=ov_src, ov_dst=ov_dst,
            inv_den=inv_den,
        ),
        beta0, tol, max_iter, iter_cap=iter_cap,
    )


def objective_terms(
    beta: jnp.ndarray,
    Xty: jnp.ndarray,
    XtX: jnp.ndarray,
    YtY,
    nbr_idx: jnp.ndarray,
    n_nbrs: jnp.ndarray,
    lambda_,
    rho,
    ov_src: Optional[jnp.ndarray] = None,
    ov_dst: Optional[jnp.ndarray] = None,
):
    """Objective value from precomputed matrices and the neighbor table.

    fidelity = 0.5*(||Y||^2 - 2 Tr(Y^T beta X) + Tr(beta^T beta XtX))
    spatial  = 0.5*lambda*(sum_i deg_i ||beta_i||^2 - sum_i <beta_i, nbr_sum_i>)
    sparsity = rho*||beta||_1

    The spatial term expands Tr(beta^T (D - A) beta) without materializing L.
    """
    cross = jnp.sum(beta * Xty)
    BtB = jnp.dot(beta.T, beta, precision=_PREC)
    quad = jnp.sum(BtB * XtX)
    fidelity = 0.5 * (YtY - 2.0 * cross + quad)

    zero_row = jnp.zeros((1, beta.shape[1]), dtype=beta.dtype)
    beta_ext = jnp.concatenate([beta, zero_row], axis=0)
    ns = neighbor_sum(beta_ext, nbr_idx)
    if ov_src is not None:
        ns = ns + overflow_sum(beta_ext, ov_src, ov_dst, beta.shape[0])
    deg_term = jnp.sum(n_nbrs * jnp.sum(beta * beta, axis=1))
    adj_term = jnp.sum(beta * ns)
    spatial = 0.5 * lambda_ * (deg_term - adj_term)

    sparsity = rho * jnp.sum(jnp.abs(beta))
    return fidelity + spatial + sparsity


def bcd_sweep_banded(
    beta_in, Xty, XtX, offsets, masks, rest_nbr_idx, n_nbrs, lambda_, rho,
    halo: int, use_pallas: bool = False, inv_den=None,
):
    """BCD sweep with the banded neighbor decomposition (grid fast path)."""
    nbr_sum = neighbor_sum_banded(beta_in, offsets, masks, rest_nbr_idx, halo)
    if use_pallas:
        beta_out = coordinate_descent_pallas(
            beta_in, Xty, XtX, nbr_sum, n_nbrs, lambda_, rho,
            inv_den=inv_den,
        )
    else:
        beta_out = coordinate_descent(
            beta_in, Xty, XtX, nbr_sum, n_nbrs, lambda_, rho
        )
    return (beta_out, *sweep_stats(beta_out, beta_in))


@partial(jax.jit, static_argnames=("offsets", "max_iter", "halo", "use_pallas"))
def bcd_iterate_banded(
    beta0, Xty, XtX, offsets, masks, rest_nbr_idx, n_nbrs, lambda_, rho, tol,
    max_iter: int, halo: int, use_pallas: bool = False, iter_cap=None,
):
    """Fused solve loop over :func:`bcd_sweep_banded`; same convergence
    semantics as :func:`bcd_iterate`."""
    inv_den = gs_inv_den(XtX, n_nbrs, lambda_) if use_pallas else None
    return converge_loop(
        lambda beta: bcd_sweep_banded(
            beta, Xty, XtX, offsets, masks, rest_nbr_idx, n_nbrs,
            lambda_, rho, halo=halo, use_pallas=use_pallas,
            inv_den=inv_den,
        ),
        beta0, tol, max_iter, iter_cap=iter_cap,
    )


@partial(jax.jit, static_argnames=("offsets", "halo"))
def objective_terms_banded(
    beta, Xty, XtX, YtY, offsets, masks, rest_nbr_idx, n_nbrs, lambda_, rho,
    halo: int,
):
    """Objective using the banded neighbor decomposition (no gather table).

    Same algebra as :func:`objective_terms`; lets the banded solve path skip
    building and transferring the (N, max_deg) padded gather table entirely.
    """
    cross = jnp.sum(beta * Xty)
    BtB = jnp.dot(beta.T, beta, precision=_PREC)
    quad = jnp.sum(BtB * XtX)
    fidelity = 0.5 * (YtY - 2.0 * cross + quad)

    ns = neighbor_sum_banded(beta, offsets, masks, rest_nbr_idx, halo)
    deg_term = jnp.sum(n_nbrs * jnp.sum(beta * beta, axis=1))
    adj_term = jnp.sum(beta * ns)
    spatial = 0.5 * lambda_ * (deg_term - adj_term)

    sparsity = rho * jnp.sum(jnp.abs(beta))
    return fidelity + spatial + sparsity


# Module-level jitted entry point: created once so the trace cache persists
# across bcd_solve calls (a fresh jax.jit wrapper per call would retrace and
# recompile every solve).
objective_terms_jit = jax.jit(objective_terms)
