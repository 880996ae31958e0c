"""Host-facing BCD solver driver around the device sweep kernels.

API parity with the reference solver (reference
``flashdeconv/core/solver.py:287-452``): same signature, same ``info`` dict
contract, same rho rescaling and convergence rule — but the hot loop is a
single compiled XLA while-loop on the accelerator
(:func:`flashdeconv_tpu.ops.bcd.bcd_iterate`) instead of Numba threads.

Two entry points:

* :func:`bcd_solve` — one-shot, reference-parity signature.
* :class:`BCDProblem` (via :func:`prepare_bcd`) — splits the solve into a
  one-time *prepare* phase (host precompute: Gram/Xty matmuls, banded graph
  decomposition, padded tables, device uploads) and a *solve* phase that is
  pure device work. Re-solves over the same (Y_sketch, X_sketch, A) operands
  — lambda paths, warm restarts, benchmark repeats — skip every host pass
  and cost only the fused device while-loop. This mirrors the role of
  per-solve precomputation in the reference driver (reference
  ``flashdeconv/core/solver.py:346-347``), amortized one level higher.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import sparse

from flashdeconv_tpu.utils.graph import (
    adjacency_to_padded,
    adjacency_to_padded_capped,
)


def soft_threshold(x: float, threshold: float) -> float:
    """Scalar soft-thresholding prox (host convenience / parity helper)."""
    if x > threshold:
        return x - threshold
    if x < -threshold:
        return x + threshold
    return 0.0


def precompute_gram_matrix(X_sketch: np.ndarray) -> np.ndarray:
    """Gram matrix XtX = X_sketch @ X_sketch.T, shape (K, K).

    Raises ``ValueError`` when the Gram matrix comes out non-finite (NaN /
    Inf signatures, or f32 overflow): a poisoned XtX silently drives EVERY
    spot to the uniform fallback, which the reference returns without
    complaint (its clipped Numba update maps NaN to 0) — failing loudly
    here is deliberate; see docs/migration.md.
    """
    XtX = X_sketch @ X_sketch.T
    if not np.all(np.isfinite(XtX)):
        raise ValueError(
            "X_sketch produced a non-finite Gram matrix (NaN/Inf in the "
            "signature matrix, or overflow) — every proportion would "
            "degenerate to uniform. Check the reference signatures and "
            "preprocessing."
        )
    return XtX


def sanitize_xty_rows(Xty: np.ndarray) -> Tuple[np.ndarray, int]:
    """Zero Xty rows containing non-finite values; return (Xty, n_bad).

    A poisoned spot (NaN/Inf counts, negative values pushed through log1p)
    must not NaN its proportions row. With its Xty row zeroed: at
    ``lambda = 0`` (or an isolated spot) the row's beta is driven to 0 and
    :func:`normalize_proportions` yields uniform 1/K — exactly the
    reference's emergent outcome (reference
    ``flashdeconv/core/solver.py:75-93``: ``max(0.0, nan)`` is 0.0 under
    Numba); with spatial coupling the spot is instead IMPUTED from its
    neighbors (the ``lam * ns`` term), a deliberate divergence from the
    reference, whose pinned-zero row also contributes nothing back to its
    neighborhood — see docs/migration.md behavioral difference #6. Finite
    rows pass through untouched (no copy when nothing is bad), so every
    parity/bitwise contract on finite inputs is preserved.
    """
    bad = ~np.isfinite(Xty).all(axis=1)
    n_bad = int(bad.sum())
    if n_bad:
        Xty = Xty.copy()
        Xty[bad] = 0.0
    return Xty, n_bad


def sanitize_yty(
    yty: Optional[float], Y_sketch: Optional[np.ndarray]
) -> float:
    """Best-effort YtY of the *sanitized* problem (poisoned rows as zeros).

    ONE home for the whole YtY policy shared by every solver driver
    (``BCDProblem``, both sharded problems, ``fit_distributed``): pass
    ``yty=None`` to compute the Frobenius constant from ``Y_sketch``
    (:func:`flashdeconv_tpu.native.yty_f64`), or a precomputed value to
    sanitize only.

    The row guard (:func:`sanitize_xty_rows` / the device-side equivalent)
    makes the SOLVE treat a poisoned spot as a zero observation, but the
    objective's Frobenius constant is reduced from the raw sketch — one
    NaN count would leave ``info["final_objective"]`` (the quantity
    docs/deployment.md tells operators to monitor) NaN even though beta
    and the proportions are finite. When the reduction came out non-finite
    and the sketch rows are available, recompute it with the non-finite
    rows zeroed — the same shape and block-ordered reduction as the clean
    path, so the result is bit-identical to solving the explicitly-zeroed
    input. The degraded re-reduction avoids a second full sketch in
    memory: bad rows are found with a chunked scan (no (N, d) boolean
    temp) and zeroed IN PLACE with save/restore when the buffer is
    writable (full copy only as the read-only fallback). Exact
    pass-through for finite ``yty`` (the only case parity contracts
    cover); with no sketch to attribute against (precomputed ``yty`` +
    ``Y_sketch=None``) the caller must repair upstream (see
    ``FlashDeconv._fused_xty_feed``'s poisoned-row re-run).
    """
    from flashdeconv_tpu import native

    if yty is None:
        yty = native.yty_f64(Y_sketch)
    if np.isfinite(yty) or Y_sketch is None:
        return float(yty)
    Y_sketch = np.asarray(Y_sketch)
    n, d = Y_sketch.shape
    step = max(1, (1 << 22) // max(d, 1))  # ~4M elements per scan chunk
    bad_parts = [
        np.flatnonzero(~np.isfinite(Y_sketch[a: a + step]).all(axis=1)) + a
        for a in range(0, n, step)
    ]
    bad = (
        np.concatenate(bad_parts) if bad_parts
        else np.zeros(0, dtype=np.int64)
    )
    if bad.size == 0:
        return float(yty)  # reduction overflow, not row poison: keep honest
    if Y_sketch.flags.writeable:
        saved = Y_sketch[bad].copy()
        try:
            Y_sketch[bad] = 0.0
            return native.yty_f64(Y_sketch)
        finally:
            Y_sketch[bad] = saved
    Yz = np.array(Y_sketch, copy=True)
    Yz[bad] = 0.0
    return native.yty_f64(Yz)


def precompute_XtY(X_sketch: np.ndarray, Y_sketch: np.ndarray) -> np.ndarray:
    """H = X_sketch @ Y_sketch.T, shape (K, N) — computed once per solve."""
    return X_sketch @ Y_sketch.T


def compute_objective(
    beta: np.ndarray,
    H: np.ndarray,
    XtX: np.ndarray,
    YtY: float,
    L: sparse.spmatrix,
    lambda_: float,
    rho: float,
) -> float:
    """Objective via the algebraic expansion (host/numpy reference form).

    0.5*(YtY - 2 Tr(Y^T beta X) + Tr(beta^T beta XtX))
    + 0.5*lambda*Tr(beta^T L beta) + rho*||beta||_1

    The 0.5 on the Laplacian term matches the coordinate-update convention
    used by :func:`bcd_solve` (lambda enters the denominator undoubled).
    """
    cross = float(np.sum(beta * H.T))
    quad = float(np.sum((beta.T @ beta) * XtX))
    fidelity = 0.5 * (YtY - 2.0 * cross + quad)
    spatial = 0.5 * lambda_ * float(np.sum(beta * (L @ beta)))
    sparsity = rho * float(np.sum(np.abs(beta)))
    return fidelity + spatial + sparsity


class GraphDecomposition:
    """Precomputed banded-vs-gather analysis of one adjacency matrix.

    Everything :class:`BCDProblem` derives from ``(A, coords, n_spots)``
    alone — the banded split, the optional scrambled-grid re-sort
    permutation, and the solve-order adjacency. Computing it is a pure
    host pass, so a pipeline can run it on a background thread as soon as
    the spatial graph exists (it depends on neither the sketch nor any
    device state) and hand it to :func:`prepare_bcd` via ``graph_plan=``.
    """

    __slots__ = ("use_banded", "perm", "A_solve", "offsets", "masks",
                 "A_rest")

    def __init__(self, A: sparse.spmatrix, n_spots: int,
                 coords: Optional[np.ndarray] = None):
        from flashdeconv_tpu.utils.graph import banded_split

        self.use_banded = False
        self.perm = None
        self.A_solve = A
        self.offsets = self.masks = self.A_rest = None
        if n_spots < 8192:
            return
        # 32 offsets: grid kNN graphs have ~18 distinct diagonals; capping
        # at 16 strands a few corner edges in the gather remainder, which
        # both adds a gather pass and disqualifies the fully fused kernel.
        offsets_np, masks_np, A_rest = banded_split(
            A, max_offsets=32, min_coverage=0.9
        )
        if (
            offsets_np.size == 0
            and coords is not None
            and np.asarray(coords).ndim == 2
            and np.asarray(coords).shape[1] >= 2
        ):
            cand = np.lexsort(
                (np.asarray(coords)[:, 0], np.asarray(coords)[:, 1])
            )
            A_cand = A.tocsr()[cand][:, cand]
            off_c, masks_c, rest_c = banded_split(
                A_cand, max_offsets=32, min_coverage=0.9
            )
            if off_c.size:
                self.perm = cand
                self.A_solve = A_cand
                offsets_np, masks_np, A_rest = off_c, masks_c, rest_c
        self.offsets, self.masks, self.A_rest = offsets_np, masks_np, A_rest
        self.use_banded = offsets_np.size > 0


def _degenerate_result(n_spots: int, n_types: int) -> Tuple[np.ndarray, dict]:
    """Empty-input / zero-iteration fast path (reference ``solver.py:334-343``)."""
    beta = np.full((n_spots, n_types), 1.0 / max(n_types, 1), dtype=np.float64)
    if n_spots == 0 or n_types == 0:
        beta = np.empty((n_spots, n_types), dtype=np.float64)
    return beta, {
        "converged": n_spots == 0 or n_types == 0,
        "n_iterations": 0,
        "final_objective": 0.0,
        "objectives": [],
        "final_change": 0.0,
    }


class BCDProblem:
    """A prepared BCD solve: device-resident operands + graph decomposition.

    Construction performs every host pass the solve needs — the (N, K)
    ``Xty = Y_sketch @ X_sketch.T`` matmul, the f64 Gram/YtY reductions, the
    banded-vs-gather graph decomposition (with optional coordinate re-sort),
    degree-capped padded neighbor tables, Pallas block padding — and uploads
    the results to the accelerator once. :meth:`solve` then runs only the
    fused device while-loop; hyperparameters (lambda, rho, tol) are traced
    scalars, so re-solves reuse one compiled executable per
    (shape, max_iter) pair.

    Parameters
    ----------
    Y_sketch : (n_spots, sketch_dim) sketched spatial data
    X_sketch : (n_cell_types, sketch_dim) sketched signatures
    A : (n_spots, n_spots) sparse adjacency
    dtype : device compute dtype (float32 on TPU; float64 needs x64 on CPU)
    coords : optional (n_spots, >=2) coordinates — performance hint only:
        when the graph is not banded in input order, a row-major (y, x)
        re-sort is attempted so scrambled grid/hex lattices still hit the
        banded fast path. Results always return in the original spot order.
    max_degree : optional int — cap on the padded neighbor table's width
        (gather path). Default (None) caps at 1.5x the 99.9th-percentile
        degree, which never binds on kNN graphs but keeps one dense cluster
        in a radius/hub graph from blowing the table up to O(N * max_deg);
        excess edges spill to an exact overflow edge list
        (:func:`flashdeconv_tpu.ops.bcd.overflow_sum`).
    """

    def __init__(
        self,
        Y_sketch: np.ndarray,
        X_sketch: np.ndarray,
        A: sparse.spmatrix,
        dtype=np.float32,
        coords: Optional[np.ndarray] = None,
        max_degree: Optional[int] = None,
        graph_plan: Optional[GraphDecomposition] = None,
        xty: Optional[np.ndarray] = None,
        yty: Optional[float] = None,
    ):
        import jax
        import jax.numpy as jnp

        if Y_sketch is None and (xty is None or yty is None):
            raise ValueError(
                "Y_sketch=None requires both xty and yty precomputed "
                "(e.g. from native.fused_log1pcpm_xty)."
            )
        if xty is not None and np.shape(xty) != (
            A.shape[0], int(X_sketch.shape[0])
        ):
            raise ValueError(
                f"xty shape {np.shape(xty)} does not match the adjacency / "
                f"signature dimensions ({A.shape[0]}, {X_sketch.shape[0]})"
            )
        self.n_spots = int(
            Y_sketch.shape[0] if Y_sketch is not None else xty.shape[0]
        )
        self.n_types = int(X_sketch.shape[0])
        self.dtype = np.dtype(dtype)
        self._degenerate = self.n_spots == 0 or self.n_types == 0
        if self._degenerate:
            return

        n_spots, n_types = self.n_spots, self.n_types

        XtX = precompute_gram_matrix(np.asarray(X_sketch, dtype=np.float64))

        # Compute Xty and dispatch its upload FIRST: at atlas scale the
        # (N, K) transfer is the prepare phase's interconnect cost on a
        # remote-attached chip, and jnp.asarray returns as soon as the
        # transfer is enqueued — the graph decomposition and YtY reduction
        # below run on the host while the bytes stream. Any banded re-sort
        # permutation is applied to the device copy afterwards (an exact
        # row gather, sub-ms on device).
        if xty is not None:
            if isinstance(xty, jax.Array):
                # Already device-resident (the pipeline's streamed chunked
                # upload, core/deconv._fused_xty_feed): cast on device.
                Xty_raw_d = jnp.asarray(xty, dtype=self.dtype)
            else:
                Xty_raw_d = jnp.asarray(np.asarray(xty, dtype=self.dtype))
        else:
            Xty_raw_d = jnp.asarray(
                np.asarray(Y_sketch @ X_sketch.T, dtype=self.dtype)
            )  # (n_spots, K), input order
        # Non-finite guard, applied ON DEVICE so the streamed prepare never
        # syncs (see sanitize_xty_rows for the semantics — poisoned spots
        # are spatially imputed under lambda > 0, uniform otherwise).
        # jnp.where is an exact pass-through for finite rows, so the f64
        # bit-determinism and Pallas parity contracts are untouched; the
        # count stays device-resident and is only fetched by the lazy
        # n_nonfinite_spots property.
        finite_row = jnp.all(jnp.isfinite(Xty_raw_d), axis=1, keepdims=True)
        self._xty_bad_d = jnp.sum(~finite_row, dtype=jnp.int32)
        Xty_raw_d = jnp.where(
            finite_row, Xty_raw_d, jnp.zeros((), self.dtype)
        )
        # rho is user-facing dimensionless: rescaled by the Gram diagonal so
        # the soft threshold is commensurate with the residual magnitude.
        self.mean_diag = float(np.mean(np.diag(XtX)))

        # Banded neighbor decomposition: on grid-structured graphs (or any
        # locality-ordered planar graph) the neighbor sum becomes a handful
        # of contiguous shifted adds instead of a random row gather, which on
        # TPU is DMA-latency-bound. Used when >=90% of edges fall on <=16
        # diagonal offsets and the problem is big enough for gather cost to
        # matter. When the input order is scrambled but coordinates are
        # available, a row-major (y, x) re-sort is attempted — grids and hex
        # lattices become banded under it; beta is returned in the original
        # order. Accepts a precomputed plan (graph_plan=) — either a
        # GraphDecomposition or a Future of one, joined only now, AFTER the
        # Xty upload is already streaming — so pipelines can run this
        # analysis on a background thread while earlier stages execute.
        if graph_plan is not None and hasattr(graph_plan, "result"):
            graph_plan = graph_plan.result()
        if graph_plan is None:
            graph_plan = GraphDecomposition(A, n_spots, coords=coords)
        use_banded = graph_plan.use_banded
        perm = graph_plan.perm
        A_solve = graph_plan.A_solve
        offsets_np, masks_np = graph_plan.offsets, graph_plan.masks
        A_rest = graph_plan.A_rest
        rest_nbr_np = None
        self.use_banded = use_banded
        self.perm = perm

        # Pallas tiers. The unfused coordinate-descent block kernel keeps
        # its fixed 2048 block and K <= 128 envelope; the fully fused
        # banded kernel is planned independently (plan_fused_banded picks
        # the largest block whose VMEM working set fits — smaller blocks
        # carry it to K ~ 256), so large-K grid problems stay on Pallas
        # even where the unfused CD kernel cannot. Either tier requires
        # the spot axis padded to a 2048 multiple (every planned fused
        # block divides 2048); the padded rows are all-zero with zero
        # Xty / no neighbors, so they stay exactly zero through every
        # sweep (and the appended-zero-row sentinel at index n_spots now
        # lands on such a padded row — still zero).
        pallas_tier = (
            jax.default_backend() == "tpu" and self.dtype == np.float32
        )
        use_pallas = pallas_tier and n_types <= 128
        fused_plan = None
        # NOTE (round 5, measured): band-capping — spilling the ~8
        # near-empty boundary-artifact bands of a grid kNN graph into the
        # rest-stream — was tried and is intentionally NOT done: the XLA
        # scatter maintaining the rest buffer costs ~0.75 ms/sweep at
        # 1M x 20 (TPU scatters serialize) vs ~0.3 ms for the 8 spilled
        # band FMAs, a net 33% sweep regression. The rest-stream below
        # exists for ELIGIBILITY: banded-dominant graphs whose remainder
        # is natively nonzero now take the fused kernel (+ rest stream)
        # instead of falling back to the ~4x slower unfused banded path.
        # Fused eligibility: everything banded, or a rest remainder small
        # enough for the compact rest-stream (bounded scatter width).
        def _rest_fusable(rest):
            return rest.nnz == 0 or (
                rest.nnz <= 0.02 * max(int(A_solve.nnz), 1)
                and int(np.diff(rest.tocsr().indptr).max()) <= 8
            )

        if pallas_tier and use_banded and _rest_fusable(A_rest):
            from flashdeconv_tpu.ops.bcd import (
                FUSED_BLOCK_CANDIDATES_1D,
                plan_fused_banded,
            )

            halo_spots = int(np.max(np.abs(offsets_np)))
            fused_plan = plan_fused_banded(
                n_types, int(offsets_np.size), halo_spots,
                candidates=FUSED_BLOCK_CANDIDATES_1D,
                rest=A_rest.nnz > 0,
            )
            if fused_plan is None:
                # Rescue: a handful of long-range edges can be absorbed
                # by banded_split as near-singleton "bands" whose offsets
                # inflate the halo past any plannable h (seen with ~100
                # random extra edges on a 262k grid: halo 257k). Spill
                # pathological bands into the rest-stream and re-plan —
                # this path only runs when the direct plan FAILED, so the
                # measured no-cap-on-grids decision stands.
                from flashdeconv_tpu.utils.graph import cap_sparse_bands

                off2, masks2, rest2 = cap_sparse_bands(
                    offsets_np, masks_np, A_rest, int(A_solve.nnz)
                )
                if off2.size and off2.size < offsets_np.size \
                        and _rest_fusable(rest2):
                    halo2 = int(np.max(np.abs(off2)))
                    plan2 = plan_fused_banded(
                        n_types, int(off2.size), halo2,
                        candidates=FUSED_BLOCK_CANDIDATES_1D, rest=True,
                    )
                    if plan2 is not None:
                        offsets_np, masks_np, A_rest = off2, masks2, rest2
                        fused_plan = plan2
        n_solve = n_spots
        if use_pallas or fused_plan is not None:
            # Pad the spot axis to the larger of 2048 (the unfused Pallas
            # CD kernel's fixed block) and the planned fused block (4096
            # at small K — see FUSED_BLOCK_CANDIDATES_1D).
            gran = 2048
            if fused_plan is not None:
                gran = max(gran, int(fused_plan[0]))
            n_solve = -(-n_spots // gran) * gran
        pad = n_solve - n_spots
        self.use_pallas = use_pallas
        self.n_solve = n_solve
        self.pad = pad

        ov_src = ov_dst = None
        if use_banded:
            # No gather table at all on the banded path: degrees suffice.
            # Binary degree (nnz per row), NOT edge-weight sums — the sweep
            # kernels treat every edge as weight 1, matching the reference's
            # CSR-index iteration.
            nbr_idx = None
            n_nbrs = np.diff(A_solve.tocsr().indptr).astype(np.int32)
        else:
            nbr_idx, n_nbrs, ov_src, ov_dst = adjacency_to_padded_capped(
                A_solve, max_degree=max_degree
            )
            if ov_src.size == 0:
                ov_src = ov_dst = None
            if pad:
                nbr_idx = np.concatenate(
                    [nbr_idx, np.full((pad, nbr_idx.shape[1]), n_spots,
                                      dtype=nbr_idx.dtype)], axis=0
                )
        if pad:
            n_nbrs = np.concatenate([n_nbrs, np.zeros(pad, dtype=n_nbrs.dtype)])

        if use_banded:
            self.halo = int(np.max(np.abs(offsets_np)))
            if A_rest.nnz:
                rest_nbr_np, _ = adjacency_to_padded(A_rest)
            else:
                rest_nbr_np = np.zeros((n_spots, 0), dtype=np.int32)
            if pad:
                masks_np = np.concatenate(
                    [masks_np,
                     np.zeros((masks_np.shape[0], pad), dtype=np.float32)],
                    axis=1,
                )
                rest_nbr_np = np.concatenate(
                    [rest_nbr_np,
                     np.full((pad, rest_nbr_np.shape[1]), n_spots,
                             dtype=np.int32)],
                    axis=0,
                )
            self.offsets = tuple(int(o) for o in offsets_np)

        # Remaining device operands (uploaded once). The already-streaming
        # Xty copy is permuted / padded on device in its (N, K) form —
        # never on the (N, d) sketch.
        Xty_d = Xty_raw_d
        if perm is not None:
            Xty_d = jnp.take(Xty_d, jnp.asarray(perm, dtype=jnp.int32),
                             axis=0)
        if pad:
            Xty_d = jnp.concatenate(
                [Xty_d, jnp.zeros((pad, n_types), dtype=self.dtype)]
            )
        self.Xty_d = Xty_d  # (n_solve, K)
        self.XtX_d = jnp.asarray(XtX, dtype=self.dtype)
        self.nnb_d = jnp.asarray(n_nbrs, dtype=self.dtype)
        if use_banded:
            # The masks are 0/1: ship them as uint8 (4x less tunnel
            # traffic at 1M spots). The fused kernel consumes the uint8
            # copy directly (widening in-VMEM, 4x less HBM per sweep);
            # the unfused banded path widens once here.
            masks_u8_d = jnp.asarray(masks_np.astype(np.uint8))
            self.masks_d = masks_u8_d
            self.rest_d = jnp.asarray(rest_nbr_np)
        else:
            self.nbr_d = jnp.asarray(nbr_idx)
            self.ov_src_d = jnp.asarray(ov_src) if ov_src is not None else None
            self.ov_dst_d = jnp.asarray(ov_dst) if ov_dst is not None else None

        # Fully fused banded sweep (ops/bcd.fused_banded_sweep): neighbor
        # sum + Gauss-Seidel pass + convergence stats in ONE VMEM kernel on
        # a transposed block-padded carry — eliminates the per-offset beta
        # re-reads, the per-sweep (N, K) <-> (K, N) transposes, and the
        # separate stats pass. Eligible when the decomposition is 100%
        # banded (no gather remainder) and plan_fused_banded found a block
        # whose working set fits the VMEM gate (computed above, before the
        # padding decision).
        self.use_fused_banded = fused_plan is not None
        if self.use_fused_banded:
            self.fused_block, self.h_blocks = (
                int(fused_plan[0]), int(fused_plan[1])
            )
            # One-time device transposes into the kernel layout.
            # Eager ops, NOT jax.jit(lambda ...): a fresh jit wrapper
            # per ctor call would retrace AND remote-recompile on
            # every prepare (~0.4 s each over the tunnel); eager
            # primitives hit the cached dispatch path.
            self.Xty_t_d = Xty_d.T
            # The row-layout Xty is unreachable on the fused path
            # (sweep AND objective consume the transposed / uint8
            # copies); release it so the dominant (N, K) buffer is not
            # resident twice (~800 MB at 10M spots). The tiny (n_solve,)
            # degree vector STAYS resident: the per-solve reciprocal
            # denominator (ops/bcd.gs_inv_den) is computed from it on
            # device at the top of every fused solve program.
            self.Xty_d = None
            # Compact rest-edge tables for the rest-stream (the spilled
            # sparse bands + any native remainder — see
            # ops/bcd.build_fused_rest_tables).
            from flashdeconv_tpu.ops.bcd import build_fused_rest_tables

            touched_np, slots_np = build_fused_rest_tables(
                rest_nbr_np, n_spots, self.h_blocks, self.fused_block
            )
            self.rest_touched_d = (
                jnp.asarray(touched_np) if touched_np is not None else None
            )
            self.rest_slots_d = (
                jnp.asarray(slots_np) if slots_np is not None else None
            )
        if use_banded and not self.use_fused_banded:
            # Unfused banded sweeps multiply by the masks every offset
            # pass: widen the uint8 copy once and keep only the f32.
            self.masks_d = masks_u8_d.astype(self.dtype)
        if perm is not None:
            inv = np.empty(n_spots, dtype=np.int32)
            inv[perm] = np.arange(n_spots, dtype=np.int32)
            self._inv_perm_d = jnp.asarray(inv)

        # YtY: f64-accumulated without materializing a float64 copy of
        # Y_sketch (the copy costs ~8 GB at 1M x 512). The threaded native
        # reduction takes over at atlas scale (different last-ULP
        # association than einsum — it only feeds the objective constant);
        # small problems keep einsum's exact sequential accumulation.
        self.YtY = sanitize_yty(yty, Y_sketch)
        self.YtY_d = jnp.asarray(self.YtY, dtype=self.dtype)

    @property
    def n_nonfinite_spots(self) -> int:
        """Spots whose Xty row contained NaN/Inf and was zeroed at prepare
        time (spatially imputed under lambda > 0, uniform otherwise — see
        :func:`sanitize_xty_rows`). Reading this fetches a device scalar,
        i.e. it synchronizes with the device."""
        bad = getattr(self, "_xty_bad_d", None)
        if bad is None:
            return 0
        import jax

        return int(jax.device_get(bad))

    # -- internal device closures -----------------------------------------
    def _run_chunk(self, beta_d, lam_d, rho_d, tol_d, max_iter: int, cap):
        from flashdeconv_tpu.ops.bcd import (
            bcd_iterate,
            bcd_iterate_banded,
            bcd_iterate_banded_fused,
        )

        if self.use_fused_banded:
            # beta_d is the transposed padded carry here (see solve());
            # masks_d is the uint8 copy, widened in-kernel.
            return bcd_iterate_banded_fused(
                beta_d, self.Xty_t_d, self.XtX_d, self.masks_d,
                self.nnb_d, lam_d, rho_d, tol_d, max_iter,
                self.offsets, self.h_blocks, block=self.fused_block,
                rest_touched=self.rest_touched_d,
                rest_slot_cols=self.rest_slots_d,
                iter_cap=cap,
            )
        if self.use_banded:
            return bcd_iterate_banded(
                beta_d, self.Xty_d, self.XtX_d, self.offsets, self.masks_d,
                self.rest_d, self.nnb_d, lam_d, rho_d, tol_d, max_iter,
                self.halo, self.use_pallas, iter_cap=cap,
            )
        return bcd_iterate(
            beta_d, self.Xty_d, self.XtX_d, self.nbr_d, self.nnb_d,
            lam_d, rho_d, tol_d, max_iter, use_pallas=self.use_pallas,
            iter_cap=cap, ov_src=self.ov_src_d, ov_dst=self.ov_dst_d,
        )

    def _eval_objective(self, beta_d, lam_d, rho_d):
        """Async-dispatches the device objective; returns a jax scalar."""
        from flashdeconv_tpu.ops.bcd import (
            objective_terms_banded,
            objective_terms_jit,
        )

        if self.use_fused_banded:
            from flashdeconv_tpu.ops.bcd import objective_terms_banded_fused

            return objective_terms_banded_fused(
                beta_d, self.Xty_t_d, self.XtX_d, self.YtY_d, self.offsets,
                self.masks_d, lam_d, rho_d,
                self.h_blocks, self.fused_block,
                nnb=self.nnb_d, rest_touched=self.rest_touched_d,
                rest_slot_cols=self.rest_slots_d,
            )
        if self.use_banded:
            return objective_terms_banded(
                beta_d, self.Xty_d, self.XtX_d, self.YtY_d, self.offsets,
                self.masks_d, self.rest_d, self.nnb_d, lam_d, rho_d,
                self.halo,
            )
        return objective_terms_jit(
            beta_d, self.Xty_d, self.XtX_d, self.YtY_d, self.nbr_d,
            self.nnb_d, lam_d, rho_d, ov_src=self.ov_src_d,
            ov_dst=self.ov_dst_d,
        )

    def _beta0(self, beta_init: Optional[np.ndarray]):
        import jax.numpy as jnp

        if beta_init is None:
            return jnp.zeros(
                (self.n_solve, self.n_types), dtype=self.dtype
            ).at[: self.n_spots].set(1.0 / self.n_types)
        if beta_init.shape != (self.n_spots, self.n_types):
            raise ValueError(
                f"beta_init shape {beta_init.shape} does not match "
                f"({self.n_spots}, {self.n_types})"
            )
        b0 = np.maximum(np.asarray(beta_init, dtype=self.dtype), 0.0)
        if self.perm is not None:
            b0 = b0[self.perm]
        if self.pad:
            b0 = np.concatenate(
                [b0, np.zeros((self.pad, self.n_types), dtype=self.dtype)]
            )
        return jnp.asarray(b0, dtype=self.dtype)

    def solve(
        self,
        lambda_: float = 0.1,
        rho: float = 0.01,
        max_iter: int = 100,
        tol: float = 1e-4,
        verbose: bool = False,
        beta_init: Optional[np.ndarray] = None,
        return_device: bool = False,
    ) -> Tuple[np.ndarray, dict]:
        """Run the fused device solve on the prepared operands.

        Parameters match :func:`bcd_solve`. ``return_device=True`` returns
        beta as a device array in the solve dtype (already un-permuted and
        un-padded) instead of fetching it to host float64 — at atlas scale
        the (N, K) fetch is pure interconnect time a downstream device
        consumer need not pay.

        Returns (beta, info) with the standard info contract.
        """
        import jax
        import jax.numpy as jnp

        if self._degenerate or max_iter == 0:
            return _degenerate_result(self.n_spots, self.n_types)

        lam_d = jnp.asarray(lambda_, dtype=self.dtype)
        rho_d = jnp.asarray(rho * self.mean_diag, dtype=self.dtype)
        tol_d = jnp.asarray(tol, dtype=self.dtype)
        # The non-verbose solve runs as ONE compiled program
        # (ops/bcd.fused_solve_program for the fused tier,
        # ops/bcd.solve_program for the gather/unfused-banded tiers): on a
        # remote-attached chip each separate dispatch costs ~1-1.5 ms of
        # tunnel command latency, and the init/loop/objective/unpack
        # sequence was ~14 ms of it at 1M spots. The program also slices +
        # un-permutes beta on device, so its output is final for both
        # return modes. The float64 path keeps the decomposed dispatches:
        # its CPU trajectories are pinned bit-level to the reference
        # implementation (and bit-deterministic run-to-run), and a jit
        # re-composition is not worth any fusion-order risk there — while
        # its dispatch overhead on a local CPU is microseconds anyway.
        use_program = not verbose and (
            self.use_fused_banded or self.dtype == np.float32
        )
        if use_program:
            beta0 = None if beta_init is None else self._beta0(beta_init)
        else:
            beta0 = self._beta0(beta_init)
            if self.use_fused_banded:
                from flashdeconv_tpu.ops.bcd import to_fused_carry

                beta0 = to_fused_carry(beta0, self.h_blocks, self.fused_block)

        objectives: list = []
        beta_h = None
        if verbose:
            # Chunked fused loop on the reference cadence (see
            # flashdeconv_tpu.ops.bcd.chunked_verbose_solve). The static
            # bound stays max_iter (same executable as the non-verbose
            # path); the chunk length is a *traced* cap, so neither chunking
            # nor the tail ever triggers a recompile.
            from flashdeconv_tpu.ops.bcd import chunked_verbose_solve

            beta_d, n_iter, rel_change, converged, objectives = (
                chunked_verbose_solve(
                    lambda b, cap: self._run_chunk(
                        b, lam_d, rho_d, tol_d, max_iter, cap
                    ),
                    lambda b: self._eval_objective(b, lam_d, rho_d),
                    beta0, max_iter, tol,
                )
            )
            # every loop exit just evaluated the objective at the final beta
            final_obj = objectives[-1]
            if self.use_fused_banded:
                from flashdeconv_tpu.ops.bcd import from_fused_carry

                beta_d = from_fused_carry(
                    beta_d, self.h_blocks, self.fused_block
                )
        elif use_program:
            inv_perm = self._inv_perm_d if self.perm is not None else None
            cap = jnp.asarray(max_iter, dtype=jnp.int32)
            if self.use_fused_banded:
                from flashdeconv_tpu.ops.bcd import fused_solve_program

                beta_d, n_iter_d, rel_d, obj_d = fused_solve_program(
                    beta0, self.Xty_t_d, self.XtX_d, self.masks_d,
                    self.nnb_d, self.YtY_d, inv_perm, lam_d, rho_d,
                    tol_d, cap,
                    offsets=self.offsets, max_iter=max_iter,
                    h=self.h_blocks, block=self.fused_block,
                    n_spots=self.n_spots,
                    rest_touched=self.rest_touched_d,
                    rest_slot_cols=self.rest_slots_d,
                )
            else:
                from flashdeconv_tpu.ops.bcd import solve_program

                operands = {
                    "Xty": self.Xty_d, "XtX": self.XtX_d,
                    "YtY": self.YtY_d, "nnb": self.nnb_d,
                }
                if self.use_banded:
                    operands["masks"] = self.masks_d
                    operands["rest"] = self.rest_d
                    tier, offs, halo = "banded", self.offsets, self.halo
                else:
                    operands["nbr"] = self.nbr_d
                    if self.ov_src_d is not None:
                        operands["ov_src"] = self.ov_src_d
                        operands["ov_dst"] = self.ov_dst_d
                    tier, offs, halo = "gather", None, 0
                beta_d, n_iter_d, rel_d, obj_d = solve_program(
                    beta0, operands, inv_perm, lam_d, rho_d, tol_d, cap,
                    tier=tier, offsets=offs, halo=halo, max_iter=max_iter,
                    use_pallas=self.use_pallas, n_spots=self.n_spots,
                )
            # beta_d is final: (n_spots, K), un-permuted, on device.
            if return_device:
                n_iter_h, rel_h, obj_h = jax.device_get(
                    (n_iter_d, rel_d, obj_d)
                )
            else:
                n_iter_h, rel_h, obj_h, beta_h = jax.device_get(
                    (n_iter_d, rel_d, obj_d, beta_d)
                )
            n_iter = int(n_iter_h)
            rel_change = float(rel_h)
            final_obj = float(obj_h)
            converged = rel_change < tol
        else:
            # cap == bound here; passing it as a traced arg keeps this the
            # SAME compiled executable as the verbose chunked path.
            beta_d, n_iter_d, rel_d = self._run_chunk(
                beta0, lam_d, rho_d, tol_d, max_iter,
                jnp.asarray(max_iter, dtype=jnp.int32),
            )
            # Dispatch the objective BEFORE pulling anything: JAX queues it
            # behind the solve asynchronously, then one bundled device_get
            # fetches the scalars — and, when the caller wants beta on host,
            # beta itself — in a single host<->device round trip (it matters
            # when the accelerator is remote-attached).
            obj_d = self._eval_objective(beta_d, lam_d, rho_d)
            if return_device:
                n_iter_h, rel_h, obj_h = jax.device_get(
                    (n_iter_d, rel_d, obj_d)
                )
            else:
                n_iter_h, rel_h, obj_h, beta_h = jax.device_get(
                    (n_iter_d, rel_d, obj_d, beta_d)
                )
            n_iter = int(n_iter_h)
            rel_change = float(rel_h)
            final_obj = float(obj_h)
            converged = rel_change < tol

        info = {
            "converged": bool(converged),
            "n_iterations": int(n_iter),
            "final_objective": final_obj,
            "objectives": objectives,
            "final_change": float(rel_change),
        }

        if return_device:
            if use_program:  # already (n_spots, K), un-permuted on device
                return beta_d, info
            beta_out = beta_d[: self.n_spots]
            if self.perm is not None:
                beta_out = jnp.take(beta_out, self._inv_perm_d, axis=0)
            return beta_out, info

        if beta_h is None:  # verbose path fetched scalars separately
            beta_h = np.asarray(beta_d)
        beta = np.asarray(beta_h, dtype=np.float64)[: self.n_spots]
        if self.perm is not None and not use_program:
            unperm = np.empty_like(beta)
            unperm[self.perm] = beta
            beta = unperm
        return beta, info


def prepare_bcd(
    Y_sketch: np.ndarray,
    X_sketch: np.ndarray,
    A: sparse.spmatrix,
    dtype=np.float32,
    coords: Optional[np.ndarray] = None,
    max_degree: Optional[int] = None,
    graph_plan: Optional[GraphDecomposition] = None,
    xty: Optional[np.ndarray] = None,
    yty: Optional[float] = None,
) -> BCDProblem:
    """Build a :class:`BCDProblem`: host precompute + device upload, once.

    ``xty``/``yty`` optionally supply the (n_spots, K) ``Y_sketch @
    X_sketch.T`` product and the Frobenius constant precomputed elsewhere
    (e.g. the pipeline's fused sketch kernel) — with both given,
    ``Y_sketch`` may be None and is never touched.
    """
    return BCDProblem(
        Y_sketch, X_sketch, A, dtype=dtype, coords=coords,
        max_degree=max_degree, graph_plan=graph_plan, xty=xty, yty=yty,
    )


def bcd_solve(
    Y_sketch: np.ndarray,
    X_sketch: np.ndarray,
    A: sparse.spmatrix,
    lambda_: float = 0.1,
    rho: float = 0.01,
    max_iter: int = 100,
    tol: float = 1e-4,
    verbose: bool = False,
    dtype=np.float32,
    beta_init: Optional[np.ndarray] = None,
    coords: Optional[np.ndarray] = None,
    max_degree: Optional[int] = None,
    graph_plan: Optional[GraphDecomposition] = None,
    xty: Optional[np.ndarray] = None,
    yty: Optional[float] = None,
    return_device: bool = False,
) -> Tuple[np.ndarray, dict]:
    """Solve min 0.5||Y - beta X||^2 + 0.5*lambda Tr(beta^T L beta) + rho||beta||_1, beta >= 0.

    One-shot driver: prepares the problem (host precompute + device upload)
    and solves. For repeated solves over the same operands — lambda paths,
    warm restarts, benchmarking — use :func:`prepare_bcd` once and call
    :meth:`BCDProblem.solve` per solve; it skips all host work.

    Parameters
    ----------
    Y_sketch : (n_spots, sketch_dim) sketched spatial data
    X_sketch : (n_cell_types, sketch_dim) sketched signatures
    A : (n_spots, n_spots) sparse adjacency
    lambda_ : spatial regularization strength
    rho : dimensionless L1 strength; internally scaled by mean(diag(XtX))
    max_iter, tol : sweep budget and relative-change stopping rule
    verbose : print objective every 10 sweeps (chunked device loop on the
        reference cadence; the non-verbose path fuses the entire solve into
        one device while-loop)
    dtype : device compute dtype (float32 on TPU; float64 needs x64 on CPU)
    beta_init : optional (n_spots, n_cell_types) warm-start abundances
        (e.g. a previous solve's ``beta_``); default cold-start is uniform
        1/K. Warm starting typically halves sweep counts on re-solves with
        perturbed data or hyperparameters.
    coords : optional (n_spots, >=2) spatial coordinates. Only used as a
        performance hint: when the graph is not banded in its input order,
        a row-major (y, x) re-sort is attempted so scrambled grid / hex
        lattices still hit the banded fast path; results are returned in
        the original spot order regardless.
    max_degree : optional cap on the padded neighbor table width; see
        :class:`BCDProblem`.
    graph_plan : optional precomputed :class:`GraphDecomposition` for A —
        lets a pipeline run the banded analysis on a background thread
        while earlier stages execute.
    xty, yty : optional precomputed ``Y_sketch @ X_sketch.T`` / Frobenius
        constant (see :func:`prepare_bcd`); with both given, ``Y_sketch``
        may be None.

    Returns
    -------
    beta : (n_spots, n_cell_types) float64 abundances
    info : {"converged", "n_iterations", "final_objective", "objectives",
            "final_change"}
    """
    n_spots = (Y_sketch if Y_sketch is not None else xty).shape[0]
    n_types = X_sketch.shape[0]
    if n_spots == 0 or n_types == 0 or max_iter == 0:
        return _degenerate_result(n_spots, n_types)

    problem = BCDProblem(
        Y_sketch, X_sketch, A, dtype=dtype, coords=coords,
        max_degree=max_degree, graph_plan=graph_plan, xty=xty, yty=yty,
    )
    return problem.solve(
        lambda_=lambda_, rho=rho, max_iter=max_iter, tol=tol,
        verbose=verbose, beta_init=beta_init, return_device=return_device,
    )


def normalize_proportions(beta: np.ndarray) -> np.ndarray:
    """Row-normalize abundances to proportions; all-zero rows become uniform."""
    beta = np.asarray(beta, dtype=np.float64)
    row_sums = beta.sum(axis=1, keepdims=True)
    zero_rows = (row_sums == 0).ravel()
    proportions = beta / np.maximum(row_sums, 1e-10)
    if np.any(zero_rows):
        proportions[zero_rows] = 1.0 / beta.shape[1]
    return proportions


_NORMALIZE_DEVICE_JIT = None


def normalize_proportions_device(beta):
    """Device-side :func:`normalize_proportions` (same zero-row rule).

    Runs in the solve dtype on the array's device so a remote-attached
    fit can fetch the proportions directly — the host f64 conversion and
    normalize pass (~0.7 s at 1M x 20) disappear from the pipeline, and
    downstream device consumers never leave HBM. Matches the host path
    to solve-dtype (f32) resolution.
    """
    global _NORMALIZE_DEVICE_JIT
    if _NORMALIZE_DEVICE_JIT is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _f(b):
            s = jnp.sum(b, axis=1, keepdims=True)
            p = b / jnp.maximum(s, jnp.asarray(1e-10, b.dtype))
            return jnp.where(s == 0.0, jnp.asarray(1.0 / b.shape[1], b.dtype), p)

        _NORMALIZE_DEVICE_JIT = _f
    import jax.numpy as jnp

    return _NORMALIZE_DEVICE_JIT(jnp.asarray(beta))
