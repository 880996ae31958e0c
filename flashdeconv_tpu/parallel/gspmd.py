"""GSPMD spot-sharded BCD solve for fully banded (grid) graphs.

The shard_map solver (:mod:`flashdeconv_tpu.parallel.solver`) plans halo
exchange explicitly — necessary for irregular graphs. On grid platforms the
banded decomposition makes a lighter design possible: write the sweep as
**global** array ops over spot-sharded operands and let XLA's SPMD
partitioner insert the communication. The banded neighbor sum is a set of
*static* shifted slices of beta; under a 1-D ``"spots"`` mesh each shift
partitions into a neighbor-shard halo transfer of exactly ``offset`` rows
(collective-permute over ICI), and the convergence ``max`` becomes an
all-reduce — the compiler derives the same communication pattern the manual
plan computes, with no index bookkeeping.

The coordinate pass itself is either plain XLA (auto-partitioned: it is
row-parallel) or the fused Pallas kernel wrapped in a ``shard_map`` (Pallas
kernels are opaque to the partitioner, but the pass is embarrassingly
row-parallel so the wrap is trivial).

On TPU meshes the whole sweep goes one step further
(:func:`_gspmd_iterate_fused`): each shard runs the single fully fused
banded Pallas kernel (:func:`flashdeconv_tpu.ops.bcd.fused_banded_sweep`)
on a transposed local carry whose side pads hold the adjacent shards'
boundary blocks, refreshed once per sweep by two ``ppermute`` block
transfers over ICI; convergence statistics are per-block partials reduced
with ``pmax``. Communication per sweep is exactly 2·h·block·K floats per
shard boundary — the minimum the banded halo requires.

Numerics are identical to the single-device banded path: same static
shifts, same coordinate updates, same convergence rule.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
from scipy import sparse

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashdeconv_tpu.parallel._runner import (
    put_addressable,
    run_prepared_solve,
    validate_beta_init,
)
from flashdeconv_tpu.ops.bcd import (
    converge_loop,
    coordinate_descent,
    coordinate_descent_pallas,
    fused_banded_sweep,
    neighbor_sum_banded,
    sweep_stats,
)

_AXIS = "spots"


@partial(
    jax.jit,
    static_argnames=("offsets", "halo", "max_iter", "mesh", "use_pallas"),
)
def _gspmd_iterate(
    beta0, Xty, XtX, masks, nnb, lam, rho, tol, iter_cap,
    offsets: Tuple[int, ...], halo: int, max_iter: int, mesh: Mesh,
    use_pallas: bool,
):
    if use_pallas:
        cd = jax.shard_map(
            coordinate_descent_pallas,
            mesh=mesh,
            in_specs=(P(_AXIS), P(_AXIS), P(), P(_AXIS), P(_AXIS), P(), P()),
            out_specs=P(_AXIS),
            check_vma=False,  # pallas_call out_shape carries no vma info
        )
    else:
        cd = coordinate_descent

    # (N, 0) rest table: the banded decomposition is required to be complete
    # here, so neighbor_sum_banded's gather branch is statically skipped.
    empty_rest = jnp.zeros((beta0.shape[0], 0), dtype=jnp.int32)

    def sweep(beta):
        ns = neighbor_sum_banded(beta, offsets, masks, empty_rest, halo)
        beta_new = cd(beta, Xty, XtX, ns, nnb, lam, rho)
        return (beta_new, *sweep_stats(beta_new, beta))

    return converge_loop(sweep, beta0, tol, max_iter, iter_cap=iter_cap)


@partial(
    jax.jit,
    static_argnames=(
        "offsets", "h", "block", "max_iter", "mesh", "overlap", "interpret"
    ),
)
def _gspmd_iterate_fused(
    beta0, Xty_t, XtX, masks, nnb, lam, rho, tol, iter_cap,
    offsets: Tuple[int, ...], h: int, block: int, max_iter: int, mesh: Mesh,
    overlap="auto", interpret: bool = False,
):
    """Sharded solve loop over the fully fused banded Pallas kernel.

    shard_map over the spot axis; per sweep each shard runs the fused
    banded Pallas kernel (:func:`flashdeconv_tpu.ops.bcd.
    fused_banded_sweep`) on its local transposed carry, whose ``h``-block
    side pads hold the adjacent shards' boundary blocks — refreshed each
    sweep by two ``ppermute`` block transfers over ICI (the global ends
    stay zero: ppermute zero-fills shards with no source). Convergence
    statistics are the kernel's per-block partials reduced by ``pmax``
    across shards, so the iterate AND the stopping decision are
    bit-identical to the single-device fused solve.

    ``overlap`` (default ``"auto"`` — see the measured engagement rule in
    the body; ``True`` forces it when each shard has at least one
    interior block) splits the sweep into an INTERIOR sub-call — data blocks whose
    neighbor windows never touch the halo pads, issued BEFORE the halo
    update so it has no data dependency on the ppermutes — and two
    h-block BOUNDARY sub-calls issued after, letting XLA's async
    collective-permute machinery run the ICI transfer underneath the
    interior kernel (the dominant term of the projected strong-scaling
    sync floor — docs/performance_guide.md). The three sub-calls write
    disjoint regions of ONE donated full-size buffer in place
    (``fused_banded_sweep(out_alias=...)``), carried ping-pong with the
    beta buffer — recomposition costs zero copies (a slice+concatenate
    recompose measured ~30% of the sweep and was replaced). Every data
    block sees the identical window and per-block math in either form
    (Jacobi reads are pre-sweep by construction), so the split
    recomposes the unsplit sweep BITWISE (pinned by
    tests/test_fused_banded.py).

    The transposed-carry layout is fully encapsulated: this function takes
    and returns the (n_pad, K) row-sharded beta of the outer protocol.
    """
    n_shards = mesh.shape[_AXIS]
    hB = h * block
    perm_fwd = [(i, i + 1) for i in range(n_shards - 1)]  # to right neighbor
    perm_bwd = [(i + 1, i) for i in range(n_shards - 1)]  # to left neighbor

    from flashdeconv_tpu.ops.bcd import gs_inv_den

    def local_solve(beta_loc, xty_t, xtx, masks_loc, nnb_loc,
                    lam, rho, tol, cap):
        n_local = beta_loc.shape[0]
        m = n_local // block
        # MEASURED trade (round 5, 1M x 20 on v5e): the split costs ~29%
        # of per-shard compute — XLA inserts a full-carry copy for the
        # aliased recompose (one aliased call: 1.74 vs 1.30 ms/sweep;
        # concat and dynamic-update-slice recomposes measured the same
        # or worse). Hiding t_halo (~8 us) therefore only nets out when
        # per-shard compute is tiny: 0.29 * t_comp < t_halo at
        # n_local <~ 16k spots (1.43 ms/sweep per 1M spots). "auto"
        # applies that rule; True/False force it (tests pin the split
        # bitwise against the unsplit sweep).
        if overlap == "auto":
            split = n_local <= 16384 and m >= 2 * h + 1
        else:
            split = bool(overlap) and m >= 2 * h + 1
        # Sweep-invariant reciprocal denominator, once per solve per shard
        # (ops/bcd.gs_inv_den — identical values to the single-device
        # solve's, so the mesh path stays bitwise-identical to it).
        inv_den_t = gs_inv_den(xtx, nnb_loc, lam)

        def run(ext_for, sub, alias=None):
            return fused_banded_sweep(
                ext_for, xty_t, xtx, masks_loc, inv_den_t, lam, rho,
                offsets, h, block=block, sub=sub, out_alias=alias,
                interpret=interpret,
            )

        def sweep_unsplit(ext):
            # Halo refresh: my first/last h data blocks -> neighbors' pads.
            first = jax.lax.slice_in_dim(ext, hB, 2 * hB, axis=1)
            last = jax.lax.slice_in_dim(ext, n_local, n_local + hB, axis=1)
            from_left = jax.lax.ppermute(last, _AXIS, perm_fwd)
            from_right = jax.lax.ppermute(first, _AXIS, perm_bwd)
            ext_in = jax.lax.dynamic_update_slice(ext, from_left, (0, 0))
            ext_in = jax.lax.dynamic_update_slice(
                ext_in, from_right, (0, hB + n_local)
            )
            out, diff, mabs = run(ext_in, None)
            return (
                out,
                jax.lax.pmax(diff, _AXIS),
                jax.lax.pmax(mabs, _AXIS),
            )

        def sweep_split(state):
            # Ping-pong buffers: read ext, write every data block of
            # scratch in place through three aliased sub-calls, then
            # swap. Neither buffer's PADS are ever written (they stay
            # exactly zero from init — halo data reaches the boundary
            # calls through small assembled side carries, never through
            # the 84 MB resident buffers, whose dynamic-update-slice
            # measured as a full copy).
            ext, scratch = state
            first = jax.lax.slice_in_dim(ext, hB, 2 * hB, axis=1)
            last = jax.lax.slice_in_dim(ext, n_local, n_local + hB, axis=1)
            from_left = jax.lax.ppermute(last, _AXIS, perm_fwd)
            from_right = jax.lax.ppermute(first, _AXIS, perm_bwd)
            # Interior first — no data dependency on the in-flight
            # ppermutes, so the transfer hides underneath it.
            nxt, d_i, a_i = run(ext, (h, h, m - 2 * h), alias=scratch)
            # Boundary windows: (K, 3hB) assembled [halo | edge data]
            # carries (~MBs — the copies are negligible at any scale).
            left_in = jnp.concatenate(
                [from_left,
                 jax.lax.slice_in_dim(ext, hB, 3 * hB, axis=1)], axis=1,
            )
            right_in = jnp.concatenate(
                [jax.lax.slice_in_dim(
                    ext, hB + n_local - 2 * hB, hB + n_local, axis=1),
                 from_right], axis=1,
            )
            nxt, d_l, a_l = run(left_in, (0, 0, h), alias=nxt)
            nxt, d_r, a_r = run(right_in, (0, m - h, h), alias=nxt)
            diff = jnp.maximum(jnp.maximum(d_l, d_i), d_r)
            mabs = jnp.maximum(jnp.maximum(a_l, a_i), a_r)
            return (
                (nxt, ext),
                jax.lax.pmax(diff, _AXIS),
                jax.lax.pmax(mabs, _AXIS),
            )

        ext0 = jnp.pad(beta_loc.T, ((0, 0), (hB, hB)))
        if split:
            state, n_iter, rel = converge_loop(
                sweep_split, (ext0, jnp.zeros_like(ext0)), tol, max_iter,
                iter_cap=cap,
            )
            ext = state[0]
        else:
            ext, n_iter, rel = converge_loop(
                sweep_unsplit, ext0, tol, max_iter, iter_cap=cap
            )
        beta_out = jax.lax.slice_in_dim(ext, hB, hB + n_local, axis=1).T
        return beta_out, n_iter, rel

    return jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(
            P(_AXIS, None),   # beta (n_pad, K) row-sharded
            P(None, _AXIS),   # Xty_t (K, n_pad)
            P(),              # XtX
            P(None, _AXIS),   # masks (U, n_pad) uint8
            P(_AXIS),         # degree (n_pad,)
            P(), P(), P(), P(),
        ),
        out_specs=(P(_AXIS, None), P(), P()),
        check_vma=False,  # pallas_call out_shape carries no vma info
    )(beta0, Xty_t, XtX, masks, nnb, lam, rho, tol, iter_cap)


class GspmdBandedProblem:
    """Prepared GSPMD banded problem: banded analysis, host precompute
    (XtX / YtY / Xty), and the device scatter of every beta-independent
    operand run ONCE in the constructor; each :meth:`solve` call reuses the
    resident sharded arrays and pays only the per-solve scalars (lambda,
    rho, tol) plus the fused device loop. The mesh-path analog of
    :class:`flashdeconv_tpu.core.solver.BCDProblem`.

    ``xty`` / ``yty`` optionally supply ``Y_sketch @ X_sketch.T`` and the
    Frobenius constant precomputed elsewhere (e.g. the pipeline's fused
    sketch kernel, ``native.fused_log1pcpm_xty``) — with both given,
    ``Y_sketch`` may be None and is never touched: the solver consumes the
    sketch only through these two reductions.

    Raises ``ValueError`` if the graph is not 100% banded within 32 offsets
    — callers should fall back to the halo plan in that case. ``_split``
    lets a dispatching caller pass its already-computed
    ``banded_split(A, 32)`` result to avoid a second O(nnz) pass.
    """

    def __init__(
        self,
        Y_sketch: Optional[np.ndarray],
        X_sketch: np.ndarray,
        A: sparse.spmatrix,
        mesh: Optional[Mesh] = None,
        dtype=np.float32,
        verbose: bool = False,
        _split=None,
        xty: Optional[np.ndarray] = None,
        yty: Optional[float] = None,
        fused_block: Optional[int] = None,
        fused_interpret: bool = False,
    ):
        from flashdeconv_tpu.utils.graph import banded_split

        if Y_sketch is None and (xty is None or yty is None):
            raise ValueError(
                "Y_sketch=None requires both xty and yty precomputed."
            )
        n_types = int(X_sketch.shape[0])
        if xty is not None and np.shape(xty) != (A.shape[0], n_types):
            raise ValueError(
                f"xty shape {np.shape(xty)} does not match the adjacency / "
                f"signature dimensions ({A.shape[0]}, {n_types})"
            )
        n_spots = int(
            Y_sketch.shape[0] if Y_sketch is not None else xty.shape[0]
        )
        self.n_spots, self.n_types = n_spots, n_types
        self.dtype = np.dtype(dtype)

        offsets_np, masks_np, A_rest = (
            _split if _split is not None else banded_split(A, max_offsets=32)
        )
        if A.nnz > 0 and (offsets_np.size == 0 or A_rest.nnz > 0):
            raise ValueError(
                "Graph is not fully banded; use sharded_bcd_solve instead "
                f"(rest edges: {A_rest.nnz})."
            )

        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (_AXIS,))
        self.mesh = mesh
        self.n_shards = mesh.devices.size

        # Gate on the MESH devices' platform, not the process default
        # backend: under the axon plugin the default backend is "tpu" even
        # when the caller builds a CPU mesh (virtual-device dry runs).
        pallas_tier = (
            mesh.devices.flat[0].platform == "tpu"
            and self.dtype == np.float32
        )
        self.use_pallas = pallas_tier and n_types <= 128
        self.halo = int(np.max(np.abs(offsets_np))) if offsets_np.size else 0

        # Fully fused banded mesh path: each shard runs ONE Pallas kernel
        # per sweep (ops/bcd.fused_banded_sweep) on a transposed local
        # carry whose side pads are refreshed by ppermute halo transfers.
        # Eligible when the Pallas tier is on (or forced for interpret
        # parity tests via fused_interpret=True, where fused_block shrinks
        # the block so tiny test problems stay fast); the block is chosen
        # by the same planner as the single-device path
        # (ops/bcd.plan_fused_banded) with one extra constraint: the
        # h*block halo must fit inside ONE neighbor shard (ppermute
        # reaches adjacent shards only). Planned independently of the
        # unfused CD kernel's K <= 128 envelope, so large-K grid problems
        # stay fused here too. The eligibility decision fixes the padding
        # block: a planned block only ever applies when the fused kernel
        # actually engages, so an unfused Pallas fallback always sees its
        # required 2048-aligned shards.
        from flashdeconv_tpu.ops.bcd import (
            FUSED_BLOCK_CANDIDATES_1D,
            FUSED_VMEM_BUDGET_BYTES,
            fused_banded_vmem_bytes,
        )

        use_fused = False
        block = 2048 if self.use_pallas else 8
        if pallas_tier or fused_interpret:
            # Same candidate list as the single-device planner (4096-led;
            # the block never changes the iterate, and the shard padding
            # below already follows the chosen block, so 4096 shards stay
            # 2048-aligned for the unfused fallback too).
            cands = (
                (int(fused_block),) if fused_block is not None
                else FUSED_BLOCK_CANDIDATES_1D
            )
            for cand in cands:
                h = -(-self.halo // cand) if self.halo else 0
                chunk_c = self.n_shards * cand
                n_local_c = (-(-n_spots // chunk_c) * chunk_c) \
                    // self.n_shards
                if (
                    1 <= h <= 8
                    and h * cand <= n_local_c
                    # alias=True: the halo-overlap split adds an aliased
                    # dummy input whenever the runtime auto-gate engages
                    # it; budget for it up front so a boundary config
                    # cannot blow VMEM only when overlap kicks in. (This
                    # path rejects rest edges entirely, so rest=False.)
                    and fused_banded_vmem_bytes(
                        n_types, int(offsets_np.size), h, cand, alias=True
                    ) <= FUSED_VMEM_BUDGET_BYTES
                ):
                    use_fused = True
                    block = cand
                    break
        self.use_fused = use_fused
        self._fused_h = -(-self.halo // block) if self.halo else 0
        self._fused_block = int(block)
        self._fused_interpret = bool(fused_interpret)

        chunk = self.n_shards * block
        n_pad = -(-n_spots // chunk) * chunk
        pad = n_pad - n_spots
        self.n_pad = n_pad

        from flashdeconv_tpu.core.solver import (
            precompute_gram_matrix,
            sanitize_xty_rows,
            sanitize_yty,
        )

        XtX = precompute_gram_matrix(np.asarray(X_sketch, np.float64))
        YtY = sanitize_yty(yty, Y_sketch)
        self.rho_scale = float(np.mean(np.diag(XtX)))

        if xty is not None:
            Xty = np.asarray(xty, dtype=dtype)
        else:
            Xty = np.asarray(Y_sketch @ X_sketch.T, dtype=dtype)
        # Host-side non-finite guard (BEFORE the pad/transpose so both
        # device layouts see identical rows); semantics in
        # core.solver.sanitize_xty_rows.
        Xty, self.n_nonfinite_spots = sanitize_xty_rows(Xty)
        # Binary degree (nnz per row), NOT edge-weight sums: the sweep
        # kernels treat every edge as weight 1 (reference CSR semantics).
        nnb = np.diff(A.tocsr().indptr).astype(dtype)
        if pad:
            Xty = np.concatenate(
                [Xty, np.zeros((pad, n_types), dtype=dtype)]
            )
            nnb = np.concatenate([nnb, np.zeros(pad, dtype=dtype)])
            masks_np = np.concatenate(
                [masks_np, np.zeros((masks_np.shape[0], pad), np.float32)],
                axis=1,
            )
        self.offsets = tuple(int(o) for o in offsets_np)

        self._shard = NamedSharding(mesh, P(_AXIS))
        shard_cols = NamedSharding(mesh, P(None, _AXIS))
        self._repl = NamedSharding(mesh, P())

        put = self._put
        self.Xty_d = put(Xty, self._shard)
        self.nnb_d = put(nnb, self._shard)
        if self.use_fused:
            # Kernel-layout copy (the row-layout original stays resident
            # for the objective evaluation, which is per-solve, not
            # per-sweep).
            self.Xty_t_d = put(np.ascontiguousarray(Xty.T), shard_cols)
        # 0/1 masks travel as uint8 (4x less host->device traffic). The
        # fused kernel consumes uint8 directly (widening in-VMEM — 4x
        # less HBM per sweep) and the banded objective auto-promotes, so
        # the fused path keeps only the uint8 copy; the unfused sweep
        # multiplies by the masks every offset pass, so it widens once
        # here (eager astype preserves the sharding; a fresh jax.jit
        # wrapper would remote-recompile on every ctor call).
        masks_u8_d = put(masks_np.astype(np.uint8), shard_cols)
        self.masks_d = masks_u8_d if self.use_fused else masks_u8_d.astype(
            dtype
        )
        self.XtX_d = put(XtX.astype(dtype), self._repl)
        self.YtY_d = put(np.asarray(YtY, dtype=dtype), self._repl)
        self.rest_d = put(np.zeros((n_pad, 0), dtype=np.int32), self._shard)
        # Default uniform init, built lazily on the first no-init solve and
        # then kept resident (the fused loop does not donate its inputs) —
        # warm-start-only workloads (fit_lambda_path after lambda 0) never
        # pay the (n_pad, K) device residency.
        self._beta0_uniform_d = None

        if verbose:
            kernel = "fused Pallas" if self.use_fused else (
                "Pallas CD" if self.use_pallas else "XLA"
            )
            print(
                f"GSPMD banded solve: {self.n_shards} shards x "
                f"{n_pad // self.n_shards} spots, {len(self.offsets)} bands, "
                f"halo {self.halo}, {kernel} sweep kernel"
            )

    def _put(self, arr, sharding):
        return put_addressable(arr, sharding)

    def _beta0_default(self):
        if self._beta0_uniform_d is None:
            beta0_np = np.zeros((self.n_pad, self.n_types), dtype=self.dtype)
            beta0_np[: self.n_spots] = 1.0 / self.n_types
            self._beta0_uniform_d = self._put(beta0_np, self._shard)
        return self._beta0_uniform_d

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
        """Run the fused solve on the resident operands; see module
        docstring for semantics and objective-precision notes.

        ``return_device=True`` returns beta as the sharded device array in
        the solve dtype (only the convergence/objective scalars cross the
        interconnect) instead of a gathered host float64 copy.
        """
        n_spots, n_types = self.n_spots, self.n_types
        dtype = self.dtype
        if max_iter == 0:
            beta = np.full((n_spots, n_types), 1.0 / max(n_types, 1))
            return beta, {
                "converged": False,
                "n_iterations": 0,
                "final_objective": 0.0,
                "objectives": [],
                "final_change": 0.0,
                "n_shards": self.n_shards,
                "n_bands": len(self.offsets),
                "halo_width": self.halo,
            }

        validate_beta_init(beta_init, n_spots, n_types)
        if beta_init is not None:
            beta0_np = np.zeros((self.n_pad, n_types), dtype=dtype)
            beta0_np[:n_spots] = np.maximum(beta_init, 0.0)
            beta0_d = self._put(beta0_np, self._shard)
        else:
            beta0_d = self._beta0_default()

        rho_eff = float(rho) * self.rho_scale
        lam_d = self._put(np.asarray(lambda_, dtype=dtype), self._repl)
        rho_d = self._put(np.asarray(rho_eff, dtype=dtype), self._repl)
        tol_d = self._put(np.asarray(tol, dtype=dtype), self._repl)

        if self.use_fused:
            def run_chunk(beta_d, cap):
                return _gspmd_iterate_fused(
                    beta_d, self.Xty_t_d, self.XtX_d, self.masks_d,
                    self.nnb_d, lam_d, rho_d, tol_d, cap, self.offsets,
                    self._fused_h, self._fused_block, max_iter, self.mesh,
                    interpret=self._fused_interpret,
                )
        else:
            def run_chunk(beta_d, cap):
                return _gspmd_iterate(
                    beta_d, self.Xty_d, self.XtX_d, self.masks_d, self.nnb_d,
                    lam_d, rho_d, tol_d, cap, self.offsets, self.halo,
                    max_iter, self.mesh, self.use_pallas,
                )

        def eval_objective(beta_d):
            # Global banded objective over spot-sharded operands; GSPMD
            # partitions the shifted slices and all-reduces the scalars.
            from flashdeconv_tpu.ops.bcd import objective_terms_banded

            return objective_terms_banded(
                beta_d, self.Xty_d, self.XtX_d, self.YtY_d, self.offsets,
                self.masks_d, self.rest_d, self.nnb_d, lam_d, rho_d,
                self.halo,
            )

        beta_pad, n_iter, rel_change, final_obj, converged, objectives = (
            run_prepared_solve(
                run_chunk, eval_objective, beta0_d, max_iter, tol, verbose,
                return_device=return_device,
            )
        )
        beta = beta_pad[:n_spots]

        info = {
            "converged": converged,
            "n_iterations": n_iter,
            "final_objective": final_obj,
            "objectives": objectives,
            "final_change": rel_change,
            "n_shards": self.n_shards,
            "n_bands": len(self.offsets),
            "halo_width": self.halo,
            "fused_kernel": self.use_fused,
        }
        return beta, info


def gspmd_banded_solve(
    Y_sketch: np.ndarray,
    X_sketch: np.ndarray,
    A: sparse.spmatrix,
    lambda_: float = 0.1,
    rho: float = 0.01,
    max_iter: int = 100,
    tol: float = 1e-4,
    mesh: Optional[Mesh] = None,
    verbose: bool = False,
    dtype=np.float32,
    beta_init: Optional[np.ndarray] = None,
    _split=None,
) -> Tuple[np.ndarray, dict]:
    """One-shot spot-sharded solve for a fully banded adjacency: construct
    a :class:`GspmdBandedProblem` and solve it (see module docstring).

    Raises ``ValueError`` if the graph is not 100% banded within 32 offsets —
    callers should fall back to :func:`~flashdeconv_tpu.parallel.solver.
    sharded_bcd_solve` (explicit halo plan) in that case.

    Objective precision: as in :func:`~flashdeconv_tpu.parallel.solver.
    sharded_bcd_solve`, the objective is evaluated on device in ``dtype``
    (YtY included) — f32 solves report with f32 quantization; use
    ``dtype=np.float64`` for exact-parity reporting.
    """
    n_spots = Y_sketch.shape[0]
    n_types = X_sketch.shape[0]

    if n_spots == 0 or n_types == 0 or max_iter == 0:
        beta = np.full((n_spots, n_types), 1.0 / max(n_types, 1))
        if n_spots == 0 or n_types == 0:
            beta = np.empty((n_spots, n_types))
        return beta, {
            "converged": n_spots == 0 or n_types == 0,
            "n_iterations": 0,
            "final_objective": 0.0,
            "objectives": [],
            "final_change": 0.0,
            "n_shards": 1 if mesh is None else mesh.devices.size,
            "n_bands": 0,
            "halo_width": 0,
        }

    problem = GspmdBandedProblem(
        Y_sketch, X_sketch, A, mesh=mesh, dtype=dtype, verbose=verbose,
        _split=_split,
    )
    return problem.solve(
        lambda_=lambda_, rho=rho, max_iter=max_iter, tol=tol,
        verbose=verbose, beta_init=beta_init,
    )
