"""Ablation of the fused banded sweep: where do the per-sweep cycles go?

The fused kernel (``ops/bcd.fused_banded_sweep``) is VPU-instruction-issue
bound (docs/performance_guide.md roofline: ~22% of HBM peak at 1M x 20, vs
a 0.31 ms streaming floor). Static instruction counting has already
mispredicted once (the round-5 reciprocal hoist measured ~0 despite an
estimated ~30% cut), so this script measures the breakdown empirically:
each variant swaps one stage of the kernel for a stub and times the sweep
under the same on-device fori-difference protocol as ``bench.py`` (the only
protocol that cancels tunnel RTT / async-ack artifacts — see
docs/performance_guide.md "Measuring the sweep").

Variants (each line = per-sweep ms, best and median of windows):

- ``full``        — the production kernel (gs_pass dispatch).
- ``classic``     — force the non-panel ``_gs_pass_kb`` (K > 8 normally
                    dispatches to the MXU-panel pass).
- ``panel=P``     — force panel width P in ``_gs_pass_kb_panel``.
- ``gs_noop``     — Gauss-Seidel pass replaced by identity: window roll +
                    neighbor sum + stats + streaming only.
- ``gs_prologue`` — prologue (r0 matmul, C, inv_den) computed, coordinate
                    loop skipped: adds the hoisted full-(K, B) ops.
- ``gs_norefresh``— coordinate loop row ops kept, panel/rank-1 residual
                    refresh skipped (wrong math; isolates row-op cost).
- ``no_ns``       — offsets=(): banded neighbor-sum accumulation skipped
                    (masks still streamed + degree-summed; wrong math).

Timing-only variants compute the wrong iterate by design; nothing here
feeds correctness paths. Run on the real TPU (plain ``python``); CPU
interpret mode is meaningless for this question.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from flashdeconv_tpu.ops import bcd

N_SPOTS = int(os.environ.get("FLASHDECONV_BENCH_SPOTS", 1_000_000))
N_TYPES = int(os.environ.get("FLASHDECONV_BENCH_TYPES", 20))
K_NEIGHBORS = 6
N_SHORT, N_LONG = 5, 30
WINDOWS = int(os.environ.get("FLASHDECONV_ABLATION_WINDOWS", 8))


def build_operands(n_spots: int, n_types: int, seed: int = 0):
    """Banded operands with the bench grid's real band structure but
    fabricated values — the sweep touches Xty/XtX/masks/beta only through
    dense streams, so random values time identically to the real problem."""
    from flashdeconv_tpu.utils.graph import banded_split, build_knn_graph, grid_coords

    rng = np.random.default_rng(seed)
    coords = grid_coords(n_spots)
    A = build_knn_graph(coords, k=K_NEIGHBORS)
    offsets_np, masks_np, A_rest = banded_split(A, max_offsets=32)
    assert A_rest.nnz == 0, "bench grid must be fully banded"
    offsets = tuple(int(o) for o in offsets_np)
    halo = int(np.max(np.abs(offsets_np)))

    plan = bcd.plan_fused_banded(
        n_types, len(offsets), halo,
        candidates=bcd.FUSED_BLOCK_CANDIDATES_1D,
    )
    assert plan is not None
    block, h = plan

    n_pad = -(-n_spots // block) * block
    pad = n_pad - n_spots
    masks_np = np.concatenate(
        [masks_np, np.zeros((masks_np.shape[0], pad), np.float32)], axis=1
    )

    Xq = rng.standard_normal((n_types, 64)).astype(np.float32)
    XtX = (Xq @ Xq.T + n_types * np.eye(n_types)).astype(np.float32)
    Xty_t = rng.standard_normal((n_types, n_pad)).astype(np.float32)
    Xty_t[:, n_spots:] = 0.0
    beta0 = np.abs(rng.standard_normal((n_pad, n_types))).astype(np.float32)
    beta0[n_spots:] = 0.0

    nnb = masks_np.sum(axis=0).astype(np.float32)
    inv_den_t = np.asarray(
        bcd.gs_inv_den(jnp.asarray(XtX), jnp.asarray(nnb),
                       jnp.float32(0.1))
    )

    # Capped decomposition — the RESCUE path, not the production default
    # (production never caps on a fully banded grid; cap_sparse_bands
    # engages only when direct planning fails — see BCDProblem). Timed
    # here as the A/B that justified that decision. The rest stream adds
    # a (K, block) input the bare plan's VMEM accounting didn't charge:
    # verify the capped config still fits (rest=True) and drop the
    # variant when it doesn't, rather than dying in Mosaic.
    from flashdeconv_tpu.utils.graph import (
        adjacency_to_padded,
        cap_sparse_bands,
    )

    off_c, masks_c, rest_c = cap_sparse_bands(
        offsets_np, masks_np[:, :n_spots], A_rest, int(A.nnz)
    )
    masks_c = np.concatenate(
        [masks_c, np.zeros((masks_c.shape[0], pad), np.float32)], axis=1
    )
    capped_fits = bcd.fused_banded_vmem_bytes(
        n_types, int(off_c.size), h, block, rest=rest_c.nnz > 0
    ) <= bcd.FUSED_VMEM_BUDGET_BYTES
    if rest_c.nnz and capped_fits:
        rest_tbl, _ = adjacency_to_padded(rest_c)
        touched_np, slots_np = bcd.build_fused_rest_tables(
            rest_tbl, n_spots, h, block
        )
    else:
        touched_np = slots_np = None
        if not capped_fits:
            print("# capped variant exceeds the VMEM gate at this "
                  "(K, block): skipping its rest stream", file=sys.stderr)

    carry = np.zeros((n_types, n_pad + 2 * h * block), np.float32)
    carry[:, h * block : h * block + n_pad] = beta0.T
    return {
        "carry": jnp.asarray(carry),
        "Xty_t": jnp.asarray(Xty_t),
        "XtX": jnp.asarray(XtX),
        "masks": jnp.asarray(masks_np.astype(np.uint8)),
        "inv_den_t": jnp.asarray(inv_den_t),
        "offsets": offsets,
        "offsets_capped": tuple(int(o) for o in off_c),
        "masks_capped": jnp.asarray(masks_c.astype(np.uint8)),
        "rest_touched": (jnp.asarray(touched_np)
                         if touched_np is not None else None),
        "rest_slots": (jnp.asarray(slots_np)
                       if slots_np is not None else None),
        # False when the capped config (its rest stream charged) exceeds
        # the VMEM gate — timing it without the rest edges would measure
        # a DIFFERENT graph, so main() skips the variant instead.
        "capped_ok": bool(capped_fits or rest_c.nnz == 0),
        "h": h,
        "block": block,
    }


def make_timer(ops, offsets, h, block, capped=False):
    """Timed n-sweep loop for one variant via the shared protocol home
    (utils/timing.fused_sweep_timer — returns a FRESH jitted closure per
    call, so jit caching cannot alias two variants' traces and a swapped
    bcd.gs_pass is traced in)."""
    from flashdeconv_tpu.utils.timing import fused_sweep_timer

    masks = ops["masks_capped"] if capped else ops["masks"]
    touched = ops["rest_touched"] if capped else None
    slots = ops["rest_slots"] if capped else None
    return fused_sweep_timer(
        ops["carry"], ops["Xty_t"], ops["XtX"], masks, ops["inv_den_t"],
        jnp.float32(0.1), jnp.float32(0.05), offsets, h, block,
        rest_touched=touched, rest_slots=slots,
    )


def run_variant(tag, ops, gs_fn=None, offsets=None, capped=False):
    """Time one kernel variant; gs_fn temporarily replaces bcd.gs_pass
    (the kernels resolve it through the module global at trace time)."""
    if capped and offsets is None:
        offsets = ops["offsets_capped"]
    offs = ops["offsets"] if offsets is None else offsets
    saved = bcd.gs_pass
    if gs_fn is not None:
        bcd.gs_pass = gs_fn
    try:
        from flashdeconv_tpu.utils.timing import fori_difference_windows

        timed = make_timer(ops, offs, ops["h"], ops["block"], capped=capped)
        # compile/warm + windows all inside the gs_fn swap (tracing
        # happens on the first timed call)
        windows = fori_difference_windows(
            timed, n_short=N_SHORT, n_long=N_LONG, windows=WINDOWS
        )
    finally:
        bcd.gs_pass = saved
    best = min(windows) * 1e3
    med = float(np.median(windows)) * 1e3
    print(f"# {tag:<14s} {best:7.3f} ms best / {med:7.3f} ms median",
          file=sys.stderr, flush=True)
    return {"best_ms": round(best, 3), "median_ms": round(med, 3)}


def gs_noop(beta_old, xty, xtx, ns, inv_den, lam, rho):
    # Consume ns/inv_den so the band loop is not dead code.
    return beta_old + 1e-38 * (ns + inv_den)


def gs_prologue_only(beta_old, xty, xtx, ns, inv_den, lam, rho):
    C = bcd._gs_prologue(beta_old, xty, xtx, ns, lam, rho)
    return beta_old + 1e-38 * (C * inv_den)


def gs_norefresh(beta_old, xty, xtx, ns, inv_den, lam, rho):
    K = beta_old.shape[0]
    C = bcd._gs_prologue(beta_old, xty, xtx, ns, lam, rho)
    deltas = []
    for k in range(K):
        num = jnp.maximum(C[k : k + 1, :], 0.0)
        deltas.append(num * inv_den[k : k + 1, :] - beta_old[k : k + 1, :])
    return jnp.concatenate(deltas, axis=0) + beta_old


def main():
    backend = jax.default_backend()
    print(f"# backend={backend} devices={jax.devices()}", file=sys.stderr)
    print(f"# building {N_SPOTS}x{N_TYPES} banded operands...",
          file=sys.stderr)
    ops = build_operands(N_SPOTS, N_TYPES)
    print(f"# block={ops['block']} h={ops['h']} "
          f"bands={len(ops['offsets'])}", file=sys.stderr)

    results = {"block": ops["block"], "h": ops["h"],
               "n_bands": len(ops["offsets"]), "n_spots": N_SPOTS,
               "n_types": N_TYPES}
    results["full"] = run_variant("full", ops)
    if ops["capped_ok"]:
        results["full_capped"] = run_variant("full_capped", ops,
                                             capped=True)
    else:
        print("# full_capped skipped (rest stream exceeds the VMEM gate "
              "at this K/block)", file=sys.stderr)
    results["gs_noop"] = run_variant("gs_noop", ops, gs_fn=gs_noop)
    results["gs_prologue"] = run_variant("gs_prologue", ops,
                                         gs_fn=gs_prologue_only)
    results["gs_norefresh"] = run_variant("gs_norefresh", ops,
                                          gs_fn=gs_norefresh)
    results["no_ns"] = run_variant("no_ns", ops, gs_fn=gs_noop, offsets=())
    results["classic"] = run_variant(
        "classic", ops, gs_fn=bcd._gs_pass_kb
    )
    for p in (4, 8, 16, N_TYPES):
        results[f"panel{p}"] = run_variant(
            f"panel{p}", ops,
            gs_fn=partial(bcd._gs_pass_kb_panel, panel=p),
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
