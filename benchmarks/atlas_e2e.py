"""End-to-end atlas-scale benchmark: 1M-spot Stereo-seq-like full pipeline.

Times the FULL FlashDeconv pipeline (gene selection -> preprocess -> sketch
-> graph -> lambda -> solve) on a synthetic sparse count matrix shaped like a
binned Stereo-seq section: N = 1M spots x G = 20k genes at ~97% sparsity
(~600 nnz/spot). The reference's published figure for this scale is ~3 min
end-to-end on an M2 Max CPU (reference ``README.md:67``).

Values are synthetic (accuracy is exercised elsewhere); this benchmark is
about the O(nnz) host passes + the device solve at atlas scale.

Usage: python benchmarks/atlas_e2e.py [--spots 1000000] [--genes 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
from scipy import sparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_sparse_counts(n_spots: int, n_genes: int, nnz_per_spot: int, n_types: int, seed=0,
                       irregular: bool = False):
    """Random CSR counts with type-structured columns + coordinates.

    ``irregular=True`` draws uniform-random (dissociated / imaging-platform)
    coordinates instead of a grid — the kNN graph then has no banded
    structure in any row order, so the solver takes the padded-gather path
    (Morton/halo plan when sharded)."""
    from flashdeconv_tpu.utils.graph import grid_coords

    rng = np.random.default_rng(seed)

    # Type-dependent gene pools so gene selection has real structure to find.
    X = rng.gamma(2.0, 1.0, size=(n_types, n_genes)).astype(np.float32)
    X *= rng.random((n_types, n_genes)) < 0.3

    side = int(np.ceil(np.sqrt(n_spots)))
    if irregular:
        coords = rng.random((n_spots, 2)) * side
    else:
        coords = grid_coords(n_spots)

    # Dominant type varies smoothly over space (block pattern).
    block = max(side // 8, 1)
    dom = ((coords[:, 0] // block) + (coords[:, 1] // block)).astype(np.int64) % n_types

    nnz = n_spots * nnz_per_spot
    indptr = np.arange(0, nnz + 1, nnz_per_spot, dtype=np.int64)

    # Half the nnz from the dominant type's top genes, half uniform noise.
    # Generated in ROW CHUNKS straight into the preallocated index/data
    # buffers: the one-shot vectorized form materializes several (n_spots,
    # nnz_per_spot) int64 temporaries, which at 10M spots x 600 nnz is
    # >100 GB of transient allocations; chunked, the peak stays at the
    # final buffers plus ~1 GB. Chunking preserves the exact stream for a
    # given seed only per chunk size, so the chunk size is FIXED, not
    # memory-adaptive (cache params capture it implicitly via the seed).
    top = np.argsort(-X, axis=1)[:, : n_genes // 4]  # (K, G/4) heavy genes
    half = nnz_per_spot // 2
    # int64 indices iff scipy would upcast anyway (nnz > int32 range):
    # preallocating the final dtype avoids a whole-array astype copy.
    idx_dt = np.int64 if nnz > np.iinfo(np.int32).max else np.int32
    indices = np.empty(nnz, dtype=idx_dt)
    data = np.empty(nnz, dtype=np.float32)
    step = 1 << 20
    ind2d = indices.reshape(n_spots, nnz_per_spot)
    for s in range(0, n_spots, step):
        e = min(n_spots, s + step)
        idx_heavy = rng.integers(
            0, top.shape[1], size=(e - s, half), dtype=np.int32
        )
        ind2d[s:e, :half] = top[dom[s:e, None], idx_heavy]
        ind2d[s:e, half:] = rng.integers(
            0, n_genes, size=(e - s, nnz_per_spot - half), dtype=np.int32
        )
        lo, hi = s * nnz_per_spot, e * nnz_per_spot
        data[lo:hi] = rng.exponential(3.0, size=hi - lo).astype(np.float32)
        data[lo:hi] += 1.0

    Y = sparse.csr_matrix((data, indices, indptr), shape=(n_spots, n_genes))
    return Y, X.astype(np.float64), coords


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--spots", type=int, default=1_000_000)
    p.add_argument("--genes", type=int, default=20_000)
    p.add_argument("--nnz-per-spot", type=int, default=600)
    p.add_argument("--types", type=int, default=25)
    p.add_argument("--n-shards", type=int, default=None)
    p.add_argument("--spatial-method", type=str, default="knn",
                   choices=["knn", "grid", "radius"],
                   help="spatial graph method (grid = Visium HD bins: "
                   "auto-detected spacing, radius 1.5x spacing)")
    p.add_argument("--radius", type=float, default=None)
    p.add_argument("--irregular", action="store_true",
                   help="uniform-random coordinates (dissociated/imaging "
                        "platforms) — exercises the padded-gather solver "
                        "path instead of the banded grid fast path")
    p.add_argument("--preprocess", type=str, default="log_cpm",
                   choices=["log_cpm", "pearson", "raw"],
                   help="normalization mode; pearson/raw exercise the fused "
                        "subset->colscale->sketch sparse kernels")
    p.add_argument("--fetch-dtype", type=str, default=None,
                   choices=["float16", "bfloat16", "float32"],
                   help="device-side cast of the fetched proportions "
                        "(float16 halves the dominant e2e cost on a "
                        "remote-attached chip: the device->host payload)")
    p.add_argument("--outputs", type=str, default="proportions",
                   help="comma list of fit outputs to fetch eagerly "
                        "('proportions', 'dominant', or "
                        "'proportions,dominant'); 'dominant' alone fetches "
                        "only the uint8 argmax (~80x less wire payload), "
                        "leaving proportions device-resident")
    p.add_argument("--fits", type=int, default=1,
                   help="number of fits; the reported value is the best "
                        "(the first fit of a new shape pays a one-time XLA "
                        "compile that the persistent cache absorbs for "
                        "every later process)")
    p.add_argument("--cache", type=str, default=None,
                   help="directory path to cache the generated problem "
                        "(saves ~2 min of regeneration per run)")
    args = p.parse_args()

    from scipy import sparse
    from flashdeconv_tpu import FlashDeconv
    from flashdeconv_tpu.utils.hostmem import reserve_host_arena_async

    # Pre-fault the heap once: the pipeline's multi-GB numpy temporaries
    # (gene-subset CSR, normalized copy, N x d sketch) then recycle
    # already-faulted pages instead of paying the first-touch fault tax
    # per stage (two orders of magnitude on some virtualized hosts).
    # Faulting runs on a background thread — this VM commits fresh pages
    # at only ~0.33 GB/s, so a 16 GB arena is ~50 s of wall-clock hidden
    # behind problem generation/loading and the warm-up solve (which can
    # itself wait minutes for a scheduling slot on the shared chip); the
    # fit loop waits for it right before the timed region.
    t_arena = time.perf_counter()
    arena = reserve_host_arena_async(min(16.0, args.spots * 16e-6))

    # Cache as raw .npy files in a directory: np.load memory-maps them, so
    # a cached start costs milliseconds instead of a multi-GB zip copy.
    # A params.json sidecar records the generation parameters; a cache dir
    # generated under different flags is refused instead of silently loading
    # stale data (e.g. --irregular pointed at a grid-generated cache).
    t0 = time.perf_counter()
    names = ("data", "indices", "indptr", "X", "coords")
    gen_params = {
        "spots": args.spots, "genes": args.genes,
        "nnz_per_spot": args.nnz_per_spot, "types": args.types,
        "irregular": bool(args.irregular),
        # Bump whenever make_sparse_counts' RNG *stream* changes (v2:
        # chunked int32 draws) — same seed, different dataset, and the
        # flag-equality check alone cannot see that.
        "gen_version": 2,
    }
    cache_hit = args.cache and all(
        os.path.exists(os.path.join(args.cache, n + ".npy")) for n in names
    )
    if cache_hit:
        params_path = os.path.join(args.cache, "params.json")
        if os.path.exists(params_path):
            with open(params_path) as f:
                cached = json.load(f)
            if cached != gen_params:
                raise SystemExit(
                    f"cache {args.cache} was generated with {cached}, "
                    f"current flags need {gen_params}; use a different "
                    "--cache dir (or delete this one)"
                )
        else:
            # pre-sidecar cache: at least reject shape mismatches
            coords_chk = np.load(
                os.path.join(args.cache, "coords.npy"), mmap_mode="r"
            )
            indices_chk = np.load(
                os.path.join(args.cache, "indices.npy"), mmap_mode="r"
            )
            if coords_chk.shape[0] != args.spots or (
                indices_chk.size and int(indices_chk.max()) >= args.genes
            ):
                raise SystemExit(
                    f"cache {args.cache} does not match --spots/--genes "
                    "(no params.json sidecar); regenerate with a fresh dir"
                )
    if cache_hit:
        print(f"# loading cached problem from {args.cache}/...",
              file=sys.stderr)
        z = {n: np.load(os.path.join(args.cache, n + ".npy"), mmap_mode="r")
             for n in names}
        Y = sparse.csr_matrix(
            (z["data"], z["indices"], np.asarray(z["indptr"])),
            shape=(args.spots, args.genes),
        )
        X, coords = np.asarray(z["X"]), np.asarray(z["coords"])
        print(f"# loaded in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    else:
        print(f"# generating {args.spots} x {args.genes} sparse counts...",
              file=sys.stderr)
        Y, X, coords = make_sparse_counts(
            args.spots, args.genes, args.nnz_per_spot, args.types,
            irregular=args.irregular,
        )
        print(f"# generated in {time.perf_counter() - t0:.1f}s "
              f"({Y.nnz / 1e6:.0f}M nnz, "
              f"{1 - Y.nnz / (Y.shape[0] * Y.shape[1]):.1%} sparse)",
              file=sys.stderr)
        if args.cache:
            os.makedirs(args.cache, exist_ok=True)
            # Sidecar FIRST: a run killed mid-save then leaves either a
            # sidecar with missing .npy files (cache miss, regenerates)
            # or a truncated .npy (np.load raises loudly) — never a
            # complete-looking cache that only the weak pre-sidecar
            # shape check would (wrongly) accept.
            with open(os.path.join(args.cache, "params.json"), "w") as f:
                json.dump(gen_params, f)
            for n, arr in zip(names, (Y.data, Y.indices, Y.indptr, X, coords)):
                np.save(os.path.join(args.cache, n + ".npy"), arr)

    # Warm-up: on shared/remote-attached accelerators the process's FIRST
    # sizeable execution can wait minutes for a scheduling slot; absorb that
    # (plus residual compiles) outside the timed region with a small solve.
    print("# warm-up solve...", file=sys.stderr)
    t0 = time.perf_counter()
    from flashdeconv_tpu.core.solver import bcd_solve
    from flashdeconv_tpu.utils.graph import build_knn_graph, grid_coords

    rng = np.random.default_rng(1)
    wn = 20_000
    wc = np.column_stack([np.repeat(np.arange(200), 100),
                          np.tile(np.arange(100), 200)]).astype(float)
    wx = rng.standard_normal((args.types, 64)).astype(np.float32)
    wy = np.abs(rng.standard_normal((wn, args.types))).astype(np.float32) @ wx
    bcd_solve(wy, wx, build_knn_graph(wc, k=6), max_iter=10, coords=wc)
    print(f"# warm-up done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    if arena.wait():
        print(
            f"# host arena ready {time.perf_counter() - t_arena:.1f}s "
            f"after start; blocked {time.perf_counter() - t0:.1f}s (rest "
            "overlapped with generation + warm-up)",
            file=sys.stderr,
        )

    # verbose=False: the solve runs as ONE fused device call (the verbose
    # path syncs every 10 sweeps to log objectives, which on a
    # remote-attached chip costs more than the sweeps).
    totals, runs = [], []
    for i in range(max(args.fits, 1)):
        model = FlashDeconv(
            sketch_dim=512, lambda_spatial="auto", n_hvg=2000,
            n_markers_per_type=50, k_neighbors=6, random_state=0,
            spatial_method=args.spatial_method, radius=args.radius,
            preprocess=args.preprocess,
            n_shards=args.n_shards, verbose=False,
            fetch_dtype=args.fetch_dtype,
            outputs=tuple(s.strip() for s in args.outputs.split(",")),
        )
        t0 = time.perf_counter()
        model.fit(Y, X, coords)
        totals.append(time.perf_counter() - t0)
        runs.append((dict(model.timings_), dict(model.info_)))
        for name, secs in sorted(
            model.timings_.items(), key=lambda kv: -kv[1]
        ):
            print(f"#   {name:>15}: {secs:7.2f}s", file=sys.stderr)
        print(f"# end-to-end fit[{i}]: {totals[-1]:.1f}s "
              f"({args.spots / totals[-1]:.0f} spots/s)", file=sys.stderr)

    best = int(np.argmin(totals))
    total = totals[best]
    best_timings, best_info = runs[best]
    print(json.dumps({
        "metric": f"spots_per_sec_e2e_{args.spots}spots"
                  + ("_irregular" if args.irregular else "")
                  + ("" if args.preprocess == "log_cpm"
                     else f"_{args.preprocess}")
                  + ("" if args.fetch_dtype is None
                     else f"_fetch-{args.fetch_dtype}")
                  + ("" if args.outputs == "proportions"
                     else f"_out-{args.outputs.replace(',', '+')}"),
        "value": round(args.spots / total, 1),
        "unit": "spots/s",
        "vs_baseline": round((args.spots / total) / (1_000_000 / 180.0), 2),
        "stage_seconds": {k: round(v, 2) for k, v in best_timings.items()},
        "fit_seconds": [round(t, 2) for t in totals],
        "n_iterations": best_info["n_iterations"],
        "converged": best_info["converged"],
    }))


if __name__ == "__main__":
    main()
