"""Large-K fused-tier hardware probe: sweep time + solve rate across K.

Round-4 check for the large-K cliff (BENCH_r03: K = 160 fell to the XLA
fori tier at 324k spots/s while K = 20 ran at ~20M). The fused banded
kernel now engages past K = 80 via adaptive block planning
(``ops/bcd.plan_fused_banded``) and an MXU-panel Gauss-Seidel pass for
K > 64 (``ops/bcd._gs_pass_kb_panel``). This probe measures, per K:

* which tier engaged (fused block / h, or fallback),
* pipelined per-sweep kernel time (best-of-R x S sweeps — tunnel-RTT-free),
* full warm-solve wall time and spots/s.

The problem skips sketch generation: the solver consumes the sketch only
through ``xty``/``yty`` (prepare_bcd's precomputed-feed path), so the probe
feeds synthetic (N, K) operands directly — same device work, ~10x less host
time at 1M x 256.

Usage: python benchmarks/largek_probe.py [K ...]   (default: 96 128 160 256)
Env:   FLASHDECONV_PROBE_SPOTS (default 1,000,000)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_SPOTS = int(os.environ.get("FLASHDECONV_PROBE_SPOTS", 1_000_000))
SKETCH_DIM = 512


def main() -> None:
    import jax
    import jax.numpy as jnp

    from flashdeconv_tpu.core.solver import prepare_bcd
    from flashdeconv_tpu.utils.graph import build_knn_graph, grid_coords

    ks = [int(a) for a in sys.argv[1:]] or [96, 128, 160, 256]
    print(f"# backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    n = N_SPOTS
    coords = grid_coords(n)
    t0 = time.perf_counter()
    A = build_knn_graph(coords, k=6)
    print(f"# graph built in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    rows = []
    for K in ks:
        rng = np.random.default_rng(0)
        X_sketch = rng.standard_normal((K, SKETCH_DIM), dtype=np.float32)
        xty = np.abs(
            rng.standard_normal((n, K), dtype=np.float32)
        ) * 3.0
        yty = float(n * SKETCH_DIM)  # objective constant only

        t0 = time.perf_counter()
        problem = prepare_bcd(
            None, X_sketch, A, coords=coords, xty=xty, yty=yty
        )
        prep_s = time.perf_counter() - t0
        tier = (
            f"fused(block={problem.fused_block},h={problem.h_blocks})"
            if problem.use_fused_banded
            else ("banded+pallasCD" if problem.use_banded
                  and problem.use_pallas
                  else ("banded+XLA" if problem.use_banded else "gather"))
        )
        print(f"# K={K}: tier={tier} prepare {prep_s:.1f}s", file=sys.stderr)

        kwargs = dict(lambda_=0.1, rho=0.01, max_iter=100, tol=1e-4)
        t0 = time.perf_counter()
        beta_d, info = problem.solve(return_device=True, **kwargs)
        cold = time.perf_counter() - t0
        print(f"# K={K}: cold solve {cold:.2f}s "
              f"({info['n_iterations']} sweeps)", file=sys.stderr)

        warm = float("inf")
        for i in range(5):
            t0 = time.perf_counter()
            beta_d, info = problem.solve(return_device=True, **kwargs)
            warm = min(warm, time.perf_counter() - t0)
        # basic sanity on the device result (scalar fetches only)
        assert bool(info["converged"])
        assert float(jnp.min(beta_d)) >= 0.0

        sweep_ms = None
        if problem.use_fused_banded:
            from flashdeconv_tpu.utils.timing import (
                fori_difference_windows,
                fused_sweep_timer_for,
            )

            # On-device fori difference — the shared protocol home
            # (utils/timing.fused_sweep_timer_for wires the production
            # operands from the prepared problem; rationale in
            # docs/performance_guide.md "Measuring the sweep").
            timed_loop = fused_sweep_timer_for(
                problem, kwargs["lambda_"], kwargs["rho"]
            )
            windows = fori_difference_windows(
                timed_loop, n_short=3, n_long=13, windows=6
            )
            sweep_ms = round(min(windows) * 1e3, 3)

        row = {
            "K": K,
            "tier": tier,
            "warm_solve_seconds": round(warm, 3),
            "spots_per_sec": round(n / warm, 1),
            "n_iterations": info["n_iterations"],
            "sweep_ms": sweep_ms,
        }
        rows.append(row)
        print(f"# K={K}: warm {warm:.3f}s = {n / warm:,.0f} spots/s, "
              f"sweep {sweep_ms} ms", file=sys.stderr)
        del problem, beta_d, xty

    print(json.dumps({
        "metric": "largek_fused_tier_probe",
        "n_spots": n,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
