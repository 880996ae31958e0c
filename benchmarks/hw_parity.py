"""Real-hardware kernel parity smoke test — the repeatable Mosaic check.

CI runs the Pallas kernels in interpret mode (tests/test_pallas.py,
tests/test_fused_banded.py); interpret mode cannot catch Mosaic *lowering*
or *compiled-behavior* regressions (layout bugs, VMEM misestimates,
relayout miscompiles). This script is the hardware-side counterpart: small
shapes, < 2 min warm, runs every kernel family ON THE REAL CHIP and checks
it against an independent path. One JSON line; nonzero exit on any
mismatch.

Checks (all at N = 262,144 grid spots, K = 20, kNN-6 — big enough for
multi-block grids and real band structure, small enough to stay quick):

1. fused banded Pallas solve  ==  unfused banded path (bitwise: both call
   the same _gs_pass_kb, so Mosaic must preserve it through two different
   memory schedules);
2. banded paths  ==  XLA gather coordinate_descent fallback (<= 1e-5 —
   the GS pass hoists f32 additions the XLA path associates differently);
3. GSPMD mesh executable (shard_map + fused kernel + ppermute halos,
   1-device mesh)  ==  single-device (bitwise);
4. Pallas CountSketch projection  ==  host scipy projection (<= 2e-5);
5. large-K tier (K = 96 — MXU-panel GS pass + planned 1024 block): fused
   == unfused banded Pallas CD (bitwise: both call the same gs_pass
   dispatch) and == the XLA fori tier (<= 1e-4 — the panel pass
   reassociates f32 sums across panels and runs cross-panel corrections
   on the MXU at precision=HIGHEST);
6. rest-stream (round 5): a banded-dominant graph with a small native
   remainder runs the fused kernel + compact rest scatter, bitwise ==
   the unfused banded+rest path;
7. GSPMD halo-overlap split (round 5): the interior/boundary sub-call
   decomposition with the aliased in-place recompose, Mosaic-COMPILED
   (CI pins it in interpret mode only), bitwise == the unsplit sweep.

Usage: python benchmarks/hw_parity.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_SIDE = 512  # 262,144 spots
K, D = 20, 256


def main() -> int:
    import jax
    import jax.numpy as jnp

    from flashdeconv_tpu.core.solver import prepare_bcd
    from flashdeconv_tpu.parallel.solver import prepare_sharded_bcd
    from flashdeconv_tpu.utils.graph import build_knn_graph, grid_coords

    backend = jax.default_backend()
    print(f"# backend={backend} devices={jax.devices()}", file=sys.stderr)
    if backend == "cpu":
        print("# CPU backend: this is the HARDWARE smoke test — the same "
              "checks run in CI via interpret mode", file=sys.stderr)

    rng = np.random.RandomState(0)
    coords = grid_coords(side=N_SIDE)
    n = coords.shape[0]
    A = build_knn_graph(coords, k=6)
    X_sketch = rng.randn(K, D).astype(np.float32)
    Y_sketch = (np.abs(rng.randn(n, K)).astype(np.float32) @ X_sketch
                + 0.05 * rng.randn(n, D).astype(np.float32))
    kwargs = dict(lambda_=0.3, rho=0.01, max_iter=40, tol=1e-5)
    t0 = time.perf_counter()
    results = {}

    # 1 + 2: fused vs unfused banded vs XLA gather
    p_fused = prepare_bcd(Y_sketch, X_sketch, A, coords=coords)
    use_fused = bool(p_fused.use_fused_banded)
    beta_f, info_f = p_fused.solve(return_device=True, **kwargs)

    # Force the unfused banded path by failing the fused VMEM gate during
    # prepare (flipping the flag post-ctor is invalid: the fused prepare
    # releases the row-layout operands the unfused sweep needs).
    import flashdeconv_tpu.ops.bcd as bcd_mod

    budget = bcd_mod.FUSED_VMEM_BUDGET_BYTES
    bcd_mod.FUSED_VMEM_BUDGET_BYTES = 0
    try:
        p_unfused = prepare_bcd(Y_sketch, X_sketch, A, coords=coords)
    finally:
        bcd_mod.FUSED_VMEM_BUDGET_BYTES = budget
    assert not p_unfused.use_fused_banded and p_unfused.use_banded
    beta_u, info_u = p_unfused.solve(return_device=True, **kwargs)

    # Scrambled spot order with NO coords: no banded structure in any row
    # order the solver can see -> the padded-gather XLA coordinate_descent
    # path (the same graph, so the solution must match after unscrambling).
    perm = rng.permutation(n)
    import scipy.sparse as sp

    Pm = sp.csr_matrix(
        (np.ones(n), (np.arange(n), perm)), shape=(n, n)
    )
    A_scram = (Pm @ A @ Pm.T).tocsr()  # scrambled row i == original perm[i]
    p_gather = prepare_bcd(Y_sketch[perm], X_sketch, A_scram)
    gather_is_banded = bool(p_gather.use_banded)
    beta_g_s, info_g = p_gather.solve(return_device=True, **kwargs)
    inv = np.empty(n, dtype=np.int32)
    inv[perm] = np.arange(n, dtype=np.int32)
    beta_g = jnp.take(beta_g_s, jnp.asarray(inv), axis=0)  # back to orig

    d_fu = float(jnp.max(jnp.abs(beta_f - beta_u)))
    d_fg = float(jnp.max(jnp.abs(beta_f - beta_g)))
    results["fused_vs_unfused_banded"] = {
        "fused_engaged": use_fused,
        "max_abs_diff": d_fu,
        "same_iterations": info_f["n_iterations"] == info_u["n_iterations"],
        "ok": use_fused and d_fu == 0.0
              and info_f["n_iterations"] == info_u["n_iterations"],
    }
    results["banded_vs_xla_gather"] = {
        "gather_path_engaged": not gather_is_banded,
        "max_abs_diff": d_fg,
        "iter_delta": abs(info_f["n_iterations"] - info_g["n_iterations"]),
        "ok": (not gather_is_banded) and d_fg < 1e-5
              and abs(info_f["n_iterations"] - info_g["n_iterations"]) <= 1,
    }

    # 3: GSPMD mesh executable on the real device(s)
    sp_prob = prepare_sharded_bcd(
        Y_sketch, X_sketch, A, coords=coords, strategy="banded"
    )
    beta_m, info_m = sp_prob.solve(return_device=True, **kwargs)
    d_m = float(jnp.max(jnp.abs(beta_m - beta_f)))
    results["gspmd_mesh_vs_single_device"] = {
        "fused_kernel": bool(info_m.get("fused_kernel")),
        "mesh_devices": info_m["n_shards"],
        "max_abs_diff": d_m,
        "ok": d_m == 0.0
              and info_m["n_iterations"] == info_f["n_iterations"],
    }

    # 4: Pallas CountSketch projection vs host scipy
    from flashdeconv_tpu.core.sketching import make_countsketch_op
    from flashdeconv_tpu.ops.countsketch import countsketch_project_pallas

    G = 4096
    dense = np.abs(rng.randn(2048, G)).astype(np.float32)
    op = make_countsketch_op(G, 256, random_state=0)
    dev = countsketch_project_pallas(
        jnp.asarray(dense), jnp.asarray(op.buckets), jnp.asarray(op.weights),
        op.sketch_dim,
    )
    host = dense @ op.to_csr()
    d_cs = float(np.max(np.abs(np.asarray(dev) - host)))
    scale = float(np.max(np.abs(host)))
    results["countsketch_pallas_vs_scipy"] = {
        "max_abs_diff": d_cs,
        "ok": d_cs <= 2e-5 * max(scale, 1.0),
    }

    # 5: large-K tier (panel GS pass), fused vs unfused Pallas vs XLA
    from flashdeconv_tpu.ops.bcd import bcd_iterate_banded

    K_big = 96
    Xb = rng.randn(K_big, D).astype(np.float32)
    xty_b = np.abs(rng.randn(n, K_big)).astype(np.float32) * 3.0
    kw_b = dict(lambda_=0.3, rho=0.01, max_iter=12, tol=1e-6)

    pb_fused = prepare_bcd(None, Xb, A, coords=coords, xty=xty_b,
                           yty=float(n * D))
    fused_big = bool(pb_fused.use_fused_banded)
    block_big = getattr(pb_fused, "fused_block", None)
    beta_bf, info_bf = pb_fused.solve(return_device=True, **kw_b)

    bcd_mod.FUSED_VMEM_BUDGET_BYTES = 0
    try:
        pb_unfused = prepare_bcd(None, Xb, A, coords=coords, xty=xty_b,
                                 yty=float(n * D))
    finally:
        bcd_mod.FUSED_VMEM_BUDGET_BYTES = budget
    assert pb_unfused.use_banded and pb_unfused.use_pallas
    beta_bu, info_bu = pb_unfused.solve(return_device=True, **kw_b)

    # XLA fori tier on the same operands (the K > 64 fallback path).
    beta0 = jnp.zeros((pb_unfused.n_solve, K_big), jnp.float32).at[:n].set(
        1.0 / K_big
    )
    beta_bx, it_bx, _ = bcd_iterate_banded(
        beta0, pb_unfused.Xty_d, pb_unfused.XtX_d, pb_unfused.offsets,
        pb_unfused.masks_d, pb_unfused.rest_d, pb_unfused.nnb_d,
        jnp.float32(kw_b["lambda_"]),
        jnp.float32(kw_b["rho"] * pb_unfused.mean_diag),
        jnp.float32(kw_b["tol"]), kw_b["max_iter"], pb_unfused.halo,
        use_pallas=False,
    )
    beta_bx = beta_bx[:n]

    d_bu = float(jnp.max(jnp.abs(beta_bf - beta_bu)))
    d_bx = float(jnp.max(jnp.abs(beta_bf - beta_bx)))
    results["largek_panel_pass"] = {
        "K": K_big,
        "fused_engaged": fused_big,
        "fused_block": block_big,
        "fused_vs_unfused_pallas_max_abs_diff": d_bu,
        "fused_vs_xla_max_abs_diff": d_bx,
        "same_iterations": info_bf["n_iterations"] == info_bu["n_iterations"]
                           == int(it_bx),
        "ok": fused_big and d_bu == 0.0 and d_bx < 1e-4
              and info_bf["n_iterations"] == info_bu["n_iterations"]
              == int(it_bx),
    }

    # 6: rest-stream eligibility extension (round 5): a banded-dominant
    # graph with a small native remainder must take the FUSED kernel
    # (compact per-sweep rest scatter) and be bitwise-identical to the
    # unfused banded+rest path on the chip — the interpret-mode parity
    # tests cannot catch Mosaic-lowering regressions in this form.
    from scipy import sparse as sp_sparse

    rng_r = np.random.RandomState(11)
    src_r = rng_r.choice(n, 60, replace=False)
    dst_r = (src_r + rng_r.randint(4000, 9000, size=60)) % n
    extra = sp_sparse.coo_matrix(
        (np.ones(120), (np.r_[src_r, dst_r], np.r_[dst_r, src_r])),
        shape=(n, n),
    )
    A_rest_graph = ((A + extra.tocsr()) > 0).astype(np.float64)
    xty_r = np.abs(rng.randn(n, K)).astype(np.float32) * 3.0
    kw_r = dict(lambda_=0.4, rho=0.01, max_iter=10, tol=1e-6)

    pr_fused = prepare_bcd(None, X_sketch, A_rest_graph, coords=coords,
                           xty=xty_r, yty=float(n * D))
    rest_fused = bool(pr_fused.use_fused_banded)
    rest_present = pr_fused.rest_touched_d is not None
    assert pr_fused.perm is None
    beta_rf, info_rf = pr_fused.solve(return_device=True, **kw_r)

    # Unfused Pallas banded+rest sweep on the SAME (rescued/capped)
    # decomposition — the bitwise partner of the fused kernel. (A second
    # prepare under a zeroed gate would re-plan WITHOUT the cap and solve
    # a differently-associated but equivalent problem, ~1e-9 apart.)
    xty_pad = np.zeros((pr_fused.n_solve, K), np.float32)
    xty_pad[:n] = xty_r
    beta0_r = jnp.zeros(
        (pr_fused.n_solve, K), jnp.float32
    ).at[:n].set(1.0 / K)
    beta_ru, it_ru, _ = bcd_iterate_banded(
        beta0_r, jnp.asarray(xty_pad), pr_fused.XtX_d, pr_fused.offsets,
        pr_fused.masks_d.astype(jnp.float32), pr_fused.rest_d,
        pr_fused.nnb_d, jnp.float32(kw_r["lambda_"]),
        jnp.float32(kw_r["rho"] * pr_fused.mean_diag),
        jnp.float32(kw_r["tol"]), kw_r["max_iter"], pr_fused.halo,
        use_pallas=True,
    )
    d_rest = float(jnp.max(jnp.abs(beta_rf - beta_ru[:n])))
    results["rest_stream_fused_vs_unfused"] = {
        "fused_engaged": rest_fused,
        "rest_tables_present": rest_present,
        "max_abs_diff": d_rest,
        "same_iterations": info_rf["n_iterations"] == int(it_ru),
        "ok": rest_fused and rest_present and d_rest == 0.0
              and info_rf["n_iterations"] == int(it_ru),
    }

    # 7: GSPMD halo-overlap split, Mosaic-compiled: forcing the
    # interior/boundary sub-calls (+ aliased recompose) must reproduce
    # the unsplit sweep bitwise ON CHIP, not just in interpret mode.
    from flashdeconv_tpu.parallel.gspmd import _gspmd_iterate_fused

    gp = sp_prob._inner
    assert getattr(gp, "use_fused", False)
    outs = {}
    for overlap in (False, True):
        b_o, it_o, _rel_o = _gspmd_iterate_fused(
            gp._beta0_default(), gp.Xty_t_d, gp.XtX_d, gp.masks_d,
            gp.nnb_d, jnp.float32(0.4), jnp.float32(0.05),
            jnp.float32(1e-30), jnp.int32(3),
            offsets=gp.offsets, h=gp._fused_h, block=gp._fused_block,
            max_iter=3, mesh=gp.mesh, overlap=overlap,
        )
        outs[overlap] = (np.asarray(b_o), int(it_o))
    d_ov = float(np.max(np.abs(outs[True][0] - outs[False][0])))
    results["overlap_split_compiled"] = {
        "max_abs_diff": d_ov,
        "same_iterations": outs[True][1] == outs[False][1],
        "ok": d_ov == 0.0 and outs[True][1] == outs[False][1],
    }

    ok = all(r["ok"] for r in results.values())
    print(json.dumps({
        "metric": "hw_kernel_parity",
        "backend": backend,
        "value": 1 if ok else 0,
        "unit": "all_checks_pass",
        "seconds": round(time.perf_counter() - t0, 1),
        "checks": results,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
