"""Fully fused banded sweep kernel: interpret-mode parity on CPU.

The fused kernel (``ops/bcd.fused_banded_sweep``) merges the banded neighbor
sum, the Gauss-Seidel coordinate pass, and the convergence statistics into
one VMEM kernel over a transposed block-padded carry. Its iterate must match
the unfused banded path (:func:`bcd_iterate_banded` with XLA coordinate
descent) exactly — same sweep math, different memory schedule. These tests
pin that contract without TPU hardware via ``interpret=True``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flashdeconv_tpu.ops.bcd import (
    bcd_iterate_banded,
    bcd_iterate_banded_fused,
    from_fused_carry,
    fused_banded_sweep,
    gs_inv_den,
    objective_terms_banded,
    objective_terms_banded_fused,
    to_fused_carry,
)
from flashdeconv_tpu.utils.graph import banded_split, build_knn_graph, grid_coords

BLOCK = 256  # small block so interpret mode stays fast; 2048 in production


def _fused_problem(side=64, k=6, n_types=6, seed=0):
    """A fully banded problem: grid kNN graph restricted to its bands.

    Any edges banded_split leaves in the remainder are DROPPED from the test
    graph, so the banded decomposition covers the graph exactly — the fused
    kernel's eligibility condition (A_rest.nnz == 0 in BCDProblem).
    """
    coords = grid_coords(side=side)
    A = build_knn_graph(coords, k=k)
    n = A.shape[0]
    assert n % BLOCK == 0

    offsets, masks, _rest = banded_split(A, max_offsets=32, min_coverage=0.9)
    assert offsets.size > 0
    rows = np.concatenate([np.flatnonzero(masks[u]) for u in range(len(offsets))])
    nnb = np.bincount(rows, minlength=n).astype(np.float32)
    halo = int(np.max(np.abs(offsets)))
    h = -(-halo // BLOCK)

    rng = np.random.RandomState(seed)
    beta0 = jnp.asarray(np.abs(rng.randn(n, n_types)), jnp.float32)
    Xs = rng.randn(n_types, 64)
    XtX = jnp.asarray(Xs @ Xs.T, jnp.float32)
    Xty = jnp.asarray(np.abs(rng.randn(n, n_types)) * 5, jnp.float32)
    return {
        "beta0": beta0,
        "Xty": Xty,
        "XtX": XtX,
        "offsets": tuple(int(o) for o in offsets),
        "masks": jnp.asarray(masks, jnp.float32),
        "nnb": jnp.asarray(nnb),
        "halo": halo,
        "h": int(h),
        "rest": jnp.zeros((n, 0), dtype=jnp.int32),
    }


def _run_unfused(p, lam, rho, tol, max_iter):
    return bcd_iterate_banded(
        p["beta0"], p["Xty"], p["XtX"], p["offsets"], p["masks"], p["rest"],
        p["nnb"], jnp.float32(lam), jnp.float32(rho), jnp.float32(tol),
        max_iter, p["halo"], use_pallas=False,
    )


def _run_fused(p, lam, rho, tol, max_iter):
    carry0 = to_fused_carry(p["beta0"], p["h"], BLOCK)
    carry, n_iter, rel = bcd_iterate_banded_fused(
        carry0, p["Xty"].T, p["XtX"], p["masks"], p["nnb"],
        jnp.float32(lam), jnp.float32(rho), jnp.float32(tol), max_iter,
        p["offsets"], p["h"], block=BLOCK, interpret=True,
    )
    return from_fused_carry(carry, p["h"], BLOCK), n_iter, rel


@pytest.mark.parametrize("lam,rho", [(0.0, 0.0), (0.8, 0.3)])
def test_fused_sweep_matches_unfused_iterate(lam, rho):
    p = _fused_problem()
    beta_ref, it_ref, rel_ref = _run_unfused(p, lam, rho, 1e-30, 4)
    beta_out, it_out, rel_out = _run_fused(p, lam, rho, 1e-30, 4)
    assert int(it_out) == int(it_ref) == 4
    np.testing.assert_allclose(
        np.asarray(beta_out), np.asarray(beta_ref), atol=2e-5
    )
    np.testing.assert_allclose(float(rel_out), float(rel_ref), rtol=1e-4)


def test_fused_single_sweep_stats_match():
    """One fused sweep's (beta, max_diff, max_abs) vs the unfused sweep."""
    from flashdeconv_tpu.ops.bcd import bcd_sweep_banded

    p = _fused_problem(seed=3)
    ref_beta, ref_diff, ref_abs = bcd_sweep_banded(
        p["beta0"], p["Xty"], p["XtX"], p["offsets"], p["masks"], p["rest"],
        p["nnb"], jnp.float32(0.5), jnp.float32(0.1), p["halo"],
        use_pallas=False,
    )
    carry0 = to_fused_carry(p["beta0"], p["h"], BLOCK)
    inv = gs_inv_den(p["XtX"], p["nnb"], jnp.float32(0.5))
    carry, diff, mabs = fused_banded_sweep(
        carry0, p["Xty"].T, p["XtX"], p["masks"], inv,
        jnp.float32(0.5), jnp.float32(0.1), p["offsets"], p["h"],
        block=BLOCK, interpret=True,
    )
    out = from_fused_carry(carry, p["h"], BLOCK)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_beta),
                               atol=2e-5)
    np.testing.assert_allclose(float(diff), float(ref_diff), rtol=1e-4)
    np.testing.assert_allclose(float(mabs), float(ref_abs), rtol=1e-4)


def test_fused_pad_blocks_stay_zero():
    """The h zero-pad blocks on each side of the carry must stay exactly
    zero through a sweep (they feed the edge rows' neighbor windows)."""
    p = _fused_problem(seed=1)
    carry0 = to_fused_carry(p["beta0"], p["h"], BLOCK)
    inv = gs_inv_den(p["XtX"], p["nnb"], jnp.float32(1.0))
    carry, _, _ = fused_banded_sweep(
        carry0, p["Xty"].T, p["XtX"], p["masks"], inv,
        jnp.float32(1.0), jnp.float32(0.2), p["offsets"], p["h"],
        block=BLOCK, interpret=True,
    )
    pad = p["h"] * BLOCK
    assert np.all(np.asarray(carry[:, :pad]) == 0.0)
    assert np.all(np.asarray(carry[:, -pad:]) == 0.0)


def test_fused_uint8_masks_bit_identical():
    """uint8 masks (the production residency) must produce the exact same
    sweep as float32 masks — what is under test is the in-VMEM widening
    in the neighbor-sum FMAs. (The denominator no longer derives from the
    masks' column sum inside the kernel: since round 5 both calls consume
    the same precomputed gs_inv_den stream.)"""
    p = _fused_problem(seed=5)
    carry0 = to_fused_carry(p["beta0"], p["h"], BLOCK)
    kw = dict(block=BLOCK, interpret=True)
    args = (p["Xty"].T, p["XtX"])
    inv = gs_inv_den(p["XtX"], p["nnb"], jnp.float32(0.5))
    c_f32, d_f32, a_f32 = fused_banded_sweep(
        carry0, *args, p["masks"], inv, jnp.float32(0.5), jnp.float32(0.1),
        p["offsets"], p["h"], **kw,
    )
    masks_u8 = jnp.asarray(np.asarray(p["masks"]).astype(np.uint8))
    c_u8, d_u8, a_u8 = fused_banded_sweep(
        carry0, *args, masks_u8, inv, jnp.float32(0.5), jnp.float32(0.1),
        p["offsets"], p["h"], **kw,
    )
    np.testing.assert_array_equal(np.asarray(c_u8), np.asarray(c_f32))
    assert float(d_u8) == float(d_f32) and float(a_u8) == float(a_f32)


def test_fused_convergence_iteration_count():
    """Converging solve: same iteration count and final beta as unfused."""
    p = _fused_problem(seed=2)
    beta_ref, it_ref, _ = _run_unfused(p, 0.5, 0.05, 1e-3, 60)
    beta_out, it_out, _ = _run_fused(p, 0.5, 0.05, 1e-3, 60)
    assert int(it_ref) < 60  # actually converged
    assert int(it_out) == int(it_ref)
    np.testing.assert_allclose(
        np.asarray(beta_out), np.asarray(beta_ref), atol=2e-4
    )


def test_fused_objective_matches_banded():
    p = _fused_problem(seed=4)
    beta, _, _ = _run_unfused(p, 0.7, 0.1, 1e-30, 3)
    yty = jnp.float32(1e4)
    ref = objective_terms_banded(
        beta, p["Xty"], p["XtX"], yty, p["offsets"], p["masks"], p["rest"],
        p["nnb"], jnp.float32(0.7), jnp.float32(0.1 * 3.0), p["halo"],
    )
    carry = to_fused_carry(beta, p["h"], BLOCK)
    out = objective_terms_banded_fused(
        carry, p["Xty"].T, p["XtX"], yty, p["offsets"], p["masks"],
        jnp.float32(0.7), jnp.float32(0.1 * 3.0),
        p["h"], BLOCK,
    )
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


class TestFusedMeshPath:
    """The fused kernel under shard_map (GSPMD banded problem): per-shard
    Pallas sweep + ppermute halo blocks + pmax stats must reproduce the
    unfused GSPMD solve exactly (same sweeps, same beta)."""

    def _problem(self, side=96, k_types=6, d=48, seed=7):
        import jax

        coords = grid_coords(side=side)
        n = coords.shape[0]
        rng = np.random.RandomState(seed)
        X_sketch = rng.randn(k_types, d)
        Y_sketch = np.abs(rng.randn(n, k_types)) @ X_sketch \
            + 0.05 * rng.randn(n, d)
        A = build_knn_graph(coords, k=6)
        return Y_sketch, X_sketch, A

    def test_matches_unfused_mesh(self):
        import jax
        from jax.sharding import Mesh

        from flashdeconv_tpu.parallel.gspmd import GspmdBandedProblem

        Y, X, A = self._problem()
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("spots",))
        kw = dict(lambda_=0.3, rho=0.01, max_iter=40, tol=1e-5)

        pf = GspmdBandedProblem(
            Y, X, A, mesh=mesh, dtype=np.float32,
            fused_interpret=True, fused_block=BLOCK,
        )
        assert pf.use_fused and pf._fused_h == 1
        b_fused, i_fused = pf.solve(**kw)

        pu = GspmdBandedProblem(Y, X, A, mesh=mesh, dtype=np.float32)
        assert not pu.use_fused
        b_ref, i_ref = pu.solve(**kw)

        assert i_fused["n_iterations"] == i_ref["n_iterations"]
        np.testing.assert_allclose(b_fused, b_ref, atol=2e-5)
        np.testing.assert_allclose(
            i_fused["final_objective"], i_ref["final_objective"], rtol=1e-5
        )

    def test_overlap_split_bitwise_equals_unsplit(self):
        """The boundary/interior split (ppermute overlapped with interior
        compute) must recompose the unsplit sweep BITWISE: every data
        block sees the identical window and per-block math, Jacobi reads
        are pre-sweep by construction."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from flashdeconv_tpu.parallel.gspmd import _gspmd_iterate_fused
        from flashdeconv_tpu.utils.graph import banded_split

        Y, X, A = self._problem(side=64, seed=5)
        n, K = Y.shape[0], X.shape[0]
        offsets, masks, rest = banded_split(A, max_offsets=32)
        rows = np.concatenate(
            [np.flatnonzero(masks[u]) for u in range(len(offsets))]
        )
        nnb = np.bincount(rows, minlength=n).astype(np.float32)
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("spots",))
        block = BLOCK
        h = -(-int(np.max(np.abs(offsets))) // block)
        chunk = 4 * block
        n_pad = -(-n // chunk) * chunk
        pad = n_pad - n
        Xty = (Y @ X.T).astype(np.float32)
        Xty = np.concatenate([Xty, np.zeros((pad, K), np.float32)])
        masks_p = np.concatenate(
            [masks, np.zeros((masks.shape[0], pad), np.float32)], axis=1
        )
        nnb_p = np.concatenate([nnb, np.zeros(pad, np.float32)])
        XtX = (X @ X.T).astype(np.float32)
        beta0 = np.zeros((n_pad, K), np.float32)
        beta0[:n] = 1.0 / K

        shard = NamedSharding(mesh, P("spots"))
        cols = NamedSharding(mesh, P(None, "spots"))
        repl = NamedSharding(mesh, P())
        args = dict(
            beta0=jax.device_put(beta0, shard),
            Xty_t=jax.device_put(np.ascontiguousarray(Xty.T), cols),
            XtX=jax.device_put(XtX, repl),
            masks=jax.device_put(masks_p.astype(np.uint8), cols),
            nnb=jax.device_put(nnb_p, shard),
            lam=jax.device_put(np.float32(0.4), repl),
            rho=jax.device_put(np.float32(0.05), repl),
            tol=jax.device_put(np.float32(1e-30), repl),
            iter_cap=jax.device_put(np.int32(3), repl),
        )
        # The split engages only when each shard has >= 2h+1 blocks —
        # assert that holds, or the overlap=True arm silently degrades
        # to the unsplit sweep and this test passes vacuously.
        assert (n_pad // 4) // block >= 2 * h + 1, (n_pad, block, h)
        outs = {}
        for overlap in (False, True):
            beta, it, rel = _gspmd_iterate_fused(
                offsets=tuple(int(o) for o in offsets), h=h, block=block,
                max_iter=3, mesh=mesh, overlap=overlap, interpret=True,
                **args,
            )
            outs[overlap] = (np.asarray(beta), int(it), float(rel))
        np.testing.assert_array_equal(outs[True][0], outs[False][0])
        assert outs[True][1] == outs[False][1]
        assert outs[True][2] == outs[False][2]

    def test_shard_count_invariance(self):
        import jax
        from jax.sharding import Mesh

        from flashdeconv_tpu.parallel.gspmd import GspmdBandedProblem

        Y, X, A = self._problem(side=64, seed=3)
        kw = dict(lambda_=0.2, rho=0.01, max_iter=30, tol=1e-5)
        betas = []
        for s in (1, 8):
            mesh = Mesh(np.asarray(jax.devices()[:s]), ("spots",))
            p = GspmdBandedProblem(
                Y, X, A, mesh=mesh, dtype=np.float32,
                fused_interpret=True, fused_block=BLOCK,
            )
            assert p.use_fused
            beta, _ = p.solve(**kw)
            betas.append(beta)
        np.testing.assert_allclose(betas[1], betas[0], atol=2e-5)


def test_fused_holey_grid_matches_unfused():
    """Tissue-masked grid (random missing spots — the realistic Visium HD
    case): the banded masks carry the holes; the fused iterate must still
    match the unfused banded path exactly."""
    rng = np.random.RandomState(11)
    side = 72
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    coords_full = np.column_stack([xs.ravel(), ys.ravel()]).astype(float)
    keep = rng.rand(side * side) > 0.3          # drop ~30% of bins
    # pad the kept set to a BLOCK multiple by re-adding dropped spots
    n_keep = -(-int(keep.sum()) // BLOCK) * BLOCK
    dropped = np.flatnonzero(~keep)
    keep[dropped[: n_keep - keep.sum()]] = True
    coords = coords_full[keep]
    n = coords.shape[0]
    assert n % BLOCK == 0

    A = build_knn_graph(coords, k=6)
    offsets, masks, rest = banded_split(A, max_offsets=32, min_coverage=0.0)
    assert offsets.size > 0
    # keep only the banded part (fused eligibility contract)
    rows = np.concatenate(
        [np.flatnonzero(masks[u]) for u in range(len(offsets))]
    )
    nnb = np.bincount(rows, minlength=n).astype(np.float32)
    halo = int(np.max(np.abs(offsets)))
    h = -(-halo // BLOCK)
    assert h <= 8

    k_types = 5
    beta0 = jnp.asarray(np.abs(rng.randn(n, k_types)), jnp.float32)
    Xs = rng.randn(k_types, 48)
    p = {
        "beta0": beta0,
        "Xty": jnp.asarray(np.abs(rng.randn(n, k_types)) * 4, jnp.float32),
        "XtX": jnp.asarray(Xs @ Xs.T, jnp.float32),
        "offsets": tuple(int(o) for o in offsets),
        "masks": jnp.asarray(masks, jnp.float32),
        "nnb": jnp.asarray(nnb),
        "halo": halo,
        "h": int(h),
        "rest": jnp.zeros((n, 0), dtype=jnp.int32),
    }
    beta_ref, it_ref, _ = _run_unfused(p, 0.6, 0.05, 1e-4, 50)
    beta_out, it_out, _ = _run_fused(p, 0.6, 0.05, 1e-4, 50)
    assert int(it_out) == int(it_ref)
    np.testing.assert_allclose(
        np.asarray(beta_out), np.asarray(beta_ref), atol=2e-5
    )


def _capped_problem(side=64, k=6, n_types=6, seed=0):
    """A grid kNN problem under the production band-cap: sparse
    boundary-artifact bands spilled into a real rest remainder."""
    from flashdeconv_tpu.utils.graph import (
        adjacency_to_padded,
        cap_sparse_bands,
    )

    coords = grid_coords(side=side)
    A = build_knn_graph(coords, k=k)
    n = A.shape[0]
    assert n % BLOCK == 0

    offsets, masks, A_rest = banded_split(A, max_offsets=32)
    offsets, masks, A_rest = cap_sparse_bands(
        offsets, masks, A_rest, int(A.nnz)
    )
    assert A_rest.nnz > 0, "cap must actually spill on a finite grid"
    rest_tbl, _ = adjacency_to_padded(A_rest)
    nnb = np.diff(A.tocsr().indptr).astype(np.float32)
    halo = int(np.max(np.abs(offsets)))
    h = -(-halo // BLOCK)

    rng = np.random.RandomState(seed)
    beta0 = jnp.asarray(np.abs(rng.randn(n, n_types)), jnp.float32)
    Xs = rng.randn(n_types, 64)
    return {
        "beta0": beta0,
        "Xty": jnp.asarray(np.abs(rng.randn(n, n_types)) * 5, jnp.float32),
        "XtX": jnp.asarray(Xs @ Xs.T, jnp.float32),
        "offsets": tuple(int(o) for o in offsets),
        "masks": jnp.asarray(masks, jnp.float32),
        "nnb": jnp.asarray(nnb),
        "halo": halo,
        "h": int(h),
        "rest": jnp.asarray(rest_tbl),
        "rest_np": rest_tbl,
        "n": n,
    }


def test_capped_fused_matches_unfused_banded_plus_rest():
    """The band-cap + rest-stream fused iterate must reproduce the unfused
    banded+rest path (same decomposition, XLA coordinate descent) within
    f32 reassociation tolerance, with identical sweep counts — proving
    the compact per-sweep rest scatter computes exactly the padded-table
    gather's neighbor sums."""
    from flashdeconv_tpu.ops.bcd import build_fused_rest_tables

    p = _capped_problem(seed=7)
    lam, rho, tol, iters = 0.6, 0.08, 1e-30, 4

    beta_ref, it_ref, rel_ref = bcd_iterate_banded(
        p["beta0"], p["Xty"], p["XtX"], p["offsets"], p["masks"],
        p["rest"], p["nnb"], jnp.float32(lam), jnp.float32(rho),
        jnp.float32(tol), iters, p["halo"], use_pallas=False,
    )

    touched, slots = build_fused_rest_tables(
        p["rest_np"], p["n"], p["h"], BLOCK
    )
    assert touched is not None
    carry0 = to_fused_carry(p["beta0"], p["h"], BLOCK)
    carry, it_out, rel_out = bcd_iterate_banded_fused(
        carry0, p["Xty"].T, p["XtX"], p["masks"], p["nnb"],
        jnp.float32(lam), jnp.float32(rho), jnp.float32(tol), iters,
        p["offsets"], p["h"], block=BLOCK,
        rest_touched=jnp.asarray(touched),
        rest_slot_cols=jnp.asarray(slots), interpret=True,
    )
    beta_out = from_fused_carry(carry, p["h"], BLOCK)
    assert int(it_out) == int(it_ref) == iters
    np.testing.assert_allclose(
        np.asarray(beta_out), np.asarray(beta_ref), atol=2e-5
    )
    np.testing.assert_allclose(float(rel_out), float(rel_ref), rtol=1e-4)


def test_capped_fused_objective_matches_banded():
    """Fused objective with nnb + rest tables == unfused banded objective
    on the same capped decomposition."""
    from flashdeconv_tpu.ops.bcd import build_fused_rest_tables

    p = _capped_problem(seed=9)
    beta = p["beta0"]
    yty = jnp.float32(5e3)
    lam, rho = jnp.float32(0.7), jnp.float32(0.2)
    ref = objective_terms_banded(
        beta, p["Xty"], p["XtX"], yty, p["offsets"], p["masks"],
        p["rest"], p["nnb"], lam, rho, p["halo"],
    )
    touched, slots = build_fused_rest_tables(
        p["rest_np"], p["n"], p["h"], BLOCK
    )
    carry = to_fused_carry(beta, p["h"], BLOCK)
    out = objective_terms_banded_fused(
        carry, p["Xty"].T, p["XtX"], yty, p["offsets"], p["masks"],
        lam, rho, p["h"], BLOCK, nnb=p["nnb"],
        rest_touched=jnp.asarray(touched),
        rest_slot_cols=jnp.asarray(slots),
    )
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_bcd_problem_fused_with_native_rest(monkeypatch):
    """Eligibility extension: a banded-dominant graph with a SMALL native
    remainder (long-range edges banded_split cannot cover) must still take
    the fused path, with the compact rest tables built — previously any
    nonzero remainder forced the ~4x slower unfused banded tier. Gating
    only — the ctor never runs the kernel. (Band-CAPPING grids was
    measured slower and is intentionally not done; see the ctor note.)"""
    import jax
    from scipy import sparse as sp

    from flashdeconv_tpu.core import solver as core_solver

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    side = 96
    coords = grid_coords(side=side)
    A = build_knn_graph(coords, k=6)
    n = A.shape[0]
    rng = np.random.RandomState(0)
    # a handful of symmetric long-range edges -> native banded remainder
    src = rng.choice(n, 40, replace=False)
    dst = (src + rng.randint(5_000, 8_000, size=40)) % n
    extra = sp.coo_matrix(
        (np.ones(80), (np.r_[src, dst], np.r_[dst, src])), shape=(n, n)
    )
    A = ((A + extra.tocsr()) > 0).astype(np.float64)

    K, d = 12, 32
    prob = core_solver.BCDProblem(
        rng.randn(n, d), rng.randn(K, d), A, dtype=np.float32,
        coords=coords,
    )
    assert prob.use_banded and prob.use_fused_banded
    assert prob.rest_touched_d is not None
    assert prob.rest_slots_d is not None
    # degree vector stays resident for the per-solve inv_den
    assert prob.nnb_d is not None


def test_bcd_problem_fused_plan_rescue(monkeypatch):
    """A few random long-range edges make banded_split absorb
    near-singleton offsets as bands, inflating the halo past any
    plannable h (halo ~ N!). BCDProblem must rescue by spilling
    pathological bands into the rest-stream and re-planning — not fall
    to the ~4x slower unfused tier. Gating only."""
    import jax
    from scipy import sparse as sp

    from flashdeconv_tpu.core import solver as core_solver

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    side = 512                            # big enough that the junk
    coords = grid_coords(side=side)
    A = build_knn_graph(coords, k=6)
    n = A.shape[0]
    rng = np.random.RandomState(1)
    src = rng.choice(n // 2, 30, replace=False)
    dst = src + rng.randint(60_000, 120_000, size=30)  # h > 8 at any block
    extra = sp.coo_matrix(
        (np.ones(60), (np.r_[src, dst], np.r_[dst, src])), shape=(n, n)
    )
    A = ((A + extra.tocsr()) > 0).astype(np.float64)

    # the junk offsets are un-plannable directly: h = ceil(60k/4096) > 8
    from flashdeconv_tpu.ops.bcd import (
        FUSED_BLOCK_CANDIDATES_1D,
        plan_fused_banded,
    )

    assert plan_fused_banded(
        12, 32, 60_000, candidates=FUSED_BLOCK_CANDIDATES_1D
    ) is None

    K, d = 12, 32
    prob = core_solver.BCDProblem(
        rng.randn(n, d), rng.randn(K, d), A, dtype=np.float32,
        coords=coords,
    )
    assert prob.use_banded
    assert prob.use_fused_banded          # the rescue re-planned
    assert prob.halo < 4096               # pathological offsets spilled
    assert prob.rest_touched_d is not None


def test_carry_roundtrip():
    rng = np.random.RandomState(0)
    beta = jnp.asarray(rng.randn(4 * BLOCK, 9), jnp.float32)
    carry = to_fused_carry(beta, 2, BLOCK)
    assert carry.shape == (9, 4 * BLOCK + 4 * BLOCK)
    back = from_fused_carry(carry, 2, BLOCK)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(beta))


def test_vmem_gate_calibration_bounds():
    """The eligibility gate must accept every production shape and reject
    the configs Mosaic is MEASURED to refuse (see the calibration table at
    FUSED_VMEM_BUDGET_BYTES): a gate drift in either direction silently
    changes which datasets take the fused kernel."""
    from flashdeconv_tpu.ops.bcd import (
        FUSED_VMEM_BUDGET_BYTES,
        fused_banded_vmem_bytes,
    )

    # configs COMPILED+RUN on hardware (2026-08-20, round-5 kernel):
    # production shapes plus the measured-pass boundary points
    for K, U, h, block in [(20, 16, 1, 2048), (25, 16, 1, 2048),
                           (25, 16, 2, 2048), (64, 16, 2, 2048),
                           (128, 16, 2, 1024), (256, 16, 8, 256),
                           (200, 16, 2, 512)]:
        assert fused_banded_vmem_bytes(K, U, h, block) \
            <= FUSED_VMEM_BUDGET_BYTES, (K, U, h, block)
    # measured Mosaic rejections (HTTP-500 remote compiles / scoped-size
    # failures) — the boundary case (160,1,1024) plus the round-3 set
    for K, U, h, block in [(160, 16, 1, 1024), (128, 16, 1, 2048),
                           (128, 16, 2, 2048), (96, 16, 4, 2048),
                           (20, 16, 1, 8192), (20, 16, 1, 16384)]:
        assert fused_banded_vmem_bytes(K, U, h, block) \
            > FUSED_VMEM_BUDGET_BYTES, (K, U, h, block)


def test_vmem_gate_accounts_rest_and_alias_streams():
    """The rest-edge stream and the overlap alias each add a double-buffered
    (K, block) VMEM input; the estimate (and hence the planner) must charge
    for them, or a config planned at the gate boundary exceeds the
    hardware-calibrated Mosaic limit exactly when those inputs engage."""
    from flashdeconv_tpu.ops.bcd import (
        FUSED_VMEM_BUDGET_BYTES,
        fused_banded_vmem_bytes,
        plan_fused_banded,
    )

    K, U, h, block = 64, 16, 2, 2048
    kb = (-(-K // 8) * 8) * block * 4
    base = fused_banded_vmem_bytes(K, U, h, block)
    assert fused_banded_vmem_bytes(K, U, h, block, rest=True) == base + 2 * kb
    assert fused_banded_vmem_bytes(
        K, U, h, block, alias=True
    ) == base + 2 * kb
    # (64, 16, h=2, 2048) is the measured PASS boundary bare; with the rest
    # stream it must be rejected, so the planner drops to the next block
    assert base <= FUSED_VMEM_BUDGET_BYTES
    assert fused_banded_vmem_bytes(K, U, h, block, rest=True) \
        > FUSED_VMEM_BUDGET_BYTES
    bare = plan_fused_banded(K, U, 2 * 2048)
    with_rest = plan_fused_banded(K, U, 2 * 2048, rest=True)
    assert bare == (2048, 2)
    assert with_rest is not None and with_rest[0] < 2048


def test_fused_solve_program_matches_decomposed():
    """ops/bcd.fused_solve_program (the one-dispatch solve) must reproduce
    the decomposed to_carry -> converge loop -> objective -> from_carry
    sequence bitwise, build the default uniform init on device, un-pad to
    n_spots, and apply the inverse permutation — for both init arms."""
    from flashdeconv_tpu.ops.bcd import fused_solve_program

    p = _fused_problem(seed=5)
    n, K = p["beta0"].shape
    n_spots = n - 7          # emulate spot-axis padding
    lam, rho = jnp.float32(0.5), jnp.float32(0.1)
    tol, yty = jnp.float32(1e-30), jnp.float32(37.5)
    cap = jnp.asarray(3, jnp.int32)
    rng = np.random.RandomState(11)
    perm = rng.permutation(n_spots)
    inv = np.empty(n_spots, dtype=np.int32)
    inv[perm] = np.arange(n_spots, dtype=np.int32)
    inv_d = jnp.asarray(inv)

    # decomposed reference, default uniform init over the first n_spots
    beta0 = jnp.zeros((n, K), jnp.float32).at[:n_spots].set(1.0 / K)
    carry0 = to_fused_carry(beta0, p["h"], BLOCK)
    carry, it_ref, rel_ref = bcd_iterate_banded_fused(
        carry0, p["Xty"].T, p["XtX"], p["masks"], p["nnb"], lam, rho,
        tol, 3,
        p["offsets"], p["h"], block=BLOCK, iter_cap=cap, interpret=True,
    )
    obj_ref = objective_terms_banded_fused(
        carry, p["Xty"].T, p["XtX"], yty, p["offsets"], p["masks"],
        lam, rho, p["h"], BLOCK,
        # Match the program's call exactly (it always passes nnb=): the
        # default column-sum path happens to agree here only because this
        # fixture's nnb IS the masks' column sum — keep the comparison
        # structural, not coincidental.
        nnb=p["nnb"],
    )
    beta_solve = np.asarray(
        from_fused_carry(carry, p["h"], BLOCK)
    )[:n_spots]

    for init in (None, beta0):
        beta, it, rel, obj = fused_solve_program(
            init, jnp.asarray(np.ascontiguousarray(np.asarray(p["Xty"]).T)),
            p["XtX"], p["masks"], p["nnb"], yty, inv_d, lam, rho, tol, cap,
            offsets=p["offsets"], max_iter=3, h=p["h"], block=BLOCK,
            n_spots=n_spots, interpret=True,
        )
        assert beta.shape == (n_spots, K)
        assert int(it) == int(it_ref)
        # Convention check from the OTHER side: original row perm[p] must
        # hold solve-order row p (BCDProblem builds inv via
        # inv[perm] = arange and the program gathers with inv). Asserting
        # through `perm` — not the same `inv` gather the program itself
        # applies — catches a perm-vs-inv convention swap that a shared
        # self-referential gather would hide.
        np.testing.assert_array_equal(np.asarray(beta)[perm], beta_solve)
        np.testing.assert_array_equal(float(rel), float(rel_ref))
        np.testing.assert_array_equal(float(obj), float(obj_ref))


# ---- round 4: large-K tier (MXU-panel pass + adaptive block planning) ----


def test_panel_pass_matches_classic_pass():
    """The MXU-panel Gauss-Seidel pass must produce the classic pass's
    iterate (same per-coordinate algebra; f32 sums reassociated across
    panels only) — at both dispatch widths (8 small-K, 16 large-K)."""
    from flashdeconv_tpu.ops.bcd import _gs_pass_kb, _gs_pass_kb_panel

    rng = np.random.RandomState(0)
    for K in (8, 20, 70, 96, 160):
        B = 256
        Xs = rng.randn(K, 2 * K)
        xtx = jnp.asarray(Xs @ Xs.T, jnp.float32)
        beta_old = jnp.asarray(np.abs(rng.randn(K, B)), jnp.float32)
        xty = jnp.asarray(np.abs(rng.randn(K, B)) * 5, jnp.float32)
        ns = jnp.asarray(np.abs(rng.randn(K, B)), jnp.float32)
        nnb = jnp.asarray(
            rng.randint(0, 7, size=(1, B)).astype(np.float32)
        )
        lam, rho = jnp.float32(0.7), jnp.float32(0.15)
        inv = gs_inv_den(xtx, nnb, lam)
        ref = _gs_pass_kb(beta_old, xty, xtx, ns, inv, lam, rho)
        for panel in (8, 16):
            out = _gs_pass_kb_panel(
                beta_old, xty, xtx, ns, inv, lam, rho, panel=panel
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4,
            )


def test_gs_pass_dispatch_threshold():
    """gs_pass must be the classic pass at K <= 8 (where the panel pass is
    the identical computation anyway), the panel-8 pass through K = 64,
    and the panel-16 pass above — both Pallas kernels share this
    dispatch, so each arm is pinned bitwise."""
    from flashdeconv_tpu.ops.bcd import (
        _gs_panel_width,
        _gs_pass_kb,
        _gs_pass_kb_panel,
        gs_pass,
    )

    assert _gs_panel_width(8) is None
    assert _gs_panel_width(9) == 8
    assert _gs_panel_width(64) == 8
    assert _gs_panel_width(65) == 16
    rng = np.random.RandomState(1)
    for K, panel in ((8, None), (20, 8), (64, 8), (65, 16)):
        B = 128
        Xs = rng.randn(K, K + 8)
        xtx = jnp.asarray(Xs @ Xs.T, jnp.float32)
        args = (
            jnp.asarray(np.abs(rng.randn(K, B)), jnp.float32),
            jnp.asarray(np.abs(rng.randn(K, B)), jnp.float32),
            xtx,
            jnp.asarray(np.abs(rng.randn(K, B)), jnp.float32),
            gs_inv_den(
                xtx, jnp.asarray(np.ones((1, B), np.float32) * 4),
                jnp.float32(0.3),
            ),
            jnp.float32(0.3),
            jnp.float32(0.05),
        )
        if panel is None:
            expected = _gs_pass_kb(*args)
        else:
            expected = _gs_pass_kb_panel(*args, panel=panel)
        np.testing.assert_array_equal(
            np.asarray(gs_pass(*args)), np.asarray(expected)
        )


def test_large_k_fused_matches_unfused_iterate():
    """K = 96 (panel-pass territory): the fused kernel's multi-sweep
    iterate must track the unfused banded XLA path (fori tier) within f32
    reassociation tolerance, with identical sweep counts."""
    p = _fused_problem(side=32, n_types=96, seed=9)
    beta_ref, it_ref, _ = _run_unfused(p, 0.4, 0.05, 1e-30, 3)
    beta_out, it_out, _ = _run_fused(p, 0.4, 0.05, 1e-30, 3)
    assert int(it_out) == int(it_ref) == 3
    np.testing.assert_allclose(
        np.asarray(beta_out), np.asarray(beta_ref), atol=5e-5
    )


def test_plan_fused_banded_blocks_single_device():
    """The single-device candidate list leads with 4096 (measured ~5%
    faster per sweep than 2048); the VMEM gate hands K > 32 back to the
    shared 2048-led tail (sublane padding rounds K up to the next
    multiple of 8, so K = 33 already budgets as 40). The 4096-block
    configs the gate admits were Mosaic-compile-verified on hardware
    (2026-08-20); the 32/33 boundary is pinned here so a gate-margin
    change cannot silently widen 4096 service into Mosaic-reject
    territory."""
    from flashdeconv_tpu.ops.bcd import (
        FUSED_BLOCK_CANDIDATES_1D,
        plan_fused_banded,
    )

    def f(K):
        return plan_fused_banded(
            K, 16, 2001, candidates=FUSED_BLOCK_CANDIDATES_1D
        )

    assert f(8) == (4096, 1)
    assert f(20) == (4096, 1)
    assert f(32) == (4096, 1)   # the hand-back boundary...
    assert f(33) == (2048, 1)   # ...K=33 pads to 40 sublanes: over budget
    assert f(40) == (2048, 1)
    assert f(44) == (2048, 1)
    assert f(64) == (2048, 1)
    assert f(96) == (1024, 2)
    assert f(160) == (512, 4)


def test_plan_fused_banded_blocks():
    """Pin the planner's block choices across the K range (1M-spot grid
    kNN shape: 16 bands, halo ~ 1001): shrinking blocks carry the fused
    kernel to K ~ 256; K = 512 correctly falls off to the XLA tier."""
    from flashdeconv_tpu.ops.bcd import plan_fused_banded

    halo, bands = 1001, 16
    assert plan_fused_banded(20, bands, halo) == (2048, 1)
    assert plan_fused_banded(64, bands, halo) == (2048, 1)
    assert plan_fused_banded(96, bands, halo) == (1024, 1)
    assert plan_fused_banded(128, bands, halo) == (1024, 1)
    assert plan_fused_banded(160, bands, halo) == (512, 2)
    assert plan_fused_banded(200, bands, halo) == (512, 2)
    assert plan_fused_banded(256, bands, halo) == (512, 2)
    assert plan_fused_banded(320, bands, halo) == (256, 4)
    assert plan_fused_banded(512, bands, halo) is None
    # mesh-path constraint: halo blocks must fit one neighbor shard
    assert plan_fused_banded(20, bands, halo, max_local=256) is None
    # giant halo: no admissible h
    assert plan_fused_banded(20, bands, 2048 * 9) is None


def test_bcd_problem_plans_large_k_fused(monkeypatch):
    """BCDProblem must engage the fused banded kernel at K = 160 on a grid
    (via the planned 512 block), independent of the unfused CD kernel's
    K <= 128 envelope. Gating only — the ctor never runs the kernel, so a
    faked 'tpu' backend is safe on CPU."""
    import jax

    from flashdeconv_tpu.core import solver as core_solver

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    side = 96  # 9216 spots >= the banded-analysis gate (8192)
    coords = grid_coords(side=side)
    A = build_knn_graph(coords, k=6)
    n = A.shape[0]
    rng = np.random.RandomState(0)
    K, d = 160, 32
    X_sketch = rng.randn(K, d)
    Y_sketch = rng.randn(n, d)

    prob = core_solver.BCDProblem(
        Y_sketch, X_sketch, A, dtype=np.float32, coords=coords
    )
    assert prob.use_banded
    assert prob.use_fused_banded
    assert not prob.use_pallas  # the unfused CD tier stays K <= 128
    assert prob.fused_block == 512
    assert prob.h_blocks == -(-prob.halo // 512)
    assert prob.n_solve % 2048 == 0
