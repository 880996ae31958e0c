"""Multi-device sharding tests on a virtual 8-device CPU mesh.

The conftest forces ``--xla_force_host_platform_device_count=8`` so the full
mesh / shard_map / halo-exchange path runs exactly as on a real slice. The
key contract: the sharded solve is numerically equivalent to the
single-device solve at any shard count (identical iterate path).
"""

import numpy as np
import pytest
from scipy import sparse

import jax

from tests.conftest import make_synthetic

from flashdeconv_tpu.core.solver import bcd_solve
from flashdeconv_tpu.parallel import (
    default_mesh,
    halo_fraction,
    morton_order,
    plan_shards,
    sharded_bcd_solve,
)
from flashdeconv_tpu.utils.graph import build_knn_graph, grid_coords


def _problem(n_spots=600, n_types=7, d=64, seed=3):
    rng = np.random.RandomState(seed)
    side = int(np.ceil(np.sqrt(n_spots)))
    coords = grid_coords(n_spots)
    X_sketch = rng.randn(n_types, d)
    beta_true = np.abs(rng.randn(n_spots, n_types))
    Y_sketch = beta_true @ X_sketch + 0.05 * rng.randn(n_spots, d)
    A = build_knn_graph(coords, k=6)
    return Y_sketch, X_sketch, A, coords


class TestOrdering:
    def test_morton_is_permutation(self):
        rng = np.random.RandomState(0)
        coords = rng.rand(500, 2) * 100
        perm = morton_order(coords)
        assert sorted(perm.tolist()) == list(range(500))

    def test_morton_locality(self):
        # consecutive Morton positions should be spatially close on a grid
        coords = grid_coords(side=32)
        perm = morton_order(coords)
        ordered = coords[perm]
        jumps = np.linalg.norm(np.diff(ordered, axis=0), axis=1)
        assert np.median(jumps) <= 2.0

    def test_3d_coords(self):
        rng = np.random.RandomState(1)
        coords = rng.rand(200, 3)
        perm = morton_order(coords)
        assert sorted(perm.tolist()) == list(range(200))


class TestShardPlan:
    @pytest.mark.parametrize("n_shards", [1, 3, 8])
    def test_neighbor_sum_reconstruction(self, n_shards):
        """The remapped tables + simulated halo exchange reproduce A @ beta."""
        rng = np.random.RandomState(7)
        n, k_types = 350, 5
        coords = rng.rand(n, 2) * 30
        A = build_knn_graph(coords, k=5)
        plan = plan_shards(A, n_shards, coords=coords)

        beta = rng.randn(n, k_types)
        beta_pad = plan.scatter(beta)
        S, ssz, hw = plan.n_shards, plan.shard_size, plan.halo_width

        pools = []
        for s in range(S):
            bl = beta_pad[s * ssz : (s + 1) * ssz]
            bl_ext = np.vstack([bl, np.zeros((1, k_types))])
            pools.append(bl_ext[plan.send_idx[s * hw : (s + 1) * hw]])
        pool = np.vstack(pools)

        ns = np.zeros_like(beta_pad)
        for s in range(S):
            bl = beta_pad[s * ssz : (s + 1) * ssz]
            ext = np.vstack([bl, pool, np.zeros((1, k_types))])
            nbr = plan.nbr_idx[s * ssz : (s + 1) * ssz]
            ns[s * ssz : (s + 1) * ssz] = ext[nbr].sum(axis=1)

        expected = A @ beta
        np.testing.assert_allclose(plan.gather(ns), expected, atol=1e-12)

    def test_degrees_preserved(self):
        rng = np.random.RandomState(2)
        coords = rng.rand(100, 2)
        A = build_knn_graph(coords, k=4)
        plan = plan_shards(A, 4, coords=coords)
        deg = np.asarray(A.sum(axis=1)).ravel()
        np.testing.assert_array_equal(
            plan.gather(plan.n_nbrs.astype(np.int64)), deg.astype(np.int64)
        )

    def test_halo_small_on_grid(self):
        coords = grid_coords(side=40)
        A = build_knn_graph(coords, k=6)
        plan = plan_shards(A, 8, coords=coords)
        # locality ordering keeps boundary rows a small fraction of all rows
        assert halo_fraction(plan) < 0.35

    def test_single_shard_no_halo_refs(self):
        rng = np.random.RandomState(4)
        coords = rng.rand(64, 2)
        A = build_knn_graph(coords, k=3)
        plan = plan_shards(A, 1, coords=coords)
        assert (plan.send_idx >= plan.shard_size).all()  # nothing to send


@pytest.mark.parametrize("strategy", ["auto", "halo"])
@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_sharded_matches_single_device(n_shards, strategy):
    """Sharded and single-device solves agree to fp rounding (f64), for both
    the GSPMD-banded (auto on grids) and explicit halo-plan strategies."""
    Y_sketch, X_sketch, A, coords = _problem()
    kwargs = dict(lambda_=0.3, rho=0.01, max_iter=60, tol=1e-5)

    beta_ref, info_ref = bcd_solve(
        Y_sketch, X_sketch, A, dtype=np.float64, **kwargs
    )
    beta_sh, info_sh = sharded_bcd_solve(
        Y_sketch, X_sketch, A, coords=coords, n_shards=n_shards,
        dtype=np.float64, strategy=strategy, **kwargs,
    )

    assert info_sh["n_shards"] == n_shards
    assert abs(info_sh["n_iterations"] - info_ref["n_iterations"]) <= 1
    np.testing.assert_allclose(beta_sh, beta_ref, atol=1e-8)
    np.testing.assert_allclose(
        info_sh["final_objective"], info_ref["final_objective"], rtol=1e-8
    )


@pytest.mark.parametrize("strategy", ["auto", "halo"])
def test_sharded_nonnegative_and_converges(strategy):
    Y_sketch, X_sketch, A, coords = _problem(n_spots=333, seed=11)
    beta, info = sharded_bcd_solve(
        Y_sketch, X_sketch, A, coords=coords, n_shards=8,
        lambda_=0.5, rho=0.02, max_iter=100, tol=1e-4, strategy=strategy,
    )
    assert beta.shape == (333, 7)
    assert (beta >= 0).all()
    assert info["converged"]
    assert np.isfinite(info["final_objective"])


def test_sharded_end_to_end_accuracy():
    """Full pipeline with the sharded solver recovers ground truth."""
    Y, X, coords, props = make_synthetic(n_spots=400, n_genes=600, n_types=8)
    from flashdeconv_tpu.core.sketching import sketch_data
    from flashdeconv_tpu.core.deconv import preprocess_data
    from flashdeconv_tpu.core.spatial import auto_tune_lambda
    from flashdeconv_tpu.core.solver import normalize_proportions
    from flashdeconv_tpu.utils.genes import select_informative_genes

    gene_idx, lev = select_informative_genes(Y, X, n_hvg=400,
                                             n_markers_per_type=20)
    Yt, Xt = preprocess_data(Y[:, gene_idx], X[:, gene_idx], "log_cpm")
    Ys, Xs, _ = sketch_data(Yt, Xt, sketch_dim=256, leverage_scores=lev,
                            random_state=0)
    A = build_knn_graph(coords, k=6)
    lam = auto_tune_lambda(Ys, Xs, A)

    beta, info = sharded_bcd_solve(Ys, Xs, A, coords=coords, lambda_=lam,
                                   rho=0.01, n_shards=8)
    P = normalize_proportions(beta)
    corr = np.corrcoef(P.ravel(), props.ravel())[0, 1]
    assert corr > 0.5


def test_flashdeconv_n_shards_matches_single(synthetic_small):
    """FlashDeconv(n_shards=8) produces the same proportions as n_shards=1."""
    from flashdeconv_tpu import FlashDeconv

    Y, X, coords, _ = synthetic_small
    kwargs = dict(sketch_dim=128, n_hvg=300, n_markers_per_type=10,
                  random_state=0, solver_dtype=np.float64)
    P1 = FlashDeconv(**kwargs).fit_transform(Y, X, coords)
    P8 = FlashDeconv(n_shards=8, **kwargs).fit_transform(Y, X, coords)
    np.testing.assert_allclose(P8, P1, atol=1e-8)


def test_default_mesh():
    mesh = default_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh4 = default_mesh(4)
    assert mesh4.devices.size == 4


class TestMultihost:
    def test_global_spot_mesh(self):
        from flashdeconv_tpu.parallel import multihost

        mesh = multihost.global_spot_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("spots",)

    def test_host_spot_range_single_process(self):
        from flashdeconv_tpu.parallel import multihost

        rng = np.random.RandomState(0)
        coords = rng.rand(1000, 2) * 40
        A = build_knn_graph(coords, k=4)
        n_shards = len(jax.devices())
        plan = plan_shards(A, n_shards, coords=coords)
        start, stop = multihost.host_spot_range(plan)
        # single process owns every shard (plan-aligned sizes)
        assert (start, stop) == (0, plan.n_padded)

        padded = plan_shards(A, n_shards, coords=coords, pad_shard_to=2048)
        start, stop = multihost.host_spot_range(padded)
        assert stop == padded.n_padded and padded.shard_size % 2048 == 0

    def test_host_spot_range_mesh_mismatch_raises(self):
        from flashdeconv_tpu.parallel import multihost

        rng = np.random.RandomState(0)
        coords = rng.rand(100, 2)
        plan = plan_shards(build_knn_graph(coords, k=3), 2, coords=coords)
        if len(jax.devices()) != 2:
            with pytest.raises(ValueError, match="shards"):
                multihost.host_spot_range(plan)

    def test_host_spot_range_interleaved_mesh_raises(self):
        """A round-robin (interleaved) device order would make
        [first, last+1) span other hosts' shards — every process would
        silently load the wrong Y rows. Must raise, not guess."""
        from flashdeconv_tpu.parallel import multihost

        rng = np.random.RandomState(0)
        coords = rng.rand(200, 2)
        plan = plan_shards(build_knn_graph(coords, k=3), 4, coords=coords)

        class _Dev:
            def __init__(self, pi):
                self.process_index = pi

        class _Mesh:
            # processes 0/1 interleaved round-robin over 4 shards
            devices = np.array([_Dev(0), _Dev(1), _Dev(0), _Dev(1)])

        with pytest.raises(ValueError, match="not contiguous"):
            multihost.host_spot_range(plan, mesh=_Mesh())
        # contiguous host-major order is accepted
        class _MeshOK:
            devices = np.array([_Dev(0), _Dev(0), _Dev(1), _Dev(1)])

        start, stop = multihost.host_spot_range(plan, mesh=_MeshOK())
        assert (start, stop) == (0, 2 * plan.shard_size)

    def test_distributed_subset_col_mean_dense_input(self):
        """Dense local slices must take the scipy fallback (the native
        kernel is CSR-only and now declines politely), matching the
        sparse result."""
        from scipy import sparse as sp

        from flashdeconv_tpu.parallel import multihost

        rng = np.random.RandomState(1)
        Y = rng.poisson(2.0, size=(50, 30)).astype(np.float64)
        idx = np.arange(0, 30, 3)
        mu_dense = multihost.distributed_subset_col_mean(Y, idx)
        mu_sparse = multihost.distributed_subset_col_mean(
            sp.csr_matrix(Y), idx
        )
        np.testing.assert_allclose(mu_dense, mu_sparse, rtol=1e-12)
        np.testing.assert_allclose(
            mu_dense, Y[:, idx].mean(axis=0), rtol=1e-12
        )

    def test_initialize_noop_single_process(self):
        from flashdeconv_tpu.parallel import multihost

        # Late no-arg call on an already-running single-process runtime:
        # no-op, but warns so the pod-misuse trap is visible.
        with pytest.warns(RuntimeWarning, match="before any other JAX use"):
            multihost.initialize()
        assert jax.process_count() == 1

    def test_initialize_late_multiprocess_raises(self):
        from flashdeconv_tpu.parallel import multihost

        with pytest.raises(RuntimeError, match="before any JAX computation"):
            multihost.initialize(
                coordinator_address="127.0.0.1:9999",
                num_processes=2, process_id=0,
            )


class TestGspmdBanded:
    def _grid_problem(self, side=40, k_types=6, d=48, seed=5):
        coords = grid_coords(side=side)
        n = coords.shape[0]
        rng = np.random.RandomState(seed)
        X_sketch = rng.randn(k_types, d)
        Y_sketch = np.abs(rng.randn(n, k_types)) @ X_sketch \
            + 0.05 * rng.randn(n, d)
        A = build_knn_graph(coords, k=4)
        return Y_sketch, X_sketch, A, coords

    def test_matches_single_device(self):
        from flashdeconv_tpu.parallel.gspmd import gspmd_banded_solve
        from jax.sharding import Mesh

        Y_sketch, X_sketch, A, coords = self._grid_problem()
        kwargs = dict(lambda_=0.4, rho=0.01, max_iter=50, tol=1e-5)
        beta_ref, info_ref = bcd_solve(
            Y_sketch, X_sketch, A, dtype=np.float64, **kwargs
        )
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("spots",))
        beta_g, info_g = gspmd_banded_solve(
            Y_sketch, X_sketch, A, mesh=mesh, dtype=np.float64, **kwargs
        )
        assert info_g["n_shards"] == 8
        assert abs(info_g["n_iterations"] - info_ref["n_iterations"]) <= 1
        np.testing.assert_allclose(beta_g, beta_ref, atol=1e-8)
        np.testing.assert_allclose(
            info_g["final_objective"], info_ref["final_objective"], rtol=1e-8
        )

    def test_shard_count_invariance(self):
        from flashdeconv_tpu.parallel.gspmd import gspmd_banded_solve
        from jax.sharding import Mesh

        Y_sketch, X_sketch, A, coords = self._grid_problem(side=32)
        results = []
        for s in (1, 4, 8):
            mesh = Mesh(np.asarray(jax.devices()[:s]), ("spots",))
            beta, _ = gspmd_banded_solve(
                Y_sketch, X_sketch, A, mesh=mesh, dtype=np.float64,
                lambda_=0.2, rho=0.01, max_iter=40,
            )
            results.append(beta)
        np.testing.assert_allclose(results[1], results[0], atol=1e-9)
        np.testing.assert_allclose(results[2], results[0], atol=1e-9)

    def test_rejects_irregular_graph(self):
        from flashdeconv_tpu.parallel.gspmd import gspmd_banded_solve

        rng = np.random.RandomState(0)
        coords = rng.rand(300, 2) * 50
        A = build_knn_graph(coords, k=6)
        Y_sketch = rng.randn(300, 16)
        X_sketch = rng.randn(4, 16)
        with pytest.raises(ValueError, match="not fully banded"):
            gspmd_banded_solve(Y_sketch, X_sketch, A)


class TestShardedDispatch:
    def test_banded_strategy_with_plan_raises(self):
        rng = np.random.RandomState(0)
        coords = rng.rand(100, 2)
        A = build_knn_graph(coords, k=3)
        plan = plan_shards(A, 2, coords=coords)
        with pytest.raises(ValueError, match="ShardPlan"):
            sharded_bcd_solve(
                rng.randn(100, 8), rng.randn(3, 8), A,
                plan=plan, strategy="banded",
            )

    def test_degenerate_inputs_graceful(self):
        from scipy import sparse as sp

        # zero cell types on a banded-looking (empty) graph
        beta, info = sharded_bcd_solve(
            np.zeros((10, 8)), np.zeros((0, 8)), sp.csr_matrix((10, 10))
        )
        assert beta.shape == (10, 0)
        assert info["n_iterations"] == 0
        # max_iter=0 keeps the info contract (final_change == 0.0)
        coords = grid_coords(side=5)
        A = build_knn_graph(coords, k=3)
        rng = np.random.RandomState(0)
        beta, info = sharded_bcd_solve(
            rng.rand(25, 8), rng.rand(3, 8), A, max_iter=0
        )
        assert info["final_change"] == 0.0 and not info["converged"]


class TestShardedVerbose:
    """Sharded solves report observable objective trajectories (both
    strategies), on the single-device verbose contract."""

    @pytest.mark.parametrize("strategy", ["halo", "auto"])
    def test_objectives_populated(self, strategy, capsys):
        Y_sketch, X_sketch, A, coords = _problem(n_spots=400, seed=5)
        beta, info = sharded_bcd_solve(
            Y_sketch, X_sketch, A, coords=coords, n_shards=4,
            lambda_=0.3, max_iter=40, tol=1e-6, strategy=strategy,
            verbose=True, dtype=np.float64,
        )
        assert len(info["objectives"]) >= 1
        assert info["final_objective"] == info["objectives"][-1]
        assert info["final_objective"] <= info["objectives"][0] + 1e-6
        out = capsys.readouterr().out
        assert "Iteration 0: objective" in out

    def test_verbose_matches_nonverbose(self, capsys):
        Y_sketch, X_sketch, A, coords = _problem(n_spots=300, seed=6)
        kwargs = dict(
            coords=coords, n_shards=4, lambda_=0.2, max_iter=50, tol=1e-5,
            dtype=np.float64,
        )
        beta_q, info_q = sharded_bcd_solve(Y_sketch, X_sketch, A, **kwargs)
        beta_v, info_v = sharded_bcd_solve(
            Y_sketch, X_sketch, A, verbose=True, **kwargs
        )
        capsys.readouterr()
        np.testing.assert_array_equal(beta_v, beta_q)
        assert info_v["n_iterations"] == info_q["n_iterations"]

    def test_device_objective_matches_host_form(self):
        """The psum'd device objective equals the host f64 expansion."""
        from flashdeconv_tpu.core.solver import compute_objective
        from flashdeconv_tpu.core.spatial import compute_laplacian

        Y_sketch, X_sketch, A, coords = _problem(n_spots=300, seed=8)
        beta, info = sharded_bcd_solve(
            Y_sketch, X_sketch, A, coords=coords, n_shards=4,
            lambda_=0.3, rho=0.01, max_iter=50, strategy="halo",
            dtype=np.float64,
        )
        XtX = X_sketch @ X_sketch.T
        rho_eff = 0.01 * float(np.mean(np.diag(XtX)))
        host_obj = compute_objective(
            beta, X_sketch @ Y_sketch.T, XtX,
            float(np.einsum("ij,ij->", Y_sketch, Y_sketch)),
            compute_laplacian(A), 0.3, rho_eff,
        )
        np.testing.assert_allclose(
            info["final_objective"], host_obj, rtol=1e-9
        )


class TestScrambledGridResort:
    """A shuffled grid input must still hit the GSPMD banded path at mesh
    scale (mirrors the single-device driver's (y, x) re-sort)."""

    def _scrambled_grid(self, side=24, k_types=5, d=32, seed=9):
        coords = grid_coords(side=side)
        n = coords.shape[0]
        rng = np.random.RandomState(seed)
        perm = rng.permutation(n)
        coords = coords[perm]
        X_sketch = rng.randn(k_types, d)
        Y_sketch = np.abs(rng.randn(n, k_types)) @ X_sketch \
            + 0.05 * rng.randn(n, d)
        A = build_knn_graph(coords, k=4)
        return Y_sketch, X_sketch, A, coords

    def test_dispatches_to_banded(self, monkeypatch):
        from flashdeconv_tpu.utils.graph import banded_split
        import flashdeconv_tpu.parallel.solver as psolver

        # the production gate skips the re-sort analysis below 8192 spots;
        # lower it so a CPU-sized grid exercises the dispatch logic
        monkeypatch.setattr(psolver, "RESORT_MIN_SPOTS", 0)

        Y_sketch, X_sketch, A, coords = self._scrambled_grid()
        # precondition: not banded in input order
        off, _, _ = banded_split(A, max_offsets=32, min_coverage=1.0)
        assert off.size == 0

        beta_sh, info = sharded_bcd_solve(
            Y_sketch, X_sketch, A, coords=coords, n_shards=8,
            lambda_=0.3, max_iter=50, tol=1e-5, dtype=np.float64,
        )
        assert "n_bands" in info  # GSPMD banded path was used
        assert info["n_shards"] == 8

        beta_ref, info_ref = bcd_solve(
            Y_sketch, X_sketch, A, lambda_=0.3, max_iter=50, tol=1e-5,
            dtype=np.float64,
        )
        np.testing.assert_allclose(beta_sh, beta_ref, atol=1e-8)
        assert abs(info["n_iterations"] - info_ref["n_iterations"]) <= 1

    def test_small_problem_skips_resort_analysis(self):
        """Below RESORT_MIN_SPOTS the auto strategy must not pay the O(nnz)
        permuted banded re-analysis — the halo path serves small problems."""
        Y_sketch, X_sketch, A, coords = self._scrambled_grid(side=16)
        beta_sh, info = sharded_bcd_solve(
            Y_sketch, X_sketch, A, coords=coords, n_shards=4,
            lambda_=0.3, max_iter=30, dtype=np.float64,
        )
        assert "n_bands" not in info  # halo path, not GSPMD banded
        beta_ref, _ = bcd_solve(
            Y_sketch, X_sketch, A, lambda_=0.3, max_iter=30, dtype=np.float64,
        )
        np.testing.assert_allclose(beta_sh, beta_ref, atol=1e-8)

    def test_resort_with_beta_init(self, monkeypatch):
        import flashdeconv_tpu.parallel.solver as psolver

        monkeypatch.setattr(psolver, "RESORT_MIN_SPOTS", 0)
        Y_sketch, X_sketch, A, coords = self._scrambled_grid(side=16)
        n, k = Y_sketch.shape[0], X_sketch.shape[0]
        beta0, _ = sharded_bcd_solve(
            Y_sketch, X_sketch, A, coords=coords, n_shards=4,
            lambda_=0.3, max_iter=30, dtype=np.float64,
        )
        beta_w, info_w = sharded_bcd_solve(
            Y_sketch, X_sketch, A, coords=coords, n_shards=4,
            lambda_=0.3, max_iter=30, dtype=np.float64, beta_init=beta0,
        )
        assert beta_w.shape == (n, k)
        with pytest.raises(ValueError, match="beta_init shape"):
            sharded_bcd_solve(
                Y_sketch, X_sketch, A, coords=coords, n_shards=4,
                beta_init=np.zeros((3, 3)), dtype=np.float64,
            )


class TestDistributedGeneSelection:
    """Multi-host gene-selection reduction: host-local additive sums must
    reproduce the single-host moments exactly (single-process identity) and
    under arbitrary row slicing (the multi-host decomposition)."""

    def _sparse_counts(self, n=700, g=400, seed=0):
        from scipy import sparse as sp

        rng = np.random.default_rng(seed)
        Y = sp.random(
            n, g, density=0.08, format="csr", random_state=3,
            data_rvs=lambda k: np.round(rng.exponential(4.0, k)) + 1.0,
        )
        return Y

    def test_sliced_sums_match_full(self):
        from flashdeconv_tpu.utils.genes import (
            _log1p_cpm_moments, log1p_cpm_sums, moments_from_sums,
        )

        Y = self._sparse_counts()
        means_full, var_full = _log1p_cpm_moments(Y)

        cuts = [0, 150, 400, 700]  # 3 unequal "hosts"
        col_sum = col_sq = 0.0
        for a, b in zip(cuts[:-1], cuts[1:]):
            s, sq = log1p_cpm_sums(Y[a:b])
            col_sum = col_sum + s
            col_sq = col_sq + sq
        means, var = moments_from_sums(col_sum, col_sq, Y.shape[0])
        np.testing.assert_allclose(means, means_full, rtol=1e-12)
        np.testing.assert_allclose(var, var_full, rtol=1e-10, atol=1e-14)

    def test_single_process_identity(self):
        from flashdeconv_tpu.parallel.multihost import (
            distributed_select_informative_genes,
        )
        from flashdeconv_tpu.utils.genes import select_informative_genes

        Y = self._sparse_counts(seed=1)
        X = np.random.RandomState(2).gamma(2.0, 1.0, size=(6, 400))
        idx_d, lev_d = distributed_select_informative_genes(
            Y, X, n_hvg=100, n_markers_per_type=10
        )
        idx_s, lev_s = select_informative_genes(
            Y, X, n_hvg=100, n_markers_per_type=10
        )
        np.testing.assert_array_equal(idx_d, idx_s)
        np.testing.assert_allclose(lev_d, lev_s, rtol=1e-12)

    def test_allreduce_sums_single_process(self):
        from flashdeconv_tpu.parallel.multihost import allreduce_sums

        a, b = np.arange(5.0), np.ones((2, 3))
        out = allreduce_sums(a, b)
        np.testing.assert_array_equal(out[0], a)
        np.testing.assert_array_equal(out[1], b)


@pytest.mark.parametrize("strategy", ["banded", "halo"])
def test_sharded_return_device_matches_host(strategy):
    """return_device=True: the sharded solve returns a device array
    bitwise-equal (after dtype widening) to the host-fetch path, in the
    ORIGINAL spot order for both strategies (incl. the halo plan's Morton
    un-permute, done on device via gather)."""
    from flashdeconv_tpu.parallel.solver import prepare_sharded_bcd

    Y_sketch, X_sketch, A, coords = _problem()
    kwargs = dict(lambda_=0.3, rho=0.01, max_iter=40, tol=1e-5)

    sp = prepare_sharded_bcd(
        Y_sketch, X_sketch, A, coords=coords, n_shards=4, strategy=strategy
    )
    beta_host, info_host = sp.solve(**kwargs)
    beta_dev, info_dev = sp.solve(return_device=True, **kwargs)

    assert not isinstance(beta_dev, np.ndarray)  # stayed on device
    assert beta_dev.shape == (A.shape[0], X_sketch.shape[0])
    assert info_dev["n_iterations"] == info_host["n_iterations"]
    np.testing.assert_array_equal(
        np.asarray(beta_dev, dtype=np.float64), beta_host
    )


class TestFitDistributed:
    """One-call multi-host pipeline helpers + the single-process identity
    of ``FlashDeconv.fit_distributed`` (the REAL 2-process run lives in
    ``test_multihost_exec.py::test_fit_distributed_two_process...``)."""

    def _data(self, grid=True, seed=0, n_side=18, G=300, K=6):
        from scipy import sparse as sp

        rng = np.random.RandomState(seed)
        if grid:
            coords = grid_coords(side=n_side)
        else:
            coords = rng.rand(n_side * n_side, 2) * n_side
        n = coords.shape[0]
        X = rng.gamma(2.0, 1.0, size=(K, G)) * (rng.rand(K, G) < 0.4)
        bt = rng.dirichlet(np.ones(K), size=n)
        Y = sp.csr_matrix(rng.poisson(bt @ X * 20.0).astype(np.float64))
        return Y, X, coords

    def test_allgather_rows_single_process_identity(self):
        from flashdeconv_tpu.parallel.multihost import allgather_rows

        a = np.arange(12.0).reshape(4, 3)
        np.testing.assert_array_equal(allgather_rows(a), a)
        e = np.zeros((0, 2))
        assert allgather_rows(e).shape == (0, 2)

    def test_process_row_offsets_single_process(self):
        from flashdeconv_tpu.parallel.multihost import process_row_offsets

        assert process_row_offsets(17) == (0, 17, 17)

    def test_distributed_knn_graph_matches_build(self):
        from flashdeconv_tpu.parallel.multihost import distributed_knn_graph

        _, _, coords = self._data(grid=False, seed=3)
        A_d, cg = distributed_knn_graph(coords, k=5)
        A_s = build_knn_graph(coords, k=5)
        assert (A_d != A_s).nnz == 0
        np.testing.assert_array_equal(cg, coords)

    def test_distributed_adjacency_radius_and_grid(self):
        from flashdeconv_tpu.parallel.multihost import distributed_adjacency
        from flashdeconv_tpu.utils.graph import (
            build_grid_graph, build_radius_graph,
        )

        _, _, coords = self._data(grid=True, seed=4)
        A_r, _ = distributed_adjacency(coords, method="radius", radius=1.2)
        assert (A_r != build_radius_graph(coords, radius=1.2)).nnz == 0
        A_g, _ = distributed_adjacency(coords, method="grid")
        assert (A_g != build_grid_graph(coords)).nnz == 0
        with pytest.raises(ValueError, match="radius must be specified"):
            distributed_adjacency(coords, method="radius")
        with pytest.raises(ValueError, match="Unknown method"):
            distributed_adjacency(coords, method="voronoi")

    def test_distributed_subset_col_mean_matches_slicewise(self):
        from flashdeconv_tpu.parallel.multihost import (
            distributed_subset_col_mean,
        )

        Y, _, _ = self._data(seed=5)
        gene_idx = np.arange(0, 300, 7)
        mu = distributed_subset_col_mean(Y, gene_idx)
        expect = np.asarray(Y[:, gene_idx].mean(axis=0)).ravel()
        np.testing.assert_allclose(mu, expect, rtol=1e-12)

    @pytest.mark.parametrize("grid", [True, False], ids=["banded", "halo"])
    def test_single_process_matches_fit(self, grid):
        """fit_distributed on one process == sharded fit, bitwise, for
        both strategy dispatches (canonical CSR + log_cpm path)."""
        from flashdeconv_tpu import FlashDeconv

        Y, X, coords = self._data(grid=grid)
        kw = dict(
            sketch_dim=64, n_hvg=100, n_markers_per_type=10, max_iter=30,
            solver_dtype=np.float64, random_state=0,
            n_shards=len(jax.devices()),
        )
        ref = FlashDeconv(**kw).fit(Y, X, coords)
        m = FlashDeconv(**kw)
        out = m.fit_distributed(Y, X, coords)
        assert out is m and m._fitted
        np.testing.assert_array_equal(m.gene_idx_, ref.gene_idx_)
        assert m.lambda_used_ == ref.lambda_used_
        np.testing.assert_array_equal(m.beta_, ref.beta_)
        np.testing.assert_array_equal(m.proportions_, ref.proportions_)
        assert m.info_["n_iterations"] == ref.info_["n_iterations"]
        assert m.info_["final_objective"] == pytest.approx(
            ref.info_["final_objective"], rel=1e-12
        )
        assert m.host_rows_ == (0, Y.shape[0])
        assert set(m.timings_) >= {
            "gene_selection", "sketch", "spatial_graph", "solve",
        }

    def test_pearson_and_dense_fallback_close(self):
        """Non-canonical paths (pearson colscale; dense staged fallback)
        agree with fit to float64 rounding."""
        from flashdeconv_tpu import FlashDeconv

        Y, X, coords = self._data()
        kw = dict(
            sketch_dim=64, n_hvg=100, n_markers_per_type=10, max_iter=25,
            solver_dtype=np.float64, random_state=0,
            n_shards=len(jax.devices()),
        )
        for case in ("pearson", "dense"):
            if case == "pearson":
                a = FlashDeconv(preprocess="pearson", **kw)
                b = FlashDeconv(preprocess="pearson", **kw)
                Yd = Y
            else:
                a, b = FlashDeconv(**kw), FlashDeconv(**kw)
                Yd = np.asarray(Y.todense())
            b.fit(Yd, X, coords)
            a.fit_distributed(Yd, X, coords)
            np.testing.assert_array_equal(a.gene_idx_, b.gene_idx_)
            np.testing.assert_allclose(
                a.beta_, b.beta_, rtol=1e-9, atol=1e-12
            )

    def test_poisoned_counts_objective_finite(self, monkeypatch):
        """fit_distributed's fused path repairs poisoned rows like fit():
        a NaN count and a log1p-poisoning negative count (-1: small
        enough to keep the library size positive, so log1p(v*scale) is
        NaN — a huge negative flips the library sign and stays finite)
        both leave final_objective finite and bit-identical to the
        single-process fit on the same poisoned input. The poisoned
        column is a MARKER gene (selected from X alone), so it is in the
        selected set no matter what the poison does to the HVG moments;
        a spy asserts the repair actually engaged in both fits."""
        import flashdeconv_tpu.core.deconv as dc
        from flashdeconv_tpu import FlashDeconv
        from flashdeconv_tpu.utils.genes import select_markers

        Y, X, coords = self._data()
        marker_idx, _ = select_markers(X, n_markers=10)
        mset = set(int(g) for g in marker_idx)
        pos = next(
            p for p in range(Y.nnz) if int(Y.indices[p]) in mset
        )
        Ybad = Y.copy()
        Ybad.data[pos] = -1.0
        Ybad.data[3 if 3 != pos else 4] = np.nan
        # sanity: the exact criterion flags at least the negative row
        assert dc._zero_poisoned_csr_rows(
            Ybad, marker_idx, logcpm=True
        ) is not None

        repairs = []
        orig = dc._zero_poisoned_csr_rows
        monkeypatch.setattr(
            dc, "_zero_poisoned_csr_rows",
            lambda *a, **k: repairs.append(1) or orig(*a, **k),
        )
        kw = dict(
            sketch_dim=64, n_hvg=100, n_markers_per_type=10, max_iter=25,
            solver_dtype=np.float64, random_state=0,
            n_shards=len(jax.devices()),
        )
        ref = FlashDeconv(**kw).fit(Ybad, X, coords)
        assert len(repairs) == 1  # fit()'s fused feed repaired
        assert np.isfinite(ref.info_["final_objective"])
        m = FlashDeconv(**kw)
        m.fit_distributed(Ybad, X, coords)
        assert len(repairs) == 2  # fit_distributed repaired too
        assert np.isfinite(m.info_["final_objective"])
        np.testing.assert_array_equal(m.beta_, ref.beta_)
        assert m.info_["final_objective"] == pytest.approx(
            ref.info_["final_objective"], rel=1e-12
        )

    def test_degenerate_solve_keeps_info_contract(self):
        """max_iter=0 early return carries the same info keys as every
        other sharded return (n_shards / halo_width)."""
        from flashdeconv_tpu.parallel import sharded_bcd_solve

        rng = np.random.RandomState(0)
        _, X, coords = self._data(n_side=10)
        A = build_knn_graph(coords, k=4)
        Ys = rng.rand(coords.shape[0], 8)
        Xs = rng.rand(X.shape[0], 8)
        beta, info = sharded_bcd_solve(Ys, Xs, A, coords=coords, max_iter=0)
        assert info["n_shards"] >= 1 and info["halo_width"] == 0
        assert beta.shape == (coords.shape[0], X.shape[0])

    def test_prepare_sharded_requires_xty_yty_with_no_sketch(self):
        from flashdeconv_tpu.parallel import prepare_sharded_bcd

        Y, X, coords = self._data(n_side=10)
        A = build_knn_graph(coords, k=4)
        Xs = np.random.RandomState(0).rand(X.shape[0], 8)
        with pytest.raises(ValueError, match="requires both xty and yty"):
            prepare_sharded_bcd(None, Xs, A, coords=coords)

    def test_fit_distributed_validation(self):
        from flashdeconv_tpu import FlashDeconv

        Y, X, coords = self._data()
        m = FlashDeconv(n_shards=len(jax.devices()))
        with pytest.raises(ValueError, match="Gene dimension mismatch"):
            m.fit_distributed(Y[:, :100], X, coords)
        with pytest.raises(ValueError, match="Spot count mismatch"):
            m.fit_distributed(Y, X, coords[:-1])
        with pytest.raises(ValueError, match="at least one cell type"):
            m.fit_distributed(Y, X[:0], coords)
        with pytest.raises(ValueError, match="cell_type_names length"):
            m.fit_distributed(
                Y, X, coords, cell_type_names=np.array(["a", "b"])
            )


_SIXTEEN_DEVICE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

from flashdeconv_tpu.core.solver import bcd_solve
from flashdeconv_tpu.parallel import sharded_bcd_solve
from flashdeconv_tpu.utils.graph import build_knn_graph, grid_coords

assert len(jax.devices()) == 16, jax.devices()

side = 48                                  # 2304 spots, 16 shards of 144
coords = grid_coords(side=side)
n = coords.shape[0]
rng = np.random.RandomState(7)
K, d = 9, 48
X_sketch = rng.randn(K, d)
Y_sketch = np.abs(rng.randn(n, K)) @ X_sketch + 0.05 * rng.randn(n, d)
A = build_knn_graph(coords, k=6)
kwargs = dict(lambda_=0.3, rho=0.01, max_iter=60, tol=1e-5)

beta_ref, info_ref = bcd_solve(
    Y_sketch, X_sketch, A, dtype=np.float64, **kwargs
)
for strategy in ("auto", "halo"):
    beta_sh, info_sh = sharded_bcd_solve(
        Y_sketch, X_sketch, A, coords=coords, n_shards=16,
        dtype=np.float64, strategy=strategy, **kwargs,
    )
    assert info_sh["n_shards"] == 16, info_sh
    assert abs(info_sh["n_iterations"] - info_ref["n_iterations"]) <= 1
    np.testing.assert_allclose(beta_sh, beta_ref, atol=1e-8)
print("OK16")
"""


def test_sixteen_shard_solve_matches_single_device(tmp_path):
    """Both sharded strategies at 16 shards — past the 8-device mesh every
    other test uses, and the shard count the scaling model's knee sits at
    (docs/performance_guide.md) — agree with the single-device solve to f64
    rounding. Runs in a subprocess because the device count is fixed at
    import time in this process."""
    import os
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker16.py"
    script.write_text(_SIXTEEN_DEVICE_WORKER)
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=600, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "OK16" in out.stdout
