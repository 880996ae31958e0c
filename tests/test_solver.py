"""Solver behavioral contracts (mirrors reference tests/test_solver.py scope)."""

import hashlib

import numpy as np
import pytest

from flashdeconv_tpu.core.solver import (
    bcd_solve,
    compute_objective,
    normalize_proportions,
    precompute_XtY,
    precompute_gram_matrix,
    soft_threshold,
)
from flashdeconv_tpu.core.spatial import compute_laplacian
from flashdeconv_tpu.utils.graph import build_knn_graph


@pytest.fixture
def simple_problem():
    rng = np.random.RandomState(42)
    n_spots, n_types, d = 50, 5, 32
    X_sketch = rng.randn(n_types, d)
    beta_true = rng.rand(n_spots, n_types)
    beta_true /= beta_true.sum(axis=1, keepdims=True)
    Y_sketch = beta_true @ X_sketch + 0.1 * rng.randn(n_spots, d)
    coords = rng.rand(n_spots, 2)
    A = build_knn_graph(coords, k=4)
    return Y_sketch, X_sketch, A, beta_true


class TestSoftThreshold:
    def test_positive_above(self):
        assert soft_threshold(5.0, 2.0) == 3.0

    def test_negative_below(self):
        assert soft_threshold(-5.0, 2.0) == -3.0

    def test_within_band(self):
        assert soft_threshold(1.0, 2.0) == 0.0


class TestGramMatrix:
    def test_shape_symmetry_psd(self):
        X = np.random.RandomState(0).randn(10, 64)
        G = precompute_gram_matrix(X)
        assert G.shape == (10, 10)
        np.testing.assert_allclose(G, G.T)
        assert np.all(np.linalg.eigvalsh(G) >= -1e-10)


class TestBCDSolve:
    def test_output_shape(self, simple_problem):
        Y, X, A, _ = simple_problem
        beta, info = bcd_solve(Y, X, A, max_iter=10)
        assert beta.shape == (50, 5)

    def test_non_negative(self, simple_problem):
        Y, X, A, _ = simple_problem
        beta, _ = bcd_solve(Y, X, A, max_iter=50)
        assert np.all(beta >= -1e-10)

    def test_info_contract(self, simple_problem):
        Y, X, A, _ = simple_problem
        _, info = bcd_solve(Y, X, A, max_iter=200, tol=1e-4)
        for key in (
            "converged",
            "n_iterations",
            "final_objective",
            "objectives",
            "final_change",
        ):
            assert key in info
        assert info["n_iterations"] <= 200

    def test_objective_finite_nonneg(self, simple_problem, capsys):
        Y, X, A, _ = simple_problem
        _, info = bcd_solve(
            Y, X, A, lambda_=0.1, rho=0.01, max_iter=50, verbose=True
        )
        assert np.isfinite(info["final_objective"])
        assert info["final_objective"] >= 0
        assert len(info["objectives"]) >= 1
        # The solve makes net progress (Jacobi-across-spots sweeps are not
        # guaranteed monotone per-sweep, but the trajectory must descend).
        assert info["final_objective"] <= info["objectives"][0] + 1e-6

    def test_lambda_smoothing_monotone(self, simple_problem):
        Y, X, A, _ = simple_problem
        beta_low, _ = bcd_solve(Y, X, A, lambda_=0.001, max_iter=50)
        beta_high, _ = bcd_solve(Y, X, A, lambda_=1.0, max_iter=50)
        assert np.var(beta_high) <= np.var(beta_low) + 0.1

    def test_recovers_signal(self, simple_problem):
        Y, X, A, beta_true = simple_problem
        beta, _ = bcd_solve(Y, X, A, lambda_=0.01, rho=0.0, max_iter=200)
        corr = np.corrcoef(beta.ravel(), beta_true.ravel())[0, 1]
        assert corr > 0.8

    def test_empty_inputs(self):
        from scipy import sparse

        beta, info = bcd_solve(
            np.zeros((0, 8)), np.zeros((3, 8)), sparse.csr_matrix((0, 0))
        )
        assert beta.shape == (0, 3)
        assert info["converged"]

    def test_float64_path(self, simple_problem):
        # Compare at convergence: mid-trajectory iterates drift between
        # precisions (residual maintenance cancels large terms), but both
        # precisions must land on the same fixed point.
        Y, X, A, _ = simple_problem
        beta32, _ = bcd_solve(Y, X, A, max_iter=500, tol=1e-6, dtype=np.float32)
        beta64, _ = bcd_solve(Y, X, A, max_iter=500, tol=1e-6, dtype=np.float64)
        np.testing.assert_allclose(beta32, beta64, atol=2e-3)
        corr = np.corrcoef(beta32.ravel(), beta64.ravel())[0, 1]
        assert corr > 0.9999


class TestNormalizeProportions:
    def test_row_sums(self):
        props = normalize_proportions(np.random.RandomState(0).rand(20, 5))
        np.testing.assert_allclose(props.sum(axis=1), 1.0)

    def test_preserves_ratios(self):
        props = normalize_proportions(np.array([[2.0, 4.0], [3.0, 3.0]]))
        np.testing.assert_allclose(props[0], [1 / 3, 2 / 3])
        np.testing.assert_allclose(props[1], [0.5, 0.5])

    def test_all_zero_rows_uniform(self):
        props = normalize_proportions(
            np.array([[0.0, 0, 0], [1, 2, 3], [0, 0, 0]])
        )
        assert np.all(np.isfinite(props))
        np.testing.assert_allclose(props.sum(axis=1), 1.0)
        np.testing.assert_allclose(props[0], 1 / 3)
        np.testing.assert_allclose(props[2], 1 / 3)
        np.testing.assert_allclose(props[1], [1 / 6, 2 / 6, 3 / 6])


class TestObjective:
    def _setup(self, seed, N, K, d, k=4):
        rng = np.random.RandomState(seed)
        Y = rng.randn(N, d)
        X = rng.randn(K, d)
        beta = np.abs(rng.randn(N, K))
        A = build_knn_graph(rng.rand(N, 2), k=k)
        L = compute_laplacian(A)
        H = precompute_XtY(X, Y)
        G = precompute_gram_matrix(X)
        YtY = float(np.sum(Y**2))
        return Y, X, beta, A, L, H, G, YtY

    def test_nonnegative(self):
        _, _, beta, _, L, H, G, YtY = self._setup(42, 30, 5, 32)
        assert compute_objective(beta, H, G, YtY, L, 0.1, 0.01) >= 0

    def test_perfect_fit_zero(self):
        rng = np.random.RandomState(42)
        X = rng.randn(3, 16)
        beta = rng.rand(20, 3)
        Y = beta @ X
        A = build_knn_graph(rng.rand(20, 2), k=4)
        L = compute_laplacian(A)
        obj = compute_objective(
            beta,
            precompute_XtY(X, Y),
            precompute_gram_matrix(X),
            float(np.sum(Y**2)),
            L,
            0.0,
            0.0,
        )
        np.testing.assert_allclose(obj, 0, atol=1e-10)

    @pytest.mark.parametrize(
        "seed,N,K,d", [(0, 50, 3, 20), (1, 200, 10, 64), (2, 30, 8, 128)]
    )
    def test_matches_einsum_expansion(self, seed, N, K, d):
        lam, rho = 0.1, 0.05
        Y, X, beta, A, L, H, G, YtY = self._setup(seed, N, K, d)
        direct = (
            0.5 * np.sum((Y - beta @ X) ** 2)
            + 0.5 * lam * np.einsum("ik,ik->", beta, (L @ beta))
            + rho * np.abs(beta).sum()
        )
        fast = compute_objective(beta, H, G, YtY, L, lam, rho)
        np.testing.assert_allclose(fast, direct, rtol=1e-9, atol=1e-8)

    def test_device_objective_matches_host(self):
        import jax.numpy as jnp

        from flashdeconv_tpu.ops.bcd import objective_terms
        from flashdeconv_tpu.utils.graph import adjacency_to_padded

        Y, X, beta, A, L, H, G, YtY = self._setup(3, 60, 6, 48)
        host = compute_objective(beta, H, G, YtY, L, 0.2, 0.03)
        nbr, nnb = adjacency_to_padded(A)
        dev = float(
            objective_terms(
                jnp.asarray(beta),
                jnp.asarray(Y @ X.T),
                jnp.asarray(G),
                YtY,
                jnp.asarray(nbr),
                jnp.asarray(nnb, dtype=jnp.float64),
                0.2,
                0.03,
            )
        )
        np.testing.assert_allclose(dev, host, rtol=1e-9)


class TestDeterminism:
    def test_bitwise_reproducible(self):
        rng = np.random.RandomState(42)
        n_spots, n_types, d = 60, 7, 48
        X = rng.randn(n_types, d)
        bt = rng.rand(n_spots, n_types)
        bt /= bt.sum(axis=1, keepdims=True)
        Y = bt @ X + 0.05 * rng.randn(n_spots, d)
        A = build_knn_graph(rng.rand(n_spots, 2), k=4)

        runs = [
            bcd_solve(Y, X, A, lambda_=0.1, rho=0.01, max_iter=30, tol=1e-6)
            for _ in range(2)
        ]
        h = [hashlib.sha256(b.tobytes()).hexdigest() for b, _ in runs]
        assert h[0] == h[1]
        assert runs[0][1]["n_iterations"] == runs[1][1]["n_iterations"]
        assert runs[0][1]["converged"] == runs[1][1]["converged"]


def test_fori_loop_tier_bitwise_equals_unrolled(monkeypatch):
    """The dynamic-slice fori_loop coordinate pass (K > _UNROLL_MAX_K) is
    the same arithmetic as the unrolled static-slice pass — forcing the
    fori tier on a small K must reproduce the unrolled solve bitwise.
    (Lives here, not in the reference-gated parity module: the contract is
    internal and must hold on CI runners without the reference mount.)"""
    import flashdeconv_tpu.ops.bcd as bcd

    from flashdeconv_tpu.core.solver import bcd_solve
    from flashdeconv_tpu.utils.graph import build_knn_graph

    rng = np.random.RandomState(5)
    n_spots, n_types, d = 50, 12, 48
    X = rng.randn(n_types, d)
    bt = rng.rand(n_spots, n_types)
    bt /= bt.sum(axis=1, keepdims=True)
    Y = bt @ X + 0.05 * rng.randn(n_spots, d)
    coords = rng.rand(n_spots, 2)
    A = build_knn_graph(coords, k=4)
    kw = dict(lambda_=0.2, rho=0.01, max_iter=30, tol=1e-5,
              dtype=np.float64)

    beta_unrolled, info_u = bcd_solve(Y, X, A, **kw)
    monkeypatch.setattr(bcd, "_UNROLL_MAX_K", 4)
    beta_fori, info_f = bcd_solve(Y, X, A, **kw)

    np.testing.assert_array_equal(beta_fori, beta_unrolled)
    assert info_f["n_iterations"] == info_u["n_iterations"]


def test_normalize_proportions_device_matches_host_zero_rows():
    """Device-side normalize must replicate the host rule exactly,
    including the all-zero-row -> uniform fallback."""
    from flashdeconv_tpu.core.solver import (
        normalize_proportions,
        normalize_proportions_device,
    )

    beta = np.array(
        [[1.0, 3.0, 0.0],
         [0.0, 0.0, 0.0],          # zero row -> uniform 1/3
         [2e-11, 0.0, 0.0],        # tiny row -> clamped denominator
         [5.0, 5.0, 10.0]],
        dtype=np.float32,
    )
    host = normalize_proportions(beta)          # f64 reference rule
    dev = np.asarray(normalize_proportions_device(beta), dtype=np.float64)
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-7)
    # uniform fill is computed in the solve dtype (f32 third, not f64)
    np.testing.assert_allclose(dev[1], np.full(3, 1.0 / 3.0), rtol=1e-6)


class TestNonFiniteGuards:
    """Production robustness: poisoned inputs must fail loudly (bad X) or
    degrade gracefully to the reference's emergent behavior (bad Y spots
    come out uniform — the reference's clipped Numba update maps NaN to 0,
    reference core/solver.py:75-93), never emit NaN proportions."""

    def test_nonfinite_gram_raises(self, simple_problem):
        Y, X, A, _ = simple_problem
        Xbad = X.copy()
        Xbad[1, 3] = np.nan
        with pytest.raises(ValueError, match="non-finite Gram"):
            precompute_gram_matrix(Xbad)
        with pytest.raises(ValueError, match="non-finite Gram"):
            bcd_solve(Y, Xbad, A, lambda_=0.3, rho=0.01, max_iter=10)

    def test_nan_spot_sanitized(self, simple_problem):
        Y, X, A, _ = simple_problem
        Ybad = Y.copy()
        Ybad[7, 0] = np.nan                      # poisons spot 7's Xty row
        Ybad[19, 2] = np.inf
        beta, info = bcd_solve(
            Ybad, X, A, lambda_=0.3, rho=0.01, max_iter=40,
            dtype=np.float64,
        )
        props = normalize_proportions(beta)
        assert np.isfinite(props).all()
        # bitwise identical to explicitly zeroing the poisoned rows: with
        # lambda > 0 the zeroed spots are imputed from their neighbors
        # (spatial smoothing), not left uniform
        Yzero = Y.copy()
        Yzero[[7, 19]] = 0.0
        beta_ref, info_ref = bcd_solve(
            Yzero, X, A, lambda_=0.3, rho=0.01, max_iter=40,
            dtype=np.float64,
        )
        np.testing.assert_array_equal(beta, beta_ref)
        # ... and so is the OBJECTIVE: the YtY constant is recomputed over
        # the sanitized rows (core.solver.sanitize_yty), so the monitored
        # info dict stays finite and matches the explicitly-zeroed input
        # bit-for-bit (same shape, same block-ordered reduction).
        assert np.isfinite(info["final_objective"])
        np.testing.assert_array_equal(
            info["final_objective"], info_ref["final_objective"]
        )
        # with no spatial coupling the poisoned spot degenerates to the
        # uniform fallback (the reference's emergent NaN behavior)
        beta0, _ = bcd_solve(
            Ybad, X, A, lambda_=0.0, rho=0.01, max_iter=40,
            dtype=np.float64,
        )
        K = X.shape[0]
        np.testing.assert_allclose(
            normalize_proportions(beta0)[7], np.full(K, 1.0 / K)
        )

    def test_sanitize_yty_restores_input(self, simple_problem):
        """The degraded re-reduction zeroes bad rows IN PLACE with
        save/restore (no second full sketch in memory) — the caller's
        buffer must come back byte-identical; read-only buffers take the
        copy fallback."""
        from flashdeconv_tpu.core.solver import sanitize_yty

        Y, _, _, _ = simple_problem
        Ybad = np.asarray(Y, dtype=np.float64).copy()
        Ybad[4, 2] = np.nan
        snapshot = Ybad.copy()
        got = sanitize_yty(None, Ybad)
        Yzero = snapshot.copy()
        Yzero[4] = 0.0
        from flashdeconv_tpu import native

        assert got == native.yty_f64(Yzero)
        np.testing.assert_array_equal(Ybad, snapshot)  # restored, NaN and all
        # read-only input: copy fallback, same value
        Ybad.setflags(write=False)
        assert sanitize_yty(None, Ybad) == got

    def test_n_nonfinite_spots_property(self, simple_problem):
        from flashdeconv_tpu.core.solver import prepare_bcd

        Y, X, A, _ = simple_problem
        prob = prepare_bcd(Y, X, A, dtype=np.float64)
        assert prob.n_nonfinite_spots == 0
        Ybad = Y.copy()
        Ybad[3, :] = np.nan
        Ybad[11, 5] = -np.inf
        prob2 = prepare_bcd(Ybad, X, A, dtype=np.float64)
        assert prob2.n_nonfinite_spots == 2

    def test_sharded_sanitize_matches_single_device(self, simple_problem):
        from flashdeconv_tpu.parallel import sharded_bcd_solve

        Y, X, A, _ = simple_problem
        rng = np.random.RandomState(0)
        coords = rng.rand(Y.shape[0], 2)
        Ybad = Y.copy()
        Ybad[5, 1] = np.nan
        kw = dict(lambda_=0.3, rho=0.01, max_iter=40, dtype=np.float64)
        beta_ref, _ = bcd_solve(Ybad, X, A, **kw)
        for strategy in ("auto", "halo"):
            beta_sh, info_sh = sharded_bcd_solve(
                Ybad, X, A, coords=coords, n_shards=4, strategy=strategy,
                **kw,
            )
            assert np.isfinite(beta_sh).all()
            assert np.isfinite(info_sh["final_objective"])
            np.testing.assert_allclose(beta_sh, beta_ref, atol=1e-8)
