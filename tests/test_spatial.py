"""Spatial graph + Laplacian contracts (mirrors reference tests/test_spatial.py)."""

import numpy as np
import pytest
from scipy import sparse

from flashdeconv_tpu.core.spatial import (
    auto_tune_lambda,
    compute_degree_matrix,
    compute_laplacian,
    compute_laplacian_quadratic,
)
from flashdeconv_tpu.utils.graph import (
    adjacency_to_padded,
    build_grid_graph,
    build_knn_graph,
    build_radius_graph,
    coords_to_adjacency,
    get_neighbor_counts,
    get_neighbor_indices,
)


@pytest.fixture
def grid3x3():
    xs, ys = np.meshgrid(np.arange(3), np.arange(3))
    return np.column_stack([xs.ravel(), ys.ravel()]).astype(float)


class TestKnnGraph:
    def test_shape_and_binary(self):
        coords = np.random.RandomState(0).rand(30, 2)
        A = build_knn_graph(coords, k=4)
        assert A.shape == (30, 30)
        assert set(np.unique(A.data)) <= {1.0}

    def test_symmetric(self):
        coords = np.random.RandomState(1).rand(25, 2)
        A = build_knn_graph(coords, k=5)
        assert (A != A.T).nnz == 0

    def test_no_self_loops_by_default(self):
        coords = np.random.RandomState(2).rand(20, 2)
        A = build_knn_graph(coords, k=3)
        assert A.diagonal().sum() == 0

    def test_include_self(self):
        coords = np.random.RandomState(2).rand(20, 2)
        A = build_knn_graph(coords, k=3, include_self=True)
        assert np.all(A.diagonal() == 1)

    def test_k_clamped(self):
        coords = np.random.RandomState(3).rand(4, 2)
        A = build_knn_graph(coords, k=10)  # k > n-1
        assert A.shape == (4, 4)
        assert np.all(np.diff(A.tocsr().indptr) == 3)

    def test_single_spot(self):
        A = build_knn_graph(np.zeros((1, 2)), k=6)
        assert A.shape == (1, 1) and A.nnz == 0

    def test_3d_coords(self):
        coords = np.random.RandomState(4).rand(15, 3)
        A = build_knn_graph(coords, k=3)
        assert A.shape == (15, 15)

    def test_bad_coords(self):
        with pytest.raises(ValueError, match="coords must be 2D"):
            build_knn_graph(np.zeros(5), k=2)


class TestRadiusGraph:
    def test_grid_exact_counts_r15(self, grid3x3):
        # radius 1.5 on a unit 3x3 grid: center spot sees all 8 others.
        A = build_radius_graph(grid3x3, radius=1.5)
        degrees = np.asarray(A.sum(axis=1)).ravel()
        assert degrees.max() == 8
        # corners see 3 neighbors (two sides + one diagonal)
        assert degrees.min() == 3

    def test_grid_exact_counts_r11(self, grid3x3):
        # radius 1.1 excludes diagonals: center has 4, corners have 2.
        A = build_radius_graph(grid3x3, radius=1.1)
        degrees = np.asarray(A.sum(axis=1)).ravel()
        assert degrees.max() == 4
        assert degrees.min() == 2

    def test_no_pairs(self):
        coords = np.array([[0.0, 0.0], [100.0, 100.0]])
        A = build_radius_graph(coords, radius=1.0)
        assert A.nnz == 0

    def test_include_self_when_empty(self):
        coords = np.array([[0.0, 0.0], [100.0, 100.0]])
        A = build_radius_graph(coords, radius=1.0, include_self=True)
        assert np.all(A.diagonal() == 1)


class TestGridGraph:
    def test_detects_spacing(self, grid3x3):
        A = build_grid_graph(grid3x3 * 7.0)  # scaled grid, spacing 7
        degrees = np.asarray(A.sum(axis=1)).ravel()
        assert degrees.max() == 8  # 1.5x spacing covers diagonals

    def test_tiny(self):
        assert build_grid_graph(np.zeros((1, 2))).shape == (1, 1)


class TestDispatcher:
    def test_knn(self, grid3x3):
        A = coords_to_adjacency(grid3x3, method="knn", k=4)
        assert A.shape == (9, 9)

    def test_radius(self, grid3x3):
        A = coords_to_adjacency(grid3x3, method="radius", radius=1.1)
        assert A.shape == (9, 9)

    def test_radius_requires_radius(self, grid3x3):
        with pytest.raises(ValueError, match="radius must be specified"):
            coords_to_adjacency(grid3x3, method="radius")

    def test_grid(self, grid3x3):
        A = coords_to_adjacency(grid3x3, method="grid")
        assert A.shape == (9, 9)

    def test_unknown(self, grid3x3):
        with pytest.raises(ValueError, match="Unknown method"):
            coords_to_adjacency(grid3x3, method="bogus")


class TestLaplacian:
    def test_unnormalized_row_sums_zero(self, grid3x3):
        A = build_radius_graph(grid3x3, radius=1.1)
        L = compute_laplacian(A)
        np.testing.assert_allclose(np.asarray(L.sum(axis=1)).ravel(), 0.0)

    def test_normalized_diag(self, grid3x3):
        A = build_radius_graph(grid3x3, radius=1.1)
        L = compute_laplacian(A, normalized=True)
        assert np.all(L.diagonal() <= 1.0 + 1e-12)

    def test_degree_matrix(self, grid3x3):
        A = build_radius_graph(grid3x3, radius=1.1)
        D = compute_degree_matrix(A)
        np.testing.assert_allclose(
            D.diagonal(), np.asarray(A.sum(axis=1)).ravel()
        )

    def test_quadratic_psd_and_constant_null(self, grid3x3):
        A = build_radius_graph(grid3x3, radius=1.5)
        L = compute_laplacian(A)
        rng = np.random.RandomState(0)
        for _ in range(5):
            beta = rng.randn(9, 4)
            assert compute_laplacian_quadratic(beta, L) >= -1e-10
        const = np.ones((9, 4)) * 3.7
        np.testing.assert_allclose(
            compute_laplacian_quadratic(const, L), 0.0, atol=1e-9
        )


class TestNeighborHelpers:
    def test_counts(self, grid3x3):
        A = build_radius_graph(grid3x3, radius=1.1)
        counts = get_neighbor_counts(A)
        assert counts.sum() == A.nnz

    def test_indices(self, grid3x3):
        A = build_radius_graph(grid3x3, radius=1.1)
        nbrs = get_neighbor_indices(A)
        assert len(nbrs) == 9
        A_csr = A.tocsr()
        for i in range(9):
            np.testing.assert_array_equal(
                np.sort(nbrs[i]),
                np.sort(A_csr.indices[A_csr.indptr[i] : A_csr.indptr[i + 1]]),
            )


class TestPaddedNeighbors:
    def test_roundtrip(self, grid3x3):
        A = build_radius_graph(grid3x3, radius=1.5)
        nbr, counts = adjacency_to_padded(A)
        assert nbr.shape[0] == 9
        np.testing.assert_array_equal(counts, get_neighbor_counts(A))
        A_csr = A.tocsr()
        for i in range(9):
            valid = nbr[i][nbr[i] < 9]
            np.testing.assert_array_equal(
                np.sort(valid),
                np.sort(A_csr.indices[A_csr.indptr[i] : A_csr.indptr[i + 1]]),
            )
        # padding points at the sentinel row
        assert np.all(nbr[nbr >= 9] == 9)

    def test_empty_graph(self):
        A = sparse.csr_matrix((5, 5))
        nbr, counts = adjacency_to_padded(A)
        assert nbr.shape == (5, 1)
        assert np.all(nbr == 5)
        assert np.all(counts == 0)

    def test_neighbor_sum_matches_matmul(self, grid3x3):
        import jax.numpy as jnp

        from flashdeconv_tpu.ops.bcd import neighbor_sum

        A = build_radius_graph(grid3x3, radius=1.5)
        nbr, _ = adjacency_to_padded(A)
        beta = np.random.RandomState(0).rand(9, 4)
        expected = A @ beta
        beta_ext = jnp.concatenate([jnp.asarray(beta), jnp.zeros((1, 4))], axis=0)
        got = np.asarray(neighbor_sum(beta_ext, jnp.asarray(nbr)))
        np.testing.assert_allclose(got, expected, rtol=1e-12)


class TestAutoTuneLambda:
    def test_positive_and_scales(self, grid3x3):
        rng = np.random.RandomState(0)
        Y = rng.rand(9, 16)
        X = rng.rand(3, 16)
        A = build_radius_graph(grid3x3, radius=1.1)
        lam = auto_tune_lambda(Y, X, A)
        assert lam > 0
        # lambda scales quadratically with X's scale
        lam4 = auto_tune_lambda(Y, X * 2.0, A)
        np.testing.assert_allclose(lam4, 4 * lam, rtol=1e-10)
