"""Gene selection and leverage-score contracts."""

import numpy as np
import pytest
from scipy import sparse

from flashdeconv_tpu.utils.genes import (
    compute_leverage_scores,
    select_hvg,
    select_informative_genes,
    select_markers,
)


def _counts(seed=0, n=200, g=300):
    rng = np.random.RandomState(seed)
    base = rng.gamma(1.0, 1.0, size=(n, g))
    # make a block of genes highly variable across two spot groups
    base[: n // 2, :20] *= 10
    return rng.poisson(base * 5).astype(float)


class TestSelectHVG:
    def test_returns_sorted_subset(self):
        Y = _counts()
        idx = select_hvg(Y, n_top=50)
        assert idx.size == 50
        assert np.all(np.diff(idx) > 0)
        assert idx.min() >= 0 and idx.max() < Y.shape[1]

    def test_sparse_dense_agree(self):
        Y = _counts(1)
        idx_d = select_hvg(Y, n_top=60)
        idx_s = select_hvg(sparse.csr_matrix(Y), n_top=60)
        np.testing.assert_array_equal(idx_d, idx_s)

    def test_finds_variable_block(self):
        Y = _counts(2)
        # raise max_mean: the engineered block is variable but high-mean
        idx = select_hvg(Y, n_top=40, max_mean=10.0)
        # enrichment well above the 40/300 base selection rate
        assert np.isin(np.arange(20), idx).mean() > 0.25

    def test_single_spot(self):
        Y = _counts()[0:1]
        idx = select_hvg(Y, n_top=10)
        assert idx.size == 10


class TestSelectMarkers:
    @pytest.fixture
    def signatures(self):
        rng = np.random.RandomState(0)
        X = rng.rand(5, 100) * 0.1
        for k in range(5):
            X[k, k * 10 : k * 10 + 10] = 1.0  # exclusive markers per type
        return X

    @pytest.mark.parametrize("method", ["diff", "ratio", "specificity"])
    def test_methods_find_exclusive_markers(self, signatures, method):
        idx, assign = select_markers(signatures, n_markers=5, method=method)
        assert idx.size >= 5
        # each type's exclusive block should be represented
        for k in range(5):
            block = np.arange(k * 10, k * 10 + 10)
            assert np.isin(idx, block).sum() >= 1

    def test_zero_markers(self, signatures):
        idx, assign = select_markers(signatures, n_markers=0)
        assert idx.size == 0 and assign.size == 0

    def test_negative_raises(self, signatures):
        with pytest.raises(ValueError, match="non-negative"):
            select_markers(signatures, n_markers=-1)

    def test_single_type(self):
        X = np.random.RandomState(0).rand(1, 50)
        idx, assign = select_markers(X, n_markers=10)
        np.testing.assert_array_equal(idx, np.arange(10))
        assert np.all(assign == 0)

    def test_unknown_method(self, signatures):
        with pytest.raises(ValueError, match="Unknown method"):
            select_markers(signatures, method="bogus")


class TestLeverageScores:
    def test_probability_vector(self):
        X = np.random.RandomState(0).rand(6, 80)
        lv = compute_leverage_scores(X)
        assert lv.shape == (80,)
        assert np.all(lv >= 0)
        np.testing.assert_allclose(lv.sum(), 1.0, atol=1e-5)

    def test_discriminative_genes_score_higher(self):
        rng = np.random.RandomState(1)
        X = np.ones((4, 60)) + 0.01 * rng.rand(4, 60)
        X[0, :5] = 10.0  # genes 0-4 separate type 0 from the rest
        lv = compute_leverage_scores(X)
        assert lv[:5].min() > lv[5:].max()


class TestSelectInformativeGenes:
    def test_union_and_leverage(self):
        Y = _counts(3)
        X = np.random.RandomState(3).rand(5, 300)
        idx, lv = select_informative_genes(Y, X, n_hvg=50, n_markers_per_type=10)
        assert idx.size >= 50
        assert lv.shape == idx.shape
        np.testing.assert_allclose(lv.sum(), 1.0, atol=1e-5)

    def test_empty_raises(self):
        Y = np.zeros((10, 20))
        X = np.zeros((3, 20))
        with pytest.raises(ValueError, match="No genes selected"):
            select_informative_genes(Y, X, n_hvg=0, n_markers_per_type=0)
