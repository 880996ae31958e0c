"""IO / AnnData-adapter and scanpy-style tl API tests (duck-typed fake).

These cover the behavioral contracts of reference ``flashdeconv/io/loader.py``
and ``tl/_deconvolve.py`` using :mod:`tests.fake_anndata`, so they run without
anndata installed; the real-anndata round-trips live in test_integration.py
behind ``pytest.importorskip``.
"""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse

from tests.conftest import make_synthetic
from tests.fake_anndata import (
    FakeAnnData,
    make_reference_adata,
    make_spatial_adata,
)

import flashdeconv_tpu as fd
from flashdeconv_tpu.io import (
    align_genes,
    load_reference,
    load_spatial_data,
    prepare_data,
    result_to_anndata,
)


def _ref_adata(n_types=5, n_genes=120, cells_per_type=8, seed=0, sparse_X=False):
    rng = np.random.RandomState(seed)
    counts = rng.poisson(2.0, size=(n_types * cells_per_type, n_genes)).astype(float)
    labels = np.repeat([f"type_{k}" for k in range(n_types)], cells_per_type)
    if sparse_X:
        counts = sparse.csr_matrix(counts)
    return make_reference_adata(counts, labels), counts, labels


class TestLoadSpatialData:
    def test_obsm_spatial(self):
        rng = np.random.RandomState(0)
        Y = rng.poisson(1.0, size=(30, 40)).astype(float)
        coords = rng.rand(30, 2)
        ad = make_spatial_adata(Y, coords)
        Y2, c2, genes = load_spatial_data(ad)
        np.testing.assert_array_equal(Y2, Y)
        np.testing.assert_allclose(c2, coords)
        assert len(genes) == 40

    def test_coordinate_fallbacks(self):
        rng = np.random.RandomState(1)
        Y = rng.rand(10, 5)
        # X_spatial fallback
        ad = FakeAnnData(Y)
        ad.obsm["X_spatial"] = rng.rand(10, 2)
        _, c, _ = load_spatial_data(ad)
        np.testing.assert_allclose(c, ad.obsm["X_spatial"])
        # obs x/y fallback
        ad2 = FakeAnnData(Y)
        ad2.obs["x"] = np.arange(10.0)
        ad2.obs["y"] = np.arange(10.0) * 2
        _, c2, _ = load_spatial_data(ad2)
        assert c2.shape == (10, 2)
        # array_row/col fallback
        ad3 = FakeAnnData(Y)
        ad3.obs["array_row"] = np.arange(10)
        ad3.obs["array_col"] = np.arange(10)
        _, c3, _ = load_spatial_data(ad3)
        assert c3.shape == (10, 2)

    def test_missing_coords_raises(self):
        ad = FakeAnnData(np.zeros((4, 3)))
        with pytest.raises(ValueError, match="spatial coordinates"):
            load_spatial_data(ad)

    def test_layer_selection(self):
        Y = np.ones((5, 4))
        ad = make_spatial_adata(Y, np.zeros((5, 2)))
        ad.layers["counts"] = Y * 7
        Y2, _, _ = load_spatial_data(ad, layer="counts")
        np.testing.assert_array_equal(Y2, Y * 7)


class TestLoadReference:
    @pytest.mark.parametrize("sparse_X", [False, True])
    def test_mean_aggregation(self, sparse_X):
        ad, counts, labels = _ref_adata(sparse_X=sparse_X)
        X, types, genes = load_reference(ad)
        assert X.shape == (5, 120)
        dense = counts.toarray() if sparse_X else counts
        for i, t in enumerate(types):
            np.testing.assert_allclose(X[i], dense[labels == t].mean(axis=0))

    def test_sum_aggregation(self):
        ad, counts, labels = _ref_adata()
        X, types, _ = load_reference(ad, method="sum")
        for i, t in enumerate(types):
            np.testing.assert_allclose(X[i], counts[labels == t].sum(axis=0))

    def test_missing_key_raises(self):
        ad, _, _ = _ref_adata()
        with pytest.raises(ValueError, match="not found"):
            load_reference(ad, cell_type_key="nope")

    def test_bad_method_raises(self):
        ad, _, _ = _ref_adata()
        with pytest.raises(ValueError, match="aggregation"):
            load_reference(ad, method="median")


class TestAlignGenes:
    def test_intersection(self):
        Y = np.arange(12.0).reshape(2, 6)
        X = np.arange(8.0).reshape(2, 4)
        gs = np.array(["a", "b", "c", "d", "e", "f"])
        gr = np.array(["d", "b", "z", "a"])
        Y2, X2, common = align_genes(Y, X, gs, gr)
        assert sorted(common.tolist()) == ["a", "b", "d"]
        # columns correspond to the same genes in both
        for j, g in enumerate(common):
            assert Y2[0, j] == Y[0, list(gs).index(g)]
            assert X2[0, j] == X[0, list(gr).index(g)]

    def test_no_overlap_raises(self):
        with pytest.raises(ValueError, match="No common genes"):
            align_genes(
                np.zeros((2, 2)), np.zeros((2, 2)),
                np.array(["a", "b"]), np.array(["c", "d"]),
            )

    def test_duplicate_names_first_wins(self):
        Y = np.array([[1.0, 2.0, 3.0]])
        X = np.array([[9.0, 8.0]])
        Y2, X2, common = align_genes(
            Y, X, np.array(["g", "g", "h"]), np.array(["h", "g"])
        )
        assert Y2[0, list(common).index("g")] == 1.0  # first occurrence
        assert X2[0, list(common).index("g")] == 8.0


class TestResultToAnnData:
    def test_writes_obsm_and_dominant(self):
        rng = np.random.RandomState(0)
        props = rng.dirichlet(np.ones(3), size=8)
        ad = FakeAnnData(np.zeros((8, 4)))
        names = np.array(["A", "B", "C"])
        result_to_anndata(props, ad, names, key_added="fd")
        assert isinstance(ad.obsm["fd"], pd.DataFrame)
        assert list(ad.obsm["fd"].columns) == ["A", "B", "C"]
        assert (ad.obs["fd_dominant"] == names[props.argmax(1)]).all()
        assert ad.obs["fd_dominant"].dtype.name == "category"

    def test_shape_mismatch_raises(self):
        ad = FakeAnnData(np.zeros((8, 4)))
        with pytest.raises(ValueError, match="n_obs"):
            result_to_anndata(np.zeros((5, 3)), ad)

    def test_names_length_mismatch_raises(self):
        ad = FakeAnnData(np.zeros((4, 4)))
        with pytest.raises(ValueError, match="cell_type_names"):
            result_to_anndata(np.zeros((4, 3)), ad, np.array(["A", "B"]))


class TestPrepareData:
    def test_end_to_end_alignment(self):
        rng = np.random.RandomState(0)
        genes = [f"g{i}" for i in range(50)]
        Y = rng.poisson(1.0, size=(20, 50)).astype(float)
        st = make_spatial_adata(Y, rng.rand(20, 2), gene_names=genes)
        ref_counts = rng.poisson(2.0, size=(30, 40)).astype(float)
        ref = make_reference_adata(
            ref_counts, ["t0"] * 15 + ["t1"] * 15,
            gene_names=genes[5:45],
        )
        Y2, X2, coords, names, common = prepare_data(st, ref)
        assert Y2.shape == (20, 40)
        assert X2.shape == (2, 40)
        assert coords.shape == (20, 2)
        assert list(names) == ["t0", "t1"]
        assert len(common) == 40


class TestTlDeconvolve:
    def _pair(self):
        Y, X, coords, props = make_synthetic(
            n_spots=150, n_genes=300, n_types=5, seed=0
        )
        genes = [f"g{i}" for i in range(Y.shape[1])]
        st = make_spatial_adata(Y, coords, gene_names=genes)
        # sample reference cells around each signature row
        rng = np.random.RandomState(1)
        counts, labels = [], []
        for k in range(X.shape[0]):
            lam = X[k] / (X[k].sum() + 1e-12) * 1500
            counts.append(rng.poisson(lam, size=(12, X.shape[1])))
            labels += [f"type_{k}"] * 12
        ref = make_reference_adata(
            np.vstack(counts).astype(float), labels, gene_names=genes
        )
        return st, ref, props

    def test_in_place_contract(self):
        st, ref, props = self._pair()
        out = fd.tl.deconvolve(
            st, ref, cell_type_key="cell_type",
            sketch_dim=128, n_hvg=200, n_markers_per_type=10,
        )
        assert out is None  # copy=False modifies in place
        P = st.obsm["flashdeconv"]
        assert P.shape == (150, 5)
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-6)
        params = st.uns["flashdeconv_params"]
        assert params["sketch_dim"] == 128
        assert params["n_hvg"] == 200
        assert "converged" in params and "lambda_spatial" in params
        assert st.obs["flashdeconv_dominant"].dtype.name == "category"

    def test_copy_contract(self):
        st, ref, _ = self._pair()
        out = fd.tl.deconvolve(
            st, ref, copy=True,
            sketch_dim=128, n_hvg=200, n_markers_per_type=10,
        )
        assert out is not None
        assert "flashdeconv" in out.obsm
        assert "flashdeconv" not in st.obsm  # original untouched

    def test_key_added(self):
        st, ref, _ = self._pair()
        fd.tl.deconvolve(
            st, ref, key_added="mydeconv",
            sketch_dim=128, n_hvg=200, n_markers_per_type=10,
        )
        assert "mydeconv" in st.obsm
        assert "mydeconv_params" in st.uns
        assert "mydeconv_dominant" in st.obs

    def test_fetch_dtype_forwarding(self):
        # tl.deconvolve forwards fetch_dtype to the FlashDeconv ctor
        # (a typo'd kwarg would TypeError; an invalid value ValueError).
        st, ref, _ = self._pair()
        fd.tl.deconvolve(
            st, ref, fetch_dtype="float16",
            sketch_dim=128, n_hvg=200, n_markers_per_type=10,
        )
        P = np.asarray(st.obsm["flashdeconv"])
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=2e-3)
        with pytest.raises(ValueError, match="fetch_dtype"):
            fd.tl.deconvolve(
                st, ref, fetch_dtype="float8",
                sketch_dim=128, n_hvg=200, n_markers_per_type=10,
            )

    def test_accuracy_floor(self):
        st, ref, props = self._pair()
        fd.tl.deconvolve(
            st, ref, sketch_dim=128, n_hvg=200, n_markers_per_type=10,
        )
        P = np.asarray(st.obsm["flashdeconv"])
        corr = np.corrcoef(P.ravel(), props.ravel())[0, 1]
        assert corr > 0.3
