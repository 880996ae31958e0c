"""End-to-end pipeline contracts (mirrors reference tests/test_integration.py)."""

import numpy as np
import pytest
from scipy import sparse

from flashdeconv_tpu import FlashDeconv
from flashdeconv_tpu.utils.metrics import compute_correlation

from conftest import make_synthetic


class TestFit:
    def test_fit_returns_self_and_shapes(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(sketch_dim=128, n_hvg=200, n_markers_per_type=15)
        out = model.fit(Y, X, coords)
        assert out is model
        assert model.beta_.shape == (Y.shape[0], X.shape[0])
        assert model.proportions_.shape == (Y.shape[0], X.shape[0])
        assert model.gene_idx_.size > 0

    def test_simplex_rows(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        P = FlashDeconv(
            sketch_dim=128, n_hvg=200, n_markers_per_type=15
        ).fit_transform(Y, X, coords)
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-8)
        assert np.all(P >= 0)

    def test_dominant_type(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(sketch_dim=128, n_hvg=200, n_markers_per_type=15)
        model.fit(Y, X, coords)
        dom = model.get_dominant_cell_type()
        assert dom.shape == (Y.shape[0],)
        assert dom.min() >= 0 and dom.max() < X.shape[0]

    def test_auto_lambda_resolved(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(
            sketch_dim=128, lambda_spatial="auto", n_hvg=200,
            n_markers_per_type=15,
        )
        model.fit(Y, X, coords)
        assert isinstance(model.lambda_used_, float)
        assert model.lambda_used_ > 0

    def test_explicit_lambda(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(
            sketch_dim=128, lambda_spatial=0.5, n_hvg=200, n_markers_per_type=15
        )
        model.fit(Y, X, coords)
        assert model.lambda_used_ == 0.5

    def test_summary(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        model = FlashDeconv(sketch_dim=128, n_hvg=200, n_markers_per_type=15)
        assert model.summary() == {"fitted": False}
        model.fit(Y, X, coords)
        s = model.summary()
        assert s["fitted"] is True
        assert s["n_spots"] == Y.shape[0]
        assert s["n_cell_types"] == X.shape[0]
        assert "final_objective" in s

    def test_sparse_input(self, synthetic_sparse):
        Y, X, coords, _ = synthetic_sparse
        assert sparse.issparse(Y)
        P = FlashDeconv(
            sketch_dim=128, n_hvg=200, n_markers_per_type=15
        ).fit_transform(Y, X, coords)
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-8)

    def test_sparse_dense_agree(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        kw = dict(sketch_dim=128, n_hvg=200, n_markers_per_type=15, random_state=0)
        P_dense = FlashDeconv(**kw).fit_transform(Y, X, coords)
        P_sparse = FlashDeconv(**kw).fit_transform(
            sparse.csr_matrix(Y), X, coords
        )
        np.testing.assert_allclose(P_dense, P_sparse, atol=1e-5)

    def test_seeded_reproducibility(self, synthetic_small):
        Y, X, coords, _ = synthetic_small
        kw = dict(sketch_dim=128, n_hvg=200, n_markers_per_type=15, random_state=7)
        P1 = FlashDeconv(**kw).fit_transform(Y, X, coords)
        P2 = FlashDeconv(**kw).fit_transform(Y, X, coords)
        np.testing.assert_array_equal(P1, P2)

    @pytest.mark.parametrize("d", [64, 128, 256])
    def test_multiple_sketch_dims(self, synthetic_small, d):
        Y, X, coords, _ = synthetic_small
        P = FlashDeconv(
            sketch_dim=d, n_hvg=200, n_markers_per_type=15
        ).fit_transform(Y, X, coords)
        assert P.shape == (Y.shape[0], X.shape[0])

    def test_accuracy_floor(self, synthetic_small):
        Y, X, coords, props = synthetic_small
        P = FlashDeconv(
            sketch_dim=256, n_hvg=300, n_markers_per_type=20
        ).fit_transform(Y, X, coords)
        assert compute_correlation(P, props) > 0.3

    @pytest.mark.parametrize(
        "method,kw",
        [("radius", {"radius": 1.5}), ("grid", {})],
    )
    def test_spatial_methods(self, synthetic_small, method, kw):
        Y, X, coords, _ = synthetic_small
        P = FlashDeconv(
            sketch_dim=128, n_hvg=200, n_markers_per_type=15,
            spatial_method=method, **kw,
        ).fit_transform(Y, X, coords)
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-8)

    @pytest.mark.parametrize("preprocess", ["log_cpm", "pearson", "raw"])
    def test_preprocess_methods(self, preprocess):
        Y, X, coords, _ = make_synthetic(n_spots=100, n_genes=300, n_types=5)
        P = FlashDeconv(
            sketch_dim=64, n_hvg=100, n_markers_per_type=10,
            preprocess=preprocess,
        ).fit_transform(Y, X, coords)
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-8)


class TestErrorContracts:
    def test_unfitted_access(self):
        model = FlashDeconv()
        with pytest.raises(RuntimeError, match="not been fitted"):
            model.get_cell_type_proportions()
        with pytest.raises(RuntimeError, match="not been fitted"):
            model.get_abundances()
        with pytest.raises(RuntimeError, match="not been fitted"):
            model.get_dominant_cell_type()

    def test_gene_mismatch(self):
        with pytest.raises(ValueError, match="Gene dimension mismatch"):
            FlashDeconv().fit(
                np.zeros((10, 50)), np.zeros((3, 60)), np.zeros((10, 2))
            )

    def test_spot_mismatch(self):
        with pytest.raises(ValueError, match="Spot count mismatch"):
            FlashDeconv().fit(
                np.zeros((10, 50)), np.zeros((3, 50)), np.zeros((9, 2))
            )

    def test_empty_reference(self):
        with pytest.raises(ValueError, match="at least one cell type"):
            FlashDeconv().fit(
                np.zeros((10, 50)), np.zeros((0, 50)), np.zeros((10, 2))
            )

    def test_bad_cell_type_names(self):
        with pytest.raises(ValueError, match="cell_type_names length"):
            FlashDeconv().fit(
                np.zeros((10, 50)),
                np.ones((3, 50)),
                np.zeros((10, 2)),
                cell_type_names=np.array(["a", "b"]),
            )

    @pytest.mark.parametrize(
        "kw,msg",
        [
            ({"sketch_dim": 0}, "sketch_dim"),
            ({"k_neighbors": -1}, "k_neighbors"),
            ({"max_iter": -1}, "max_iter"),
            ({"tol": 0.0}, "tol"),
            ({"lambda_spatial": -1.0}, "lambda_spatial"),
            ({"rho_sparsity": -0.1}, "rho_sparsity"),
            ({"n_hvg": -1}, "n_hvg"),
            ({"n_markers_per_type": -1}, "n_markers_per_type"),
            ({"spatial_method": "radius"}, "radius"),
            ({"radius": -2.0}, "radius"),
            ({"preprocess": "bogus"}, "preprocess"),
        ],
    )
    def test_ctor_validation(self, kw, msg):
        with pytest.raises(ValueError, match=msg):
            FlashDeconv(**kw)

    def test_nonfinite_reference_raises(self):
        Y, X, coords, _ = make_synthetic(n_spots=60, n_genes=200, n_types=4)
        Xbad = np.asarray(X, dtype=float).copy()
        Xbad[1, 7] = np.nan
        with pytest.raises(ValueError, match="non-finite Gram"):
            FlashDeconv(sketch_dim=32, max_iter=10).fit(Y, Xbad, coords)

    @pytest.mark.parametrize("sparse_output", [False, True])
    def test_nonfinite_spot_degrades_gracefully(self, sparse_output):
        """A NaN count (dense path) or NaN data entry (sparse CSR through
        the native fused pipeline) must never surface as NaN proportions:
        the poisoned spot's Xty row is zeroed at prepare time and the spot
        is spatially imputed from its neighbors."""
        from scipy import sparse as sp

        Y, X, coords, _ = make_synthetic(
            n_spots=80, n_genes=200, n_types=4,
            sparse_output=sparse_output,
        )
        if sparse_output:
            Ybad = Y.tocsr(copy=True)
            Ybad.data[5] = np.nan
            # small finite negative count: log1p(v * 1e4/lib) is NaN
            # (library stays positive) — covered by the fused feed's
            # exact log_cpm repair criterion, not just the non-finite
            # scan (the marker-targeted engagement assert lives in
            # test_parallel.py::test_poisoned_counts_objective_finite)
            Ybad.data[40] = -1.0
        else:
            Ybad = np.asarray(Y, dtype=float).copy()
            Ybad[3, 11] = np.nan
        m = FlashDeconv(sketch_dim=32, max_iter=30).fit(Ybad, X, coords)
        props = m.proportions_
        assert np.isfinite(props).all()
        np.testing.assert_allclose(props.sum(axis=1), 1.0, atol=1e-5)
        # The monitored objective must also stay finite: the YtY constant
        # reflects the sanitized problem (core.solver.sanitize_yty; on the
        # fused native feed, the poisoned-row re-run in _fused_xty_feed's
        # caller), not the poisoned reduction.
        assert np.isfinite(m.info_["final_objective"])


class TestAnnDataAPI:
    def _make_adatas(self):
        from tests.fake_anndata import anndata_or_fake
        ad = anndata_or_fake()
        Y, X, coords, props = make_synthetic(n_spots=80, n_genes=200, n_types=4)
        genes = np.array([f"gene{i}" for i in range(Y.shape[1])])
        adata_st = ad.AnnData(X=Y)
        adata_st.var_names = genes
        adata_st.obsm["spatial"] = coords

        # single-cell reference: sample cells per type around the signatures
        rng = np.random.RandomState(0)
        cells, labels = [], []
        for k in range(X.shape[0]):
            mean = X[k] / (X[k].sum() + 1e-9) * 2000
            cells.append(rng.poisson(np.tile(mean, (30, 1))))
            labels += [f"type{k}"] * 30
        adata_ref = ad.AnnData(X=np.vstack(cells).astype(float))
        adata_ref.var_names = genes
        adata_ref.obs["cell_type"] = labels
        return adata_st, adata_ref

    def test_tl_deconvolve_inplace(self):
        import flashdeconv_tpu as fd

        adata_st, adata_ref = self._make_adatas()
        out = fd.tl.deconvolve(
            adata_st, adata_ref, cell_type_key="cell_type",
            sketch_dim=64, n_hvg=100, n_markers_per_type=10,
        )
        assert out is None
        assert "flashdeconv" in adata_st.obsm
        assert adata_st.obsm["flashdeconv"].shape == (80, 4)
        assert "flashdeconv_dominant" in adata_st.obs
        assert adata_st.obs["flashdeconv_dominant"].dtype.name == "category"
        params = adata_st.uns["flashdeconv_params"]
        assert params["sketch_dim"] == 64
        assert params["n_cell_types"] == 4
        assert "converged" in params and "n_iterations" in params

    def test_tl_deconvolve_copy(self):
        import flashdeconv_tpu as fd

        adata_st, adata_ref = self._make_adatas()
        out = fd.tl.deconvolve(
            adata_st, adata_ref, cell_type_key="cell_type",
            sketch_dim=64, n_hvg=100, n_markers_per_type=10, copy=True,
        )
        assert out is not None
        assert "flashdeconv" not in adata_st.obsm
        assert "flashdeconv" in out.obsm

    def test_result_to_anndata_errors(self):
        from tests.fake_anndata import anndata_or_fake
        ad = anndata_or_fake()
        from flashdeconv_tpu.io import result_to_anndata

        adata = ad.AnnData(X=np.zeros((5, 3)))
        with pytest.raises(ValueError, match="must be 2D"):
            result_to_anndata(np.zeros(5), adata)
        with pytest.raises(ValueError, match="must match adata.n_obs"):
            result_to_anndata(np.zeros((4, 2)), adata)
        with pytest.raises(ValueError, match="cell_type_names"):
            result_to_anndata(
                np.zeros((5, 2)), adata, cell_type_names=np.array(["a"])
            )

    def test_prepare_data_alignment(self):
        from tests.fake_anndata import anndata_or_fake
        ad = anndata_or_fake()
        from flashdeconv_tpu.io import prepare_data

        rng = np.random.RandomState(0)
        adata_st = ad.AnnData(X=rng.rand(10, 5))
        adata_st.var_names = ["g1", "g2", "g3", "g4", "g5"]
        adata_st.obsm["spatial"] = rng.rand(10, 2)
        adata_ref = ad.AnnData(X=rng.rand(20, 4))
        adata_ref.var_names = ["g3", "g5", "g1", "gX"]
        adata_ref.obs["cell_type"] = ["a", "b"] * 10

        Y, X, coords, names, genes = prepare_data(adata_st, adata_ref)
        assert sorted(genes) == ["g1", "g3", "g5"]
        assert Y.shape == (10, 3)
        assert X.shape == (2, 3)
        assert list(names) == ["a", "b"]


def test_spotless_real_runner_layout(tmp_path):
    """benchmarks/spotless_real.py consumes the documented converted
    layout end-to-end (synthetic stand-in data) and skips incomplete
    dataset directories with a labeled record."""
    import json
    import os
    import subprocess
    import sys

    from scipy import sparse

    bench_dir = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    sys.path.insert(0, bench_dir)
    try:
        from spotless_like import (
            compose_spots,
            reference_from_cells,  # noqa: F401 (layout mirrors real suite)
            simulate_cells,
        )
    finally:
        sys.path.remove(bench_dir)

    rng = np.random.RandomState(0)
    n_types, n_genes = 4, 800
    counts, labels = simulate_cells(n_types, n_genes, 40, rng)
    half = counts.shape[0] // 2
    Y, coords, props = compose_spots(
        counts[:half], labels[:half], n_types, 120, rng
    )
    dd = tmp_path / "liver_rep1"
    dd.mkdir()
    sparse.save_npz(dd / "spots.npz", sparse.csr_matrix(Y))
    (dd / "genes.txt").write_text(
        "\n".join(f"g{i}" for i in range(n_genes))
    )
    names = [f"type{k}" for k in range(n_types)]
    with open(dd / "truth.csv", "w") as fh:
        fh.write(",".join(names) + "\n")
        for row in props:
            fh.write(",".join(f"{v:.6f}" for v in row) + "\n")
    sparse.save_npz(dd / "reference.npz", sparse.csr_matrix(counts[half:]))
    (dd / "reference_labels.txt").write_text(
        "\n".join(names[l] for l in labels[half:])
    )
    np.savetxt(dd / "coords.csv", coords, delimiter=",")
    (tmp_path / "incomplete_rep1").mkdir()

    out_path = tmp_path / "out.json"
    r = subprocess.run(
        [sys.executable, os.path.join(bench_dir, "spotless_real.py"),
         "--data", str(tmp_path), "--out", str(out_path)],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    rec = json.loads(out_path.read_text())
    assert rec["n_datasets"] == 1 and rec["n_skipped"] == 1
    assert rec["datasets"][0]["converged"]
    assert rec["value"] > 0.9  # protocol sanity, not the real-suite claim
