"""Plotting layer: figure-content assertions on the Agg backend."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import flashdeconv_tpu as fd  # noqa: E402
from tests.fake_anndata import make_reference_adata, make_spatial_adata  # noqa: E402
from flashdeconv_tpu.utils.graph import grid_coords


@pytest.fixture(scope="module")
def fitted_adata():
    rng = np.random.RandomState(0)
    N, G, K = 150, 400, 4
    genes = [f"g{i}" for i in range(G)]
    X = rng.gamma(2.0, 1.0, size=(K, G)) * (rng.rand(K, G) < 0.3)
    props = rng.dirichlet(np.ones(K), size=N)
    mean = props @ X
    mean = mean / (mean.sum(1, keepdims=True) + 1e-12) * 1200
    coords = grid_coords(N)
    st = make_spatial_adata(
        rng.poisson(mean).astype(float), coords, gene_names=genes
    )
    counts, labels = [], []
    for k in range(K):
        lam = X[k] / (X[k].sum() + 1e-12) * 1200
        counts.append(rng.poisson(lam, size=(12, G)))
        labels += [f"type_{k}"] * 12
    ref = make_reference_adata(
        np.vstack(counts).astype(float), labels, gene_names=genes
    )
    fd.tl.deconvolve(
        st, ref, sketch_dim=64, n_hvg=150, n_markers_per_type=10,
    )
    return st


def test_spatial_dominant(fitted_adata):
    ax = fd.pl.spatial(fitted_adata, color="dominant")
    # one scatter PathCollection per present category, legend present
    n_cats = fitted_adata.obs["flashdeconv_dominant"].astype(str).nunique()
    assert len(ax.collections) == n_cats
    assert sum(len(c.get_offsets()) for c in ax.collections) == 150
    assert ax.get_legend() is not None
    plt.close("all")


def test_spatial_continuous(fitted_adata):
    ax = fd.pl.spatial(fitted_adata, color="type_1")
    assert len(ax.collections) == 1
    arr = ax.collections[0].get_array()
    P = np.asarray(fitted_adata.obsm["flashdeconv"])
    names = list(fitted_adata.obsm["flashdeconv"].columns)
    np.testing.assert_allclose(
        np.asarray(arr), P[:, names.index("type_1")], atol=1e-6
    )
    # a colorbar axes was added to the figure
    assert len(ax.figure.axes) == 2
    plt.close("all")


def test_spatial_on_existing_ax_and_errors(fitted_adata):
    _, ax0 = plt.subplots()
    ax = fd.pl.spatial(fitted_adata, color="type_0", ax=ax0, colorbar=False)
    assert ax is ax0
    with pytest.raises(KeyError, match="not a cell type"):
        fd.pl.spatial(fitted_adata, color="no_such_type")
    with pytest.raises(KeyError, match="missing_key"):
        fd.pl.spatial(fitted_adata, color="dominant", key="missing_key")
    with pytest.raises(KeyError, match="obsm"):
        fd.pl.composition(fitted_adata, key="missing_key")
    with pytest.raises(ValueError, match="coords"):
        fd.pl.spatial()
    plt.close("all")


def test_array_level_workflow(fitted_adata):
    """pl works without AnnData: coords + proportions arrays."""
    P = np.asarray(fitted_adata.obsm["flashdeconv"])
    names = list(fitted_adata.obsm["flashdeconv"].columns)
    coords = np.asarray(fitted_adata.obsm["spatial"], dtype=float)
    ax = fd.pl.spatial(
        coords=coords, proportions=P, cell_type_names=names,
    )
    assert sum(len(c.get_offsets()) for c in ax.collections) == P.shape[0]
    ax2 = fd.pl.spatial(
        coords=coords, proportions=P, cell_type_names=names,
        color=names[2],
    )
    np.testing.assert_allclose(
        np.asarray(ax2.collections[0].get_array()), P[:, 2], atol=1e-6
    )
    ax3 = fd.pl.composition(proportions=P)  # default type_i names
    assert len(ax3.patches) == P.shape[1]
    plt.close("all")


def test_composition(fitted_adata):
    ax = fd.pl.composition(fitted_adata)
    heights = sorted(
        (p.get_height() for p in ax.patches), reverse=True
    )
    P = np.asarray(fitted_adata.obsm["flashdeconv"])
    np.testing.assert_allclose(
        heights, sorted(P.mean(axis=0), reverse=True), atol=1e-6
    )
    # bars are drawn sorted descending
    drawn = [p.get_height() for p in ax.patches]
    assert drawn == sorted(drawn, reverse=True)
    plt.close("all")


def test_composition_color_sequence_follows_sort(fitted_adata):
    """A per-type color list must follow its bar through the mean sort —
    positional application would paint type B with type A's color."""
    import matplotlib.colors as mcolors

    P = np.asarray(fitted_adata.obsm["flashdeconv"])
    k = P.shape[1]
    palette = ["red", "green", "blue", "orange", "purple", "cyan"][:k]
    ax = fd.pl.composition(proportions=P, color=palette, sort=True)
    order = np.argsort(P.mean(axis=0))[::-1]
    for patch, src in zip(ax.patches, order):
        assert patch.get_facecolor() == mcolors.to_rgba(palette[src])
    # a single color string still applies to every bar
    ax2 = fd.pl.composition(proportions=P, color="red", sort=True)
    for patch in ax2.patches:
        assert patch.get_facecolor() == mcolors.to_rgba("red")
    plt.close("all")


def test_name_count_mismatch_raises(fitted_adata):
    P = np.asarray(fitted_adata.obsm["flashdeconv"])
    coords = np.asarray(fitted_adata.obsm["spatial"], dtype=float)
    with pytest.raises(ValueError, match="columns"):
        fd.pl.spatial(coords=coords, proportions=P,
                      cell_type_names=["a", "b"])
    with pytest.raises(ValueError, match="columns"):
        fd.pl.composition(proportions=P, cell_type_names=["a", "b"])
    plt.close("all")


def test_lambda_path_plot():
    rng = np.random.RandomState(1)
    results = [
        {
            "lambda": lam,
            "beta": np.maximum(rng.randn(50, 4) - lam, 0.0),
            "info": {"final_objective": 100.0 / (1 + lam),
                     "n_iterations": 5},
        }
        for lam in (0.01, 0.1, 1.0)
    ]
    ax = fd.pl.lambda_path(results)
    (line,) = ax.get_lines()
    np.testing.assert_allclose(
        line.get_ydata(), [100.0 / 1.01, 100.0 / 1.1, 50.0]
    )
    assert ax.get_xscale() == "log"
    plt.close("all")
