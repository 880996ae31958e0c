"""Cross-cutting utilities: genes, graphs, metrics, RNG."""

from flashdeconv_tpu.utils.genes import (
    compute_leverage_scores,
    select_hvg,
    select_informative_genes,
    select_markers,
)
from flashdeconv_tpu.utils.graph import (
    banded_split,
    adjacency_to_padded,
    build_grid_graph,
    build_knn_graph,
    build_radius_graph,
    coords_to_adjacency,
    get_neighbor_counts,
    get_neighbor_indices,
)
from flashdeconv_tpu.utils.metrics import (
    compute_correlation,
    compute_jsd,
    compute_mae,
    compute_rare_cell_detection,
    compute_rmse,
    evaluate_deconvolution,
)
from flashdeconv_tpu.utils.random import as_jax_key, check_random_state

__all__ = [
    "select_hvg",
    "select_markers",
    "compute_leverage_scores",
    "select_informative_genes",
    "build_knn_graph",
    "build_radius_graph",
    "build_grid_graph",
    "coords_to_adjacency",
    "adjacency_to_padded",
    "banded_split",
    "get_neighbor_counts",
    "get_neighbor_indices",
    "compute_rmse",
    "compute_mae",
    "compute_correlation",
    "compute_jsd",
    "evaluate_deconvolution",
    "compute_rare_cell_detection",
    "check_random_state",
    "as_jax_key",
]
