"""Core pipeline: orchestrator, sketching, spatial regularization, solver."""

from flashdeconv_tpu.core.deconv import FlashDeconv, preprocess_data
from flashdeconv_tpu.core.sketching import (
    CountSketchOp,
    build_countsketch_matrix,
    build_sparse_rademacher_matrix,
    make_countsketch_op,
    project_to_sketch,
    sketch_data,
)
from flashdeconv_tpu.core.solver import (
    BCDProblem,
    bcd_solve,
    compute_objective,
    normalize_proportions,
    precompute_XtY,
    precompute_gram_matrix,
    prepare_bcd,
    soft_threshold,
)
from flashdeconv_tpu.core.spatial import (
    auto_tune_lambda,
    compute_degree_matrix,
    compute_laplacian,
    compute_laplacian_quadratic,
    get_neighbor_counts,
    get_neighbor_indices,
)

__all__ = [
    "FlashDeconv",
    "preprocess_data",
    "CountSketchOp",
    "make_countsketch_op",
    "build_countsketch_matrix",
    "build_sparse_rademacher_matrix",
    "project_to_sketch",
    "sketch_data",
    "BCDProblem",
    "bcd_solve",
    "prepare_bcd",
    "compute_objective",
    "normalize_proportions",
    "precompute_XtY",
    "precompute_gram_matrix",
    "soft_threshold",
    "auto_tune_lambda",
    "compute_degree_matrix",
    "compute_laplacian",
    "compute_laplacian_quadratic",
    "get_neighbor_counts",
    "get_neighbor_indices",
]
