"""Device compute kernels (XLA + Pallas)."""

from flashdeconv_tpu.ops.bcd import (
    bcd_iterate,
    bcd_sweep,
    coordinate_descent,
    neighbor_sum,
    objective_terms,
    soft_threshold,
)

__all__ = [
    "bcd_sweep",
    "bcd_iterate",
    "coordinate_descent",
    "neighbor_sum",
    "objective_terms",
    "soft_threshold",
]
