"""Scanpy-style plotting layer (matplotlib optional dependency).

An extension beyond the reference package (which has no plotting module;
its tutorials hand-build the same figures — reference
``examples/spatial_deconvolution_tutorial.ipynb``).
"""

from flashdeconv_tpu.pl._plots import composition, lambda_path, spatial

__all__ = ["spatial", "composition", "lambda_path"]
