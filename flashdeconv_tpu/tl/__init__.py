"""Scanpy-style tools namespace."""

from flashdeconv_tpu.tl._deconvolve import deconvolve

__all__ = ["deconvolve"]
