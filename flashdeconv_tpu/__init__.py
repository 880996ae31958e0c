"""flashdeconv-tpu: TPU-native spatial transcriptomics deconvolution.

A from-scratch JAX/XLA/Pallas reimplementation of the FlashDeconv method —
leverage-weighted CountSketch gene compression, sparse spatial-graph
Laplacian smoothing, and a graph-regularized NNLS solve via block coordinate
descent — designed for single-chip-to-pod-scale TPU execution
(spot-sharded ``shard_map`` BCD with halo exchange; see
:mod:`flashdeconv_tpu.parallel`).

Quick start (array API)::

    from flashdeconv_tpu import FlashDeconv
    model = FlashDeconv(sketch_dim=512)
    proportions = model.fit_transform(Y, X, coords)   # (n_spots, n_types)

Quick start (scanpy-style API)::

    import flashdeconv_tpu as fd
    fd.tl.deconvolve(adata_st, adata_ref, cell_type_key="cell_type")
    adata_st.obsm["flashdeconv"]                       # proportions
"""

__version__ = "0.1.0"

from flashdeconv_tpu.core.deconv import FlashDeconv
from flashdeconv_tpu import tl

__all__ = ["FlashDeconv", "tl", "__version__"]
