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

__version__ = "0.5.0"

import os as _os


def _setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache (opt out via env).

    Each (n_spots, K, max_deg) shape triple compiles its own solver
    executable; on remote-attached TPUs that compile costs tens of seconds.
    The persistent cache makes it a one-time cost per machine. Respects an
    existing ``JAX_COMPILATION_CACHE_DIR``; disable with
    ``FLASHDECONV_NO_COMPILE_CACHE=1``.
    """
    if _os.environ.get("FLASHDECONV_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = _os.path.join(
                _os.path.expanduser("~"), ".cache", "flashdeconv-tpu", "xla"
            )
            _os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()

from flashdeconv_tpu.core.deconv import FlashDeconv
from flashdeconv_tpu import pl, tl

__all__ = ["FlashDeconv", "tl", "pl", "__version__"]
