"""Multi-host execution helpers (TPU pod slices over DCN).

The reference is strictly single-process (SURVEY.md §2.3); this module is the
thin layer that takes the spot-sharded solve from one host's devices to a
full pod slice:

* :func:`initialize` — ``jax.distributed.initialize`` wrapper (idempotent).
* :func:`global_spot_mesh` — 1-D ``"spots"`` mesh over every device in the
  job, ordered host-major so that contiguous Morton blocks land on the same
  host's chips first (halo edges then ride ICI within a host and only shard
  boundaries cross DCN).
* :func:`host_spot_range` — which contiguous spot rows this process owns
  under a :class:`~flashdeconv_tpu.parallel.partition.ShardPlan`, so each
  host can load only its slice of Y from disk.

Usage on an N-host slice (same script on every host)::

    from flashdeconv_tpu.parallel import multihost, sharded_bcd_solve
    multihost.initialize()                       # TPU: auto-discovers peers
    mesh = multihost.global_spot_mesh()
    beta, info = sharded_bcd_solve(Y_sketch, X_sketch, A, coords=coords,
                                   mesh=mesh)

``sharded_bcd_solve`` builds its device operands with
``jax.make_array_from_callback``, so each process materializes only the
shards it owns; passing the full ``Y_sketch`` on every host is supported
(simplest), and passing per-host slices is the scalable path (see
``host_spot_range``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

_AXIS = "spots"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's distributed runtime (idempotent).

    On Cloud TPU pods all three arguments are auto-detected; on other
    platforms pass them explicitly. Must run before any JAX computation
    (anything that instantiates an XLA backend — including ``jax.devices()``
    — makes distributed initialization impossible): call this at program
    start.

    Intentionally does NOT touch ``jax.process_count()``/``jax.devices()``
    first — those would themselves initialize the backend and turn this call
    into a guaranteed failure.
    """
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        if "already initialized" in msg:
            return
        if "must be called before" in msg:
            if coordinator_address is None and num_processes in (None, 1):
                # Single-process convenience call after JAX is already in
                # use: nothing to set up. (On a pod this would be a late
                # call — warn so the silent-no-op trap is visible.)
                import warnings

                warnings.warn(
                    "multihost.initialize() called after the XLA backend "
                    "was created; distributed runtime not started. On a "
                    "multi-host pod, call initialize() before any other "
                    "JAX use.",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return
            raise RuntimeError(
                "jax.distributed must be initialized before any JAX "
                "computation; call flashdeconv_tpu.parallel.multihost."
                "initialize() at program start, before jax.devices() or "
                "any jit/device_put."
            ) from e
        raise


def global_spot_mesh() -> Mesh:
    """1-D mesh over all devices in the job, host-major order.

    ``jax.devices()`` already enumerates devices grouped by process; keeping
    that order means a contiguous block of shards maps to one host, so the
    Morton-contiguous partition puts most halo edges on intra-host ICI.
    """
    return Mesh(np.asarray(jax.devices()), (_AXIS,))


def allreduce_sums(*arrays: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Element-wise sum of small host arrays across all processes.

    Single-process: identity. Multi-process: one fused
    ``process_allgather`` over the concatenation (the arrays are O(n_genes)
    — a few hundred KB — so one DCN round trip covers the whole reduction).
    """
    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils

    flat = np.concatenate([np.asarray(a, np.float64).ravel() for a in arrays])
    summed = np.asarray(
        multihost_utils.process_allgather(flat)
    ).sum(axis=0)
    out = []
    offset = 0
    for a in arrays:
        n = np.asarray(a).size
        out.append(summed[offset : offset + n].reshape(np.shape(a)))
        offset += n
    return tuple(out)


def distributed_gene_moments(Y_local) -> Tuple[np.ndarray, np.ndarray]:
    """HVG moments over a spot-sharded sparse count matrix.

    Each host computes the additive log1p-CPM column sums for its own spot
    slice (O(local nnz), using the native kernel when available) and the
    sums are all-reduced — the full matrix never exists on any single host.
    The per-spot CPM scaling only needs each row's own library size, so the
    host-local pass is exact. Returns the same (means, variances) the
    single-host path produces for the concatenated matrix.
    """
    from flashdeconv_tpu.utils.genes import log1p_cpm_sums, moments_from_sums

    col_sum, col_sumsq = log1p_cpm_sums(Y_local)
    n_local = np.asarray([float(Y_local.shape[0])])
    col_sum, col_sumsq, n_total = allreduce_sums(col_sum, col_sumsq, n_local)
    return moments_from_sums(col_sum, col_sumsq, int(n_total[0]))


def distributed_select_informative_genes(
    Y_local,
    X: np.ndarray,
    n_hvg: int = 2000,
    n_markers_per_type: int = 50,
) -> Tuple[np.ndarray, np.ndarray]:
    """Multi-host :func:`~flashdeconv_tpu.utils.genes.select_informative_genes`.

    ``Y_local`` is this host's spot slice (see :func:`host_spot_range`); the
    reference ``X`` is replicated, so marker selection and leverage scores
    are computed identically on every host, and the HVG moments are the one
    cross-host reduction. Every host returns the same gene set.
    """
    from flashdeconv_tpu.utils.genes import (
        compute_leverage_scores,
        hvg_from_moments,
        select_markers,
    )

    means, variances = distributed_gene_moments(Y_local)
    hvg_idx = hvg_from_moments(means, variances, n_top=n_hvg)
    marker_idx, _ = select_markers(X, n_markers=n_markers_per_type)
    gene_idx = np.union1d(hvg_idx, marker_idx).astype(np.intp)
    if gene_idx.size == 0:
        raise ValueError(
            "No genes selected. Increase n_hvg or n_markers_per_type."
        )
    return gene_idx, compute_leverage_scores(X[:, gene_idx])


def host_spot_range(
    plan, mesh: Optional[Mesh] = None
) -> Tuple[int, int]:
    """[start, stop) of ordered-spot rows owned by this process.

    Parameters
    ----------
    plan : :class:`~flashdeconv_tpu.parallel.partition.ShardPlan`
        The plan the solve will run with (``plan.n_shards`` must equal
        ``mesh.devices.size``). Using the plan — not a recomputed
        ``ceil(n/S)`` — matters because the solver may pad ``shard_size``
        (e.g. to the Pallas block size on TPU).

    Ordered-spot space is the plan's permuted, padded layout; use
    ``plan.perm`` to map back to the caller's original spot indices.
    """
    if mesh is None:
        mesh = global_spot_mesh()
    if plan.n_shards != mesh.devices.size:
        raise ValueError(
            f"plan has {plan.n_shards} shards but mesh has "
            f"{mesh.devices.size} devices"
        )
    shard_size = plan.shard_size
    local = [
        i for i, d in enumerate(mesh.devices.ravel())
        if d.process_index == jax.process_index()
    ]
    if not local:
        return 0, 0
    return local[0] * shard_size, (local[-1] + 1) * shard_size
