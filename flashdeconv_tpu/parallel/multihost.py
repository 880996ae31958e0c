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
    """Initialize JAX's distributed runtime (no-op if already initialized).

    On Cloud TPU pods all three arguments are auto-detected; on other
    platforms pass them explicitly.
    """
    if jax.process_count() > 1 or getattr(
        jax.distributed, "is_initialized", lambda: False
    )():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        # Benign no-op cases: runtime already initialized, or an XLA backend
        # already exists in this (single-process) interpreter session.
        if ("already initialized" not in msg
                and "must be called before" not in msg):
            raise


def global_spot_mesh() -> Mesh:
    """1-D mesh over all devices in the job, host-major order.

    ``jax.devices()`` already enumerates devices grouped by process; keeping
    that order means a contiguous block of shards maps to one host, so the
    Morton-contiguous partition puts most halo edges on intra-host ICI.
    """
    return Mesh(np.asarray(jax.devices()), (_AXIS,))


def host_spot_range(
    n_spots: int, mesh: Optional[Mesh] = None
) -> Tuple[int, int]:
    """[start, stop) of ordered-spot rows owned by this process.

    Ordered-spot space is the Morton-permuted, padded layout of a
    :class:`~flashdeconv_tpu.parallel.partition.ShardPlan` built with
    ``n_shards = mesh.devices.size``; use ``plan.perm`` to map back to the
    caller's original spot indices.
    """
    if mesh is None:
        mesh = global_spot_mesh()
    n_shards = mesh.devices.size
    shard_size = -(-n_spots // n_shards)
    local = [
        i for i, d in enumerate(mesh.devices.ravel())
        if d.process_index == jax.process_index()
    ]
    if not local:
        return 0, 0
    return local[0] * shard_size, (local[-1] + 1) * shard_size
