"""Shared solve-tail for the prepared sharded problems.

Both strategies (:class:`~flashdeconv_tpu.parallel.gspmd.GspmdBandedProblem`
and :class:`~flashdeconv_tpu.parallel.solver.HaloShardedProblem`) end a
solve the same way: dispatch the fused loop (verbose-chunked or single
call), bundle the convergence/objective scalars — and, on single-process
meshes, beta — into one device round trip, gather beta across hosts on
multi-process meshes, and assemble the info dict. That protocol lives here
ONCE so a fix to the multi-process fetch path cannot diverge between the
two strategies.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def put_addressable(arr, sharding):
    """Device-put via ``make_array_from_callback`` so each process
    materializes only its addressable shards — works identically on one
    host and across a multi-host mesh (parallel/multihost.py)."""
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def validate_beta_init(beta_init, n_spots: int, n_types: int) -> None:
    if beta_init is not None and beta_init.shape != (n_spots, n_types):
        raise ValueError(
            f"beta_init shape {beta_init.shape} does not match "
            f"({n_spots}, {n_types})"
        )


def device_unpermute(obj, beta_d, perm, n_spots: int):
    """Device-side inverse of a spot permutation: one gather, no host copy.

    The int32 inverse-permutation index array is built once and cached on
    ``obj._inv_perm_d`` (the prepared problems are long-lived; re-solves
    reuse it). ONE home for the un-permute so a fix (index dtype,
    non-fully-addressable gathers) cannot diverge between the halo and
    strategy-wrapper paths.
    """
    if getattr(obj, "_inv_perm_d", None) is None:
        inv = np.empty(n_spots, dtype=np.int32)
        inv[perm] = np.arange(n_spots, dtype=np.int32)
        obj._inv_perm_d = jnp.asarray(inv)
    return jnp.take(beta_d, obj._inv_perm_d, axis=0)


def run_prepared_solve(
    run_chunk: Callable,
    eval_objective: Callable,
    beta0_d,
    max_iter: int,
    tol: float,
    verbose: bool,
    return_device: bool = False,
) -> Tuple[np.ndarray, int, float, float, bool, list]:
    """Run the fused loop and fetch results.

    Returns ``(beta_pad, n_iter, rel_change, final_obj, converged,
    objectives)`` where ``beta_pad`` is the full padded beta as a host
    float64 array (gathered across processes on a multi-host mesh) — or,
    with ``return_device=True``, the (possibly sharded) device array in
    the solve dtype: only the three convergence/objective scalars cross
    the interconnect, which at atlas scale removes the dominant (N, K)
    transfer for device-side consumers.
    """
    objectives: list = []
    beta_pad = None
    if verbose:
        from flashdeconv_tpu.ops.bcd import chunked_verbose_solve

        beta_d, n_iter, rel_change, converged, objectives = (
            chunked_verbose_solve(
                run_chunk, eval_objective, beta0_d, max_iter, tol
            )
        )
        final_obj = objectives[-1]
    else:
        beta_d, n_iter_d, rel_d = run_chunk(
            beta0_d, jnp.asarray(max_iter, dtype=jnp.int32)
        )
        # Device objective, async-dispatched behind the solve; one bundled
        # fetch for all three scalars (no host (K, N) matmul / Laplacian).
        # Single-process host-fetch solves bundle beta into the same round
        # trip.
        obj_d = eval_objective(beta_d)
        if return_device or jax.process_count() > 1:
            n_iter_h, rel_h, obj_h = jax.device_get((n_iter_d, rel_d, obj_d))
        else:
            n_iter_h, rel_h, obj_h, beta_pad = jax.device_get(
                (n_iter_d, rel_d, obj_d, beta_d)
            )
        n_iter = int(n_iter_h)
        rel_change = float(rel_h)
        final_obj = float(obj_h)
        converged = rel_change < tol

    if return_device:
        return (
            beta_d, int(n_iter), float(rel_change), float(final_obj),
            bool(converged), objectives,
        )
    if jax.process_count() > 1:
        # Global array spans non-addressable devices: gather across hosts.
        from jax.experimental import multihost_utils

        beta_pad = multihost_utils.process_allgather(beta_d, tiled=True)
    elif beta_pad is None:  # verbose path fetched scalars separately
        beta_pad = np.asarray(beta_d)
    beta_pad = np.asarray(beta_pad, dtype=np.float64)
    return (
        beta_pad, int(n_iter), float(rel_change), float(final_obj),
        bool(converged), objectives,
    )
