"""Structured per-stage timing + optional JAX profiler trace hooks.

The reference has no tracing/profiling subsystem (SURVEY.md §5: bare prints
under ``verbose``); this is the TPU-native observability layer. A
:class:`StageTimer` collects wall-clock per pipeline stage into a plain dict
(surfaced as ``FlashDeconv.timings_``), and :func:`trace` wraps a block in a
``jax.profiler`` trace when a trace directory is configured — viewable in
TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional


class StageTimer:
    """Collects named wall-clock stage timings.

    Usage::

        timer = StageTimer()
        with timer.stage("sketch"):
            ...
        timer.timings  # {"sketch": 0.42, ...}
    """

    def __init__(self) -> None:
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    @property
    def total(self) -> float:
        return sum(self.timings.values())

    def report(self) -> str:
        """Aligned multi-line report, slowest stage first."""
        if not self.timings:
            return "(no stages timed)"
        width = max(len(k) for k in self.timings)
        lines = [
            f"  {name:<{width}}  {secs:8.3f}s  ({100 * secs / max(self.total, 1e-12):5.1f}%)"
            for name, secs in sorted(
                self.timings.items(), key=lambda kv: -kv[1]
            )
        ]
        return "\n".join(lines + [f"  {'total':<{width}}  {self.total:8.3f}s"])


def fused_sweep_timer(carry, Xty_t, XtX, masks, inv_den_t, lam, rho,
                      offsets, h, block,
                      rest_touched=None, rest_slots=None):
    """Build ``timed(n) -> seconds`` for n PRODUCTION fused banded sweeps.

    The honest on-device measurement protocol (see
    docs/performance_guide.md "Measuring the sweep"): the n sweeps run
    inside ONE compiled ``fori_loop`` — exactly how
    ``ops.bcd.fused_solve_program`` runs them, including the compact
    rest-edge refresh when the decomposition spilled any bands — and
    completion is forced by a scalar value fetch (``block_until_ready``
    can return early in one observed runtime mode). Time a short and a
    long loop and divide the difference (:func:`fori_difference_windows`)
    to cancel RTT + fetch + launch overhead. Chained per-sweep dispatch
    timing carries ~1 ms/sweep of tunnel command latency on a
    remote-attached chip — do not use it.

    Every call returns a fresh jitted closure (fresh trace identity), so
    A/B harnesses that monkeypatch kernel internals (e.g.
    ``benchmarks/sweep_ablation.py`` swapping ``ops.bcd.gs_pass``) get
    the swapped code traced in. Operands are passed as jit *arguments*,
    not closure constants — closing over 100s-of-MB arrays embeds them in
    the compile request, which a remote compile endpoint rejects
    (HTTP 413).
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from flashdeconv_tpu.ops import bcd

    has_rest = rest_touched is not None
    nsr0 = jnp.zeros_like(Xty_t) if has_rest else None

    @partial(jax.jit, static_argnums=(10,))
    def nsweeps(c, xty_t, xtx, mks, inv_t, nsr, tch, slt, la, rh, n):
        def body(_i, state):
            cc, nsr_c = state
            if has_rest:
                nsr_c = bcd.rest_ns_update(nsr_c, cc, tch, slt)
            c2, _d, _a = bcd.fused_banded_sweep(
                cc, xty_t, xtx, mks, inv_t, la, rh, offsets, h,
                block=block, ns_rest_t=nsr_c if has_rest else None,
            )
            return (c2, nsr_c)

        return jax.lax.fori_loop(0, n, body, (c, nsr))[0]

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        float(jax.device_get(
            nsweeps(carry, Xty_t, XtX, masks, inv_den_t, nsr0,
                    rest_touched, rest_slots, lam, rho, n)[0, 0]
        ))
        return time.perf_counter() - t0

    return timed


def fori_difference_windows(timed, n_short: int = 5, n_long: int = 30,
                            windows: int = 12) -> list:
    """Run the short/long fori-difference protocol; per-sweep seconds.

    Warms/compiles both loop lengths first, then alternates short and
    long timed runs, returning ``windows`` POSITIVE per-sweep
    differences ``(t_long - t_short) / (n_long - n_short)``. A tunnel
    stall landing on the short run makes a window non-positive; such
    windows are DISCARDED and resampled (clamping them to 0 would let
    ``min(windows)`` report a physically-impossible 0.0 as kernel
    truth), up to a 2x retry budget — if nothing positive survives even
    that, the tunnel is wedged and this raises rather than fabricating
    a number. Report the min AND the median: if they disagree by >15%
    the tunnel/scheduler is noisy — rerun. Sanity-check every reading
    against the streaming floor (bytes-per-sweep / HBM bandwidth)
    before trusting it.
    """
    timed(n_short)
    timed(n_long)
    out = []
    attempts = 0
    max_attempts = 2 * windows + 4
    while len(out) < windows and attempts < max_attempts:
        attempts += 1
        t_short = timed(n_short)
        t_long = timed(n_long)
        diff = (t_long - t_short) / (n_long - n_short)
        if diff > 0.0:
            out.append(diff)
    if not out:
        raise RuntimeError(
            f"all {attempts} timing windows were non-positive — the "
            "device/tunnel is stalled; rerun the measurement"
        )
    return out


def fused_sweep_timer_for(problem, lambda_: float, rho: float):
    """:func:`fused_sweep_timer` wired from a prepared ``BCDProblem``.

    Builds the zero fused carry, the per-solve ``gs_inv_den`` stream and
    the scaled rho exactly as ``BCDProblem.solve`` does, so the timed
    loop is the production sweep of THAT problem — the benchmarks'
    shared operand-prep (bench.py / largek_probe.py) lives here so a
    carry-layout or denominator-convention change cannot drift between
    them. Requires ``problem.use_fused_banded``.
    """
    import jax.numpy as jnp

    from flashdeconv_tpu.ops.bcd import gs_inv_den, to_fused_carry

    if not getattr(problem, "use_fused_banded", False):
        raise ValueError("problem does not run the fused banded kernel")
    lam = jnp.float32(lambda_)
    rho_eff = jnp.float32(rho * problem.mean_diag)
    carry = to_fused_carry(
        jnp.zeros((problem.n_solve, problem.n_types), jnp.float32),
        problem.h_blocks, problem.fused_block,
    )
    inv_den_t = gs_inv_den(problem.XtX_d, problem.nnb_d, lam)
    return fused_sweep_timer(
        carry, problem.Xty_t_d, problem.XtX_d, problem.masks_d,
        inv_den_t, lam, rho_eff, problem.offsets, problem.h_blocks,
        problem.fused_block,
        rest_touched=problem.rest_touched_d,
        rest_slots=problem.rest_slots_d,
    )


@contextlib.contextmanager
def trace(name: str, trace_dir: Optional[str] = None) -> Iterator[None]:
    """Wrap a block in a ``jax.profiler`` trace when tracing is enabled.

    Tracing is enabled by passing ``trace_dir`` or setting the
    ``FLASHDECONV_TRACE_DIR`` environment variable; otherwise this is a
    zero-overhead no-op. Traces are written one subdirectory per ``name``.
    """
    trace_dir = trace_dir or os.environ.get("FLASHDECONV_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
