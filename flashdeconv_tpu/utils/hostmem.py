"""Host-memory hygiene for atlas-scale pipelines.

The O(nnz) host stages allocate multi-GB temporaries (gene subset, the
normalized copy, the N x d sketch). On bare metal that is free; on
virtualized/overcommitted hosts the *first touch* of fresh anonymous memory
can fault at well under 100 MB/s from a single thread — measured on one
such VM: 4 GB took 127 s to fault single-threaded and 0.65 s from four
threads. Two consequences:

* the native kernels fault their outputs from all worker threads
  (:func:`flashdeconv_tpu.native.zero_fill`, per-block memsets);
* this module lets a pipeline pre-fault its heap ONCE so numpy's
  intermediate allocations recycle already-faulted pages instead of paying
  the fault tax per stage.

:func:`reserve_host_arena` does that by (a) telling glibc to serve large
allocations from the persistent brk heap instead of transient mmaps
(``mallopt(M_MMAP_MAX, 0)``) and never to trim the heap back
(``M_TRIM_THRESHOLD``), then (b) allocating and parallel-faulting an arena
of the requested size and freeing it — the pages stay resident in the
allocator's free list for every later numpy temporary.

This changes process-global allocator behavior, so it is OPT-IN: the
benchmarks call it at startup; the library never does implicitly.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import sys

import numpy as np

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4

_reserved_bytes = 0


def reserve_host_arena(gigabytes: float) -> bool:
    """Pre-fault ``gigabytes`` of heap for reuse by later big allocations.

    Returns True on success; False when glibc's ``mallopt`` is unavailable
    (non-glibc platforms) — harmless, everything still works at the
    default fault cost. Idempotent for sizes already reserved.
    """
    global _reserved_bytes
    n = int(gigabytes * (1 << 30))
    if n <= _reserved_bytes:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
        mallopt = libc.mallopt
    except (OSError, AttributeError):
        return False

    # Serve big allocations from brk (persistent) rather than mmap
    # (returned to the kernel on free, re-faulted on the next stage), and
    # never trim the heap back.
    mallopt(ctypes.c_int(_M_MMAP_MAX), ctypes.c_int(0))
    mallopt(ctypes.c_int(_M_MMAP_THRESHOLD), ctypes.c_int(2**31 - 1))
    mallopt(ctypes.c_int(_M_TRIM_THRESHOLD), ctypes.c_int(2**31 - 1))

    from flashdeconv_tpu import native

    arena = np.empty(n, dtype=np.uint8)
    if not native.zero_fill(arena):
        arena.fill(0)  # single-threaded fallback still pre-faults
    del arena  # pages stay in glibc's free list, already faulted
    _reserved_bytes = n
    return True
