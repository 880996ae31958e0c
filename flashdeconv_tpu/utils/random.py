"""Random-state handling for flashdeconv-tpu.

Two RNG worlds coexist in this framework:

* **Host-side sketch construction** uses ``numpy.random.RandomState`` (MT19937)
  so that, for a given integer seed, the CountSketch operator (bucket
  assignments, signs, amplitudes) is drawn in exactly the same order as the
  reference implementation (cf. reference ``flashdeconv/utils/random.py:16-71``
  and ``flashdeconv/core/sketching.py:58-59``). This gives bit-level parity of
  the sketching operator with the reference for equal seeds.
* **On-device randomness** (none is needed in the core pipeline today) would
  use ``jax.random`` keys; :func:`as_jax_key` provides the bridge.
"""

from __future__ import annotations

from typing import Union

import numpy as np

RandomStateLike = Union[None, int, np.random.RandomState]


def check_random_state(seed: RandomStateLike) -> np.random.RandomState:
    """Coerce ``seed`` into a ``numpy.random.RandomState`` (sklearn convention).

    Parameters
    ----------
    seed : None, int, or numpy.random.RandomState
        ``None`` returns the global numpy RandomState singleton; an int seeds a
        fresh ``RandomState``; an existing ``RandomState`` passes through.

    Returns
    -------
    numpy.random.RandomState
    """
    if seed is None or seed is np.random:
        return np.random.mtrand._rand
    if isinstance(seed, (int, np.integer)):
        return np.random.RandomState(int(seed))
    if isinstance(seed, np.random.RandomState):
        return seed
    raise ValueError(
        f"{seed!r} cannot be used to seed a numpy.random.RandomState instance. "
        f"Expected None, int, or np.random.RandomState, got {type(seed)}."
    )


def as_jax_key(seed: RandomStateLike):
    """Derive a ``jax.random`` key from a host seed specification.

    For ``None`` or a ``RandomState``, a fresh 32-bit seed is drawn from the
    host RNG (non-reproducible for ``None``, stream-consistent for a
    ``RandomState``); for an int the key is seeded directly.
    """
    import jax

    if isinstance(seed, (int, np.integer)):
        return jax.random.key(int(seed))
    rng = check_random_state(seed)
    return jax.random.key(int(rng.randint(0, 2**31 - 1)))
