"""NumPy-backed parameter initialization helpers.

``jax.random.normal``/``jnp.zeros`` compile one XLA program per distinct
shape; a model init touches dozens of shapes, which costs ~0.5–1 s *each*
through a remote TPU tunnel (and noticeable time even on CPU). Random init
is only used when real checkpoints are absent, so we generate with NumPy on
host and transfer — zero compiles, deterministic in the key.
"""

from __future__ import annotations

import numpy as np


def key_seed(key) -> int:
    """Stable integer seed from a JAX PRNG key (old- or new-style).

    Deliberately avoids ``jax.random.key_data`` — it dispatches a device
    program (hundreds of seconds through a remote TPU tunnel). Old-style
    keys are plain uint32 arrays; typed keys expose their data via the
    ``_base_array``/unwrap path only when needed.
    """
    arr = np.asarray(key) if not hasattr(key, "dtype") or key.dtype.kind in "ui" \
        else None
    if arr is None:
        import jax
        arr = np.asarray(jax.random.key_data(key))
    arr = arr.ravel()
    return (int(arr[-1]) ^ (int(arr[0]) << 1)) & 0x7FFFFFFF


def raw_threefry_key(seed: int) -> np.ndarray:
    """Host-side construction of an old-style threefry2x32 key — exactly
    what ``jax.random.PRNGKey(seed)`` produces under the default
    x64-disabled config (seed truncated to 32 bits, high word zero) —
    without any device dispatch."""
    return np.array([0, int(seed) & 0xFFFFFFFF], np.uint32)


class Initializer:
    """Deterministic stream of init arrays, host-side."""

    def __init__(self, key):
        self._rng = np.random.default_rng(key_seed(key))

    def normal(self, shape, scale=1.0, dtype=np.float32):
        return (self._rng.standard_normal(shape) * scale).astype(dtype)

    @staticmethod
    def zeros(shape, dtype=np.float32):
        return np.zeros(shape, dtype)

    @staticmethod
    def ones(shape, dtype=np.float32):
        return np.ones(shape, dtype)

    @staticmethod
    def full(shape, value, dtype=np.float32):
        return np.full(shape, value, dtype)
