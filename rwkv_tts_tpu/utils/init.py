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
    kind = getattr(getattr(key, "dtype", None), "kind", None)
    if kind in ("u", "i") or not hasattr(key, "dtype"):
        arr = np.asarray(key)
    else:
        # typed key (dtype KeyTy has no .kind): unwrap via key_data — the
        # one-time device dispatch is unavoidable for this key style
        import jax
        arr = np.asarray(jax.random.key_data(key))
    arr = arr.ravel()
    # full 64-bit combine: the old 31-bit mask aliased distinct keys
    # (PRNGKey(0) vs PRNGKey(2**31)) onto one init stream. For the common
    # PRNGKey(s < 2**31) — [0, s] — this still returns s, so seeded init
    # streams (goldens, tests) are unchanged.
    return (int(arr[0]) << 32) | int(arr[-1])


def raw_threefry_key(seed: int) -> np.ndarray:
    """Host-side construction of an old-style threefry2x32 key — exactly
    what ``jax.random.PRNGKey(seed)`` produces under the default
    x64-disabled config (seed truncated to 32 bits, high word zero) —
    without any device dispatch."""
    return np.array([0, int(seed) & 0xFFFFFFFF], np.uint32)


class DeviceInitializer:
    """Init-array stream materialized on device — for use INSIDE a single
    jitted builder program.

    Per-tensor eager ``jax.random.normal`` costs one compile + dispatch per
    shape through the axon tunnel (the reason Initializer exists), and
    host-side generation of a flagship-sized pytree costs 10+ minutes of
    single-core numpy + a multi-GB tunnel transfer. Tracing THIS under one
    ``jax.jit`` gets both: one compile, zero host↔device traffic, params
    born on the chip. Keys derive from fold_in on a call counter, so the
    stream is deterministic in the base key (but distinct from
    Initializer's numpy stream).
    """

    def __init__(self, key):
        import jax
        self._key = key
        self._n = 0

    def normal(self, shape, scale=1.0, dtype=None):
        import jax
        import jax.numpy as jnp
        self._n += 1
        k = jax.random.fold_in(self._key, self._n)
        x = jax.random.normal(k, shape, dtype=jnp.float32) * scale
        return x if dtype is None else x.astype(dtype)

    @staticmethod
    def zeros(shape, dtype=np.float32):
        import jax.numpy as jnp
        return jnp.zeros(shape, dtype)

    @staticmethod
    def ones(shape, dtype=np.float32):
        import jax.numpy as jnp
        return jnp.ones(shape, dtype)

    @staticmethod
    def full(shape, value, dtype=np.float32):
        import jax.numpy as jnp
        return jnp.full(shape, value, dtype)


class Initializer:
    """Deterministic stream of init arrays, host-side.

    ``fast=True`` generates normals directly in float32 (no float64
    intermediate) — a different (still deterministic) stream, ~2× faster
    and half the memory traffic. The build VM has ONE core and a flagship
    init touches ~2 GB, so benches/profilers opt in; anything with golden
    fixtures keeps the default stream.
    """

    def __init__(self, key, fast: bool = False):
        self._rng = np.random.default_rng(key_seed(key))
        self._fast = fast

    def normal(self, shape, scale=1.0, dtype=np.float32):
        if self._fast:
            x = self._rng.standard_normal(shape, dtype=np.float32)
            x *= np.float32(scale)
            return x if dtype == np.float32 else x.astype(dtype)
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
