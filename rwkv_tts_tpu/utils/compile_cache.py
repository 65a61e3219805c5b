"""Persistent-compile-cache location, fingerprinted per host for CPU.

XLA:CPU serializes AOT executables with the COMPILE machine's CPU feature
set; loading one on a host with different features is undefined (the
loader warns "could lead to execution errors such as SIGILL", and an
r4 full-suite run segfaulted inside the cache read after the cache
directory had been populated on a different physical host — this repo's
home directory persists across machines). TPU/axon executables don't
have this problem (they target the accelerator, not the host), so only
CPU cache paths get the fingerprint suffix.
"""

from __future__ import annotations

import hashlib
import os

_BASE = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax"))


def _host_fingerprint() -> str:
    """Hash of the CPU *model* line AND the feature-flags line. Flags
    alone are not enough: XLA:CPU bakes model-dependent tuning features
    into AOT artifacts (e.g. ``prefer-no-scatter``/``prefer-no-gather``,
    chosen per microarchitecture), so two hosts with identical ISA flag
    strings can still produce mutually foreign executables — observed r5
    as cpu_aot_loader "machine type doesn't match" errors under the
    flags-only fingerprint."""
    model = flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith(("model name", "Hardware",
                                                  "Processor")):
                    model = line
                elif not flags and line.startswith(("flags", "Features")):
                    flags = line
                if model and flags:
                    break
    except OSError:
        pass
    if not (model or flags):
        return "generic"
    return hashlib.sha1((model + flags).encode()).hexdigest()[:12]


def cache_dir(platform: str | None = None) -> str:
    """Cache dir for the given jax platform (default: whatever is
    pinned via env). CPU gets a per-host-CPU suffix; accelerators share
    the base dir."""
    plat = (platform or os.environ.get("RWKV_TTS_PLATFORM")
            or os.environ.get("JAX_PLATFORMS") or "").lower()
    if plat.startswith("cpu"):
        return f"{_BASE}-cpu-{_host_fingerprint()}"
    return _BASE


def enable(platform: str | None = None) -> str:
    """Point jax at the right persistent cache; returns the dir."""
    import jax

    plat = (platform or os.environ.get("RWKV_TTS_PLATFORM")
            or os.environ.get("JAX_PLATFORMS") or "")
    if not plat:
        # no env pin: a process can still land on XLA:CPU by default (no
        # TPU visible), which must get the per-host fingerprint or the
        # cross-host AOT SIGILL this module exists to prevent comes back
        # (r4 advisor finding). default_backend() initializes the backend,
        # which every enable() caller does moments later anyway.
        try:
            plat = jax.default_backend()
        except Exception:  # pragma: no cover — backend init failure
            plat = "cpu"   # conservative: fingerprinted dir is always safe
    d = cache_dir(plat)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — older jax without the knobs
        pass
    return d
