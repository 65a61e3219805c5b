"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

All tests are CPU-runnable (no TPU needed): Pallas kernels run in interpret
mode, sharding tests use the 8 virtual host devices.

Note: the axon environment pins ``JAX_PLATFORMS=axon`` via sitecustomize, so
the env var alone is not enough — we must override through jax.config.
"""

import os

# XLA:CPU mmaps every loaded/cached executable; a full suite (hundreds of
# compiled programs + ~250 extension modules) can exhaust the default
# vm.max_map_count (65530), which surfaced as NONDETERMINISTIC segfaults
# inside the jax compile-cache read/write late in single-process runs
# (r4: three crashes at ~93%, different tests; green after raising it).
# Best-effort bump — this environment runs as root; harmless otherwise.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _cur = int(_f.read())
    if _cur < 1048576:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("1048576")
except (OSError, ValueError):
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the suite is dominated by XLA compiles on
# this single-core VM; repeat runs hit the cache instead. The directory is
# fingerprinted per host CPU (utils/compile_cache): XLA:CPU AOT artifacts
# from a DIFFERENT physical host segfaulted the r4 suite when the shared
# home directory carried them across machines.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from rwkv_tts_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache("cpu")
