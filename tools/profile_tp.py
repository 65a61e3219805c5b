"""Tensor-parallel decode-step profiler: measure what TP actually buys.

Times, at the flagship shape (32L x 2048E):

  * single-device step (rwkv7.step, unfused layout)  — the TP baseline
  * step_tp over a (data=1, model=tp) mesh           — per-step wall incl.
                                                       the 2L psums + head
  * a psum-only microprogram at the step's collective schedule — isolates
    the ICI cost from the compute win

On a real v5e slice this validates the docs/PERF.md projection
(TP=4: ~3.6/4 weight-load + ~0.1-0.2 ms ICI => ~3.2 ms/step). On this
repo's single-chip environment it can only run the virtual CPU mesh
(functional smoke, meaningless timings) — run it on a slice when one is
available.

Usage:  python tools/profile_tp.py [tp] [batch] [steps] [--cpu]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.ops.quant import quantize_rwkv_params
from rwkv_tts_tpu.parallel import mesh as meshlib
from rwkv_tts_tpu.parallel import tp as tplib

TP = int(sys.argv[1]) if len(sys.argv) > 1 else 2
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 64


def bench(fn, *args, steps=STEPS):
    out = fn(*args)                      # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3, out


def main():
    n_dev = len(jax.devices())
    if n_dev < TP:
        raise SystemExit(f"need >= {TP} devices, have {n_dev} "
                         f"(pass --cpu with XLA_FLAGS="
                         f"--xla_force_host_platform_device_count=N "
                         f"for a functional smoke)")
    small = jax.default_backend() != "tpu"
    cfg = (RwkvConfig(n_layer=2, n_embd=256, head_size=64, vocab_size=1000,
                      padded_vocab_size=1024, dtype="float32",
                      param_dtype="float32")
           if small else RwkvConfig(n_layer=32, n_embd=2048, head_size=64))
    print(f"devices={n_dev} tp={TP} batch={B} shape={cfg.n_layer}x{cfg.n_embd}"
          f" backend={jax.default_backend()}")

    params = rwkv7.init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_rwkv_params(params, kind="int8") if not small else params
    tok = jnp.zeros((B,), jnp.int32) + 5

    # baseline: single-device step (unfused, same layout class as TP)
    st = rwkv7.init_state(cfg, B)
    ms, _ = bench(lambda: rwkv7.step(qp, tok, st, cfg, head_slice=min(
        8320, cfg.padded_vocab_size)))
    print(f"single-device step        {ms:8.3f} ms")

    m = meshlib.make_mesh(TP, model_parallel=TP)       # data=1 x model=tp
    sp = tplib.shard_params_tp(m, qp)
    sst = tplib.shard_state_tp(m, rwkv7.init_state(cfg, B))
    ms, _ = bench(lambda: tplib.step_tp(sp, tok, sst, cfg, m, head_slice=min(
        8320, cfg.padded_vocab_size)))
    print(f"step_tp (model={TP})       {ms:8.3f} ms")

    # ICI-only: the step's collective schedule (2 psums/layer of [B, C])
    from jax.sharding import PartitionSpec as P

    x = jnp.zeros((B, cfg.n_embd), jnp.float32)

    def psums_only(x):
        def body(x, _):
            x = jax.lax.psum(x * 1.000001, meshlib.MODEL_AXIS)
            x = jax.lax.psum(x * 1.000001, meshlib.MODEL_AXIS)
            return x, None
        x, _ = jax.lax.scan(body, x, None, length=cfg.n_layer)
        return x

    f = jax.jit(jax.shard_map(psums_only, mesh=m, in_specs=P(),
                              out_specs=P(), check_vma=False))
    ms, _ = bench(f, x)
    print(f"collective schedule only  {ms:8.3f} ms ({2 * cfg.n_layer} psums)")


if __name__ == "__main__":
    main()
