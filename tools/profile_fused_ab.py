"""A/B the decode step's projection layout at the THROUGHPUT batch.

fuse_params (models/rwkv7.py) folds token-shift into the matmuls by
stacking [W; diag(mu)W] — halving the decode launch count but DOUBLING
the r/k/v + LoRA-A weight bytes AND MACs (zrkv is [2C, 3C] vs 3×[C, C]).
That trade was measured a win for batch-8 serving (weight-PIPE-bound:
launches dominate), but at batch 128 the step is MXU/HBM-bound where the
doubling costs real milliseconds (VERDICT r3 weak #5: ~35% headroom on
the batch-128 roofline). This tool times the full semantic stage with
both layouts at a given batch so bench/serving can pick per configuration.

Usage: python tools/profile_fused_ab.py [batch] [steps]
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.runtime.engine import semantic_stage

CFG = RwkvConfig(dtype="bfloat16", param_dtype="bfloat16",
                 state_dtype="bfloat16")


def weight_bytes(params):
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))


def run(params, batch, steps, tag):
    on_tpu = jax.default_backend() == "tpu"
    keys = jnp.asarray(np.stack(
        [np.array([0, s], np.uint32) for s in range(batch)]))
    limits = jnp.full((batch,), steps, jnp.int32)
    hard_min = jnp.full((batch,), steps, jnp.int32)   # forbid EOS
    logits = jnp.zeros((batch, 8320), jnp.float32)
    state = rwkv7.init_state(CFG, batch)

    def go():
        sem, lens, _ = semantic_stage(
            params, state, logits, keys, limits, hard_min, CFG, steps,
            False, use_pallas=on_tpu, feed_tag1=True)
        return sem

    t0 = time.perf_counter()
    jax.device_get(go().ravel()[:1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = go()
    jax.device_get(out.ravel()[:1])
    wall = (time.perf_counter() - t0) / n
    ms_step = wall / steps * 1e3
    print(f"[{tag}] weights {weight_bytes(params)/1e9:.3f} GB  "
          f"compile {compile_s:.1f}s  {wall*1e3:.1f} ms/stage  "
          f"{ms_step:.3f} ms/step  {batch*steps/wall:.0f} tok/s",
          flush=True)
    return ms_step


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(f"backend={jax.default_backend()}  {CFG.n_layer}Lx{CFG.n_embd}E  "
          f"batch={batch} steps={steps}", flush=True)

    fused = rwkv7.make_serving_params(CFG, jax.random.PRNGKey(0), fused=True)
    ms_f = run(fused, batch, steps, "fused+int8")
    del fused
    raw = rwkv7.make_serving_params(CFG, jax.random.PRNGKey(0), fused=False)
    ms_r = run(raw, batch, steps, "raw+int8")
    print(json.dumps({"batch": batch, "steps": steps,
                      "fused_ms_step": round(ms_f, 3),
                      "raw_ms_step": round(ms_r, 3),
                      "raw_speedup": round(ms_f / ms_r, 3)}))


if __name__ == "__main__":
    main()
