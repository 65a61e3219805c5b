"""Measure decode_block / decode_block_bucketed ms/step per occupancy bucket
at the flagship shape — the data behind the continuous engine's bucket and
compaction policy (runtime/continuous.py).

Usage: python tools/profile_buckets.py [slots] [block]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu import constants as C
from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.runtime.continuous import (GLOBAL, SEMANTIC, decode_block,
                                             decode_block_bucketed)
import dataclasses


def main():
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    on_tpu = jax.default_backend() == "tpu"

    cfg = dataclasses.replace(RwkvConfig(), state_dtype="bfloat16")
    params = rwkv7.make_serving_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    B = slots
    state = rwkv7.init_state(cfg, B)
    logits = jnp.zeros((B, 8320), jnp.float32)
    slots_d = {
        "stage": jnp.full((B,), SEMANTIC, jnp.int32),
        "override": jnp.full((B,), -1, jnp.int32),
        "n_glob": jnp.full((B,), C.GLOBAL_TOKENS_SIZE, jnp.int32),
        "n_step": jnp.zeros((B,), jnp.int32),
        "limit": jnp.full((B,), 1 << 20, jnp.int32),
        "hard_min": jnp.full((B,), 1 << 20, jnp.int32),
        "zs": jnp.zeros((B,), jnp.bool_),
        "win": jnp.zeros((B, C.ZS_EOS_WINDOW), jnp.bool_),
        "nwin": jnp.zeros((B,), jnp.int32),
        "gkey": jnp.zeros((B, 2), jnp.uint32),
        "skey": jnp.zeros((B, 2), jnp.uint32),
    }

    def sync(x):
        jax.device_get(x.ravel()[:1])

    for bucket in (8, 16, 32, 64, slots):
        if bucket > slots:
            continue
        if bucket == slots:
            run = lambda st, lg, sl: decode_block(
                params, st, lg, sl, cfg, block, use_pallas=on_tpu)
        else:
            run = lambda st, lg, sl, bk=bucket: decode_block_bucketed(
                params, st, lg, sl, cfg, block, use_pallas=on_tpu, bucket=bk)
        st, lg, sl, em = run(state, logits, slots_d)   # compile
        sync(em)
        n_iter = 4
        t0 = time.perf_counter()
        st, lg, sl = state, logits, slots_d
        for _ in range(n_iter):
            st, lg, sl, em = run(st, lg, sl)
        sync(em)
        dt = (time.perf_counter() - t0) / n_iter
        print(f"bucket {bucket:4d}: {dt * 1000 / block:7.3f} ms/step "
              f"({dt * 1000:8.1f} ms/block of {block})", flush=True)


if __name__ == "__main__":
    main()
