"""First-chunk latency breakdown: where do the 563 ms go?

Replays bench.py's first_chunk_latency path (batch 8, normal mode) but
times each stage separately on the real chip:

  * prefill          64-token masked batched forward
  * global stage     32 sequential decode steps (scan)
  * semantic stage   TAG_1 (folded, feed_tag1) + 48 sequential decode
                     steps (while_loop + sampler) — matches the engine
  * vocode window    one 80-token windowed BiCodec decode (batch 1)

Usage: python tools/profile_first_chunk.py [batch] [sem_steps]
"""

import dataclasses
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu import constants as C
from rwkv_tts_tpu.config import BiCodecConfig, RwkvConfig
from rwkv_tts_tpu.models import bicodec, rwkv7
from rwkv_tts_tpu.runtime.engine import (SEMANTIC_SLICE, global_stage,
                                         semantic_stage)


def timeit(fn, n=5, tag=""):
    # fence on a SCALAR: device_get of a full tensor pays the tunnel
    # transfer (~60 ms for [8, 78336] logits) and pollutes the timing
    fence = lambda out: jax.device_get(
        jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    fence(fn())
    print(f"  [{tag}] compiled+warm in {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fence(out)          # one fence for the pipelined batch: ~1 RTT total
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    on_tpu = jax.default_backend() == "tpu"

    cfg = dataclasses.replace(RwkvConfig(), state_dtype="bfloat16")
    print(f"backend={jax.default_backend()} shape={cfg.n_layer}Lx{cfg.n_embd}E"
          f" batch={batch} sem_steps={steps}", flush=True)

    qparams = rwkv7.make_serving_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(qparams)
    bc_cfg = BiCodecConfig()
    bc_params = bicodec.init_params(bc_cfg, jax.random.PRNGKey(1), fast=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(bc_params)[0])

    PREFILL = 64
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        12293, 40000, (batch, PREFILL)), jnp.int32)
    lengths = jnp.full((batch,), PREFILL, jnp.int32)
    keys = jnp.asarray(np.stack([np.array([0, s], np.uint32)
                                 for s in range(batch)]))
    limits = jnp.full((batch,), steps, jnp.int32)
    hard_min = jnp.full((batch,), steps, jnp.int32)
    hs = min(SEMANTIC_SLICE, cfg.padded_vocab_size)

    state0 = rwkv7.init_state(cfg, batch)

    # 1. prefill
    def run_prefill():
        return rwkv7.forward(qparams, tokens, state0, cfg,
                             use_pallas=on_tpu, lengths=lengths)
    t_pre = timeit(run_prefill, tag="prefill")
    logits0, state1 = run_prefill()
    jax.block_until_ready(logits0)

    # 2. global stage (32 steps)
    def run_global():
        return global_stage(qparams, state1, logits0, keys, cfg,
                            use_pallas=on_tpu)[0]
    t_glob = timeit(run_global, tag="global32")
    glob, state2, logits2 = global_stage(qparams, state1, logits0, keys, cfg,
                                         use_pallas=on_tpu)
    jax.block_until_ready(logits2)

    # 3. semantic stage (TAG_1 folded + 48 steps, as the engine runs it)
    def run_sem():
        return semantic_stage(qparams, state2, logits2, keys, limits,
                              hard_min, cfg, steps, False,
                              use_pallas=on_tpu, feed_tag1=True)[0]
    t_sem = timeit(run_sem, tag=f"semantic{steps}+tag1")
    t_tag1 = 0.0

    # 5. vocoder window (batch 1, 80 tokens)
    g_toks = jnp.zeros((1, C.GLOBAL_TOKENS_SIZE), jnp.int32)
    win = 32 + 16 + 32
    sem_win = jnp.zeros((1, win), jnp.int32)

    def run_voc():
        return bicodec.decode(bc_params, g_toks, sem_win, bc_cfg)
    t_voc = timeit(run_voc, tag="vocode80")

    # 6. FUSED one-program LM path: prefill → global → TAG_1-folded
    # semantic inside a single jit — measures what the 3 separate stage
    # dispatches cost in host/dispatch glue (r3 experiment: can fusing
    # recover the ~16 ms gap between component sum and measured bench
    # first-chunk?)
    @jax.jit
    def fused_lm(params, tokens, lengths, state, keys, limits, hard_min):
        logits, st = rwkv7.forward(params, tokens, state, cfg,
                                   use_pallas=on_tpu, lengths=lengths)
        glob, st, logits = global_stage(params, st, logits, keys, cfg,
                                        use_pallas=on_tpu)
        sem, lens, st = semantic_stage(params, st, logits, keys, limits,
                                       hard_min, cfg, steps, False,
                                       use_pallas=on_tpu, feed_tag1=True)
        return glob, sem

    def run_fused():
        return fused_lm(qparams, tokens, lengths, state0, keys, limits,
                        hard_min)
    t_fused = timeit(run_fused, tag="fused_lm")
    staged_lm = t_pre + t_glob + t_sem
    print(f"fused LM program: {t_fused*1e3:8.1f} ms vs staged "
          f"{staged_lm*1e3:.1f} ms (dispatch glue "
          f"{(staged_lm - t_fused)*1e3:+.1f} ms)")

    total = t_pre + t_glob + t_tag1 + t_sem + t_voc
    print(f"\nprefill({PREFILL})   : {t_pre*1e3:8.1f} ms")
    print(f"global (32)   : {t_glob*1e3:8.1f} ms  "
          f"({t_glob/32*1e3:.2f} ms/step)")
    print(f"semantic({steps}+TAG_1): {t_sem*1e3:8.1f} ms  "
          f"({t_sem/(steps+1)*1e3:.2f} ms/step)")
    print(f"vocode window : {t_voc*1e3:8.1f} ms")
    print(f"TOTAL         : {total*1e3:8.1f} ms "
          f"(bench first_chunk was 562.9)")


if __name__ == "__main__":
    main()
