"""Benchmark: synthesis throughput (xRT per chip) of the RWKV-7 TTS decode.

Prints ONE JSON line:
  {"metric": "synthesis_xrt_per_chip", "value": N, "unit": "audio_sec/sec",
   "vs_baseline": N / 3.33}

Baseline: the reference's runtime RTF alert threshold is 0.3
(bin/server.rs:656), i.e. 3.33× real-time; each semantic token is 320
samples at 16 kHz, so 50 tokens = 1 s of audio (BASELINE.md).

Uses random weights in the flagship shape class (real checkpoints are not
available in this environment) — throughput depends on architecture dims,
not weight values. The measured section is the full serving path per batch:
prefill (typical prompt) + 32 global tokens + semantic decode, exactly the
per-request work of POST /api/tts.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tts_tpu import constants as C
from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.runtime.engine import global_stage, semantic_stage

CFG = RwkvConfig(n_layer=24, n_embd=1024, head_size=64)
BATCH = 8
PREFILL_LEN = 64            # typical prompt: props + tags + ~50 text tokens
DECODE_STEPS = 512          # ≈10.2 s of audio per request


def main():
    on_tpu = jax.default_backend() == "tpu"
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(12293, 40000, (BATCH, PREFILL_LEN)),
        jnp.int32,
    )
    lengths = jnp.full((BATCH,), PREFILL_LEN, jnp.int32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(BATCH, dtype=jnp.uint32))
    limits = jnp.full((BATCH,), DECODE_STEPS, jnp.int32)
    # forbid EOS for the whole run so every slot decodes exactly DECODE_STEPS
    # (random weights would otherwise stop at arbitrary points)
    hard_min = jnp.full((BATCH,), DECODE_STEPS, jnp.int32)

    def run():
        state = rwkv7.init_state(CFG, BATCH)
        logits, state = rwkv7.forward(
            params, tokens, state, CFG, use_pallas=on_tpu, lengths=lengths
        )
        glob, state, logits = global_stage(params, state, logits, keys, CFG)
        sem, sem_lens, state = semantic_stage(
            params, state, logits, keys, limits, hard_min,
            CFG, DECODE_STEPS, False,
        )
        return sem, sem_lens

    sem, sem_lens = run()                      # compile + warm up
    sem.block_until_ready()
    assert int(jnp.min(sem_lens)) == DECODE_STEPS, "decode stopped early"

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        sem, sem_lens = run()
    sem.block_until_ready()
    wall = (time.perf_counter() - t0) / n_iter

    total_tokens = BATCH * (C.GLOBAL_TOKENS_SIZE + DECODE_STEPS)
    audio_sec = BATCH * DECODE_STEPS / C.TOKENS_PER_SECOND
    xrt = audio_sec / wall
    print(json.dumps({
        "metric": "synthesis_xrt_per_chip",
        "value": round(xrt, 3),
        "unit": "audio_sec/sec",
        "vs_baseline": round(xrt / 3.33, 3),
        "detail": {
            "backend": jax.default_backend(),
            "batch": BATCH,
            "prefill_len": PREFILL_LEN,
            "decode_steps": DECODE_STEPS,
            "wall_s": round(wall, 3),
            "tokens_per_s": round(total_tokens / wall, 1),
            "rtf": round(1.0 / xrt, 5),
        },
    }))


if __name__ == "__main__":
    main()
