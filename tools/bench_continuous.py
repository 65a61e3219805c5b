"""Serving-level benchmark: the CONTINUOUS engine under 64 concurrent
mixed-length requests (the BASELINE.md concurrency north star), real chip.

Unlike bench.py's static-stage measurement, this drives the production
slot manager end to end: async submission, batched admission prefill,
block decode with occupancy buckets, per-request retirement — then
vocodes every finished utterance with the full-size BiCodec (sub-batches
of 8, as the pipeline does).

Prints one JSON line:
  {"requests": N, "audio_sec": A, "wall_s_llm": W, "wall_s_e2e": W2,
   "xrt_continuous_e2e": A/W2, ...}

Usage: python tools/bench_continuous.py [n_requests] [slots] [block]

Caveat (this environment): the axon tunnel pays tens of ms of RTT per
decode-block dispatch; on a locally-attached TPU that tax vanishes.
Compare block=32 vs block=64 runs — if throughput scales with block
size, the gap to bench.py's static number is dispatch RTT, not engine
overhead.
"""

import dataclasses
import json
import sys
import threading
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu import constants as C
from rwkv_tts_tpu.config import (BiCodecConfig, EngineConfig, RwkvConfig,
                                 TtsArgs)
from rwkv_tts_tpu.models import bicodec, rwkv7


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    on_tpu = jax.default_backend() == "tpu"

    cfg = dataclasses.replace(RwkvConfig(), state_dtype="bfloat16")
    qparams = rwkv7.make_serving_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(qparams)
    bc_cfg = BiCodecConfig()
    bc_params = bicodec.init_params(bc_cfg, jax.random.PRNGKey(1), fast=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(bc_params)[0])

    from rwkv_tts_tpu.runtime.continuous import ContinuousEngine
    ecfg = EngineConfig(max_semantic_tokens=512, batch_size=slots)
    eng = ContinuousEngine(qparams, cfg, ecfg, use_pallas=on_tpu,
                           block=block, slots=slots)

    # mixed lengths: 128/256/384/512-token caps, round-robin; varied texts
    words = ("the quick brown fox jumps over the lazy dog and keeps "
             "running through the moonlit field without a pause").split()
    caps = [128, 256, 384, 512]
    reqs = []
    for i in range(n_req):
        text = " ".join(words[: 6 + (i % 11)])
        reqs.append(TtsArgs(text=text, seed=1000 + i,
                            max_tokens=caps[i % len(caps)]))

    # warm-up: compile every admission burst bucket + decode occupancy
    # bucket the run can touch (pow2 sweep), plus the vocoder shape —
    # steady-state serving never recompiles, so neither should the timed
    # region (a production server calls warmup() at startup the same way)
    t0 = time.perf_counter()
    eng.warmup(max_burst=min(n_req, slots))
    print(f"  engine warm-up (compiles): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    bicodec.decode(bc_params, jnp.zeros((8, C.GLOBAL_TOKENS_SIZE), jnp.int32),
                   jnp.zeros((8, 512), jnp.int32), bc_cfg).block_until_ready()
    print(f"  vocoder warm-up: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    stats0 = dict(eng.stats)

    results = [None] * n_req
    done = threading.Event()
    remaining = [n_req]
    lock = threading.Lock()

    def cb(i):
        def _cb(res):
            results[i] = res
            with lock:
                remaining[0] -= 1
                if remaining[0] == 0:
                    done.set()
        return _cb

    t0 = time.perf_counter()
    for i, r in enumerate(reqs):
        eng.submit(r, cb(i))
    if not done.wait(timeout=3600):
        raise TimeoutError("continuous benchmark timed out")
    wall_llm = time.perf_counter() - t0
    eng.stop()

    errors = [r for r in results if isinstance(r, Exception)]
    if errors:
        raise RuntimeError(
            f"{len(errors)}/{n_req} requests failed; first: "
            f"{type(errors[0]).__name__}: {errors[0]}")
    tok_counts = [len(r.semantic_tokens) for r in results]
    audio_sec = sum(tok_counts) / C.TOKENS_PER_SECOND

    # vocode everything, padded to the 512 bucket, sub-batches of 8
    t0 = time.perf_counter()
    wav = None
    for i in range(0, n_req, 8):
        batch = results[i:i + 8]
        sem = np.zeros((len(batch), 512), np.int32)
        g = np.zeros((len(batch), C.GLOBAL_TOKENS_SIZE), np.int32)
        for j, r in enumerate(batch):
            toks = r.semantic_tokens[:512]
            sem[j, : len(toks)] = toks
            g[j, : len(r.global_tokens)] = r.global_tokens
        wav = bicodec.decode(bc_params, jnp.asarray(g), jnp.asarray(sem),
                             bc_cfg)
    wav.block_until_ready()
    wall_detok = time.perf_counter() - t0
    wall_e2e = wall_llm + wall_detok

    print(json.dumps({
        "backend": jax.default_backend(),
        "requests": n_req,
        "slots": slots,
        "block": block,
        "token_caps": caps,
        "tokens_total": int(sum(tok_counts)),
        "audio_sec": round(audio_sec, 2),
        "wall_s_llm": round(wall_llm, 3),
        "wall_s_detok": round(wall_detok, 3),
        "xrt_continuous_llm": round(audio_sec / wall_llm, 2),
        "xrt_continuous_e2e": round(audio_sec / wall_e2e, 2),
        # timed-region deltas only (warmup compiles excluded)
        "loop_stats": {k: (round(v - stats0[k], 3)
                           if isinstance(v, float) else v - stats0[k])
                       for k, v in eng.stats.items()},
    }))


if __name__ == "__main__":
    main()
