"""Vocoder sub-batch sweep: how to slice the batch-128 detokenize leg.

The serving pipeline vocodes in sub-batches (bench.py ``voc_b=8``): a
[128, 512-token] single call would allocate multi-GB upsampled
activations. But 8 was chosen for safety, not measured — the conv-impl
question is closed (docs/PERF.md: native f32 convs, 5 formulations
rejected), leaving call-granularity as the last vocoder lever
(VERDICT r2 task 3). This sweeps voc_b at the serving shape and prints
seconds for the full 128×512 detokenize leg per granularity.

Memory bound: the widest activation is ~[voc_b, 96ch, 163840] f32 ≈
63 MB/utterance plus conv temporaries — voc_b 32 ≈ 2 GB transient, fine
on a 16 GB v5e.

Usage: python tools/profile_vocoder_batch.py [--subs 4 8 16 32]
"""

import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu import constants as C
from rwkv_tts_tpu.config import BiCodecConfig
from rwkv_tts_tpu.models import bicodec

BATCH = 128
S = 512


def _sync(x):
    return jax.device_get(x.ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subs", type=int, nargs="*", default=[4, 8, 16, 32])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    cfg = BiCodecConfig()
    params = bicodec.init_params(cfg, jax.random.PRNGKey(1), fast=True)
    rng = np.random.default_rng(0)
    glob = jnp.asarray(rng.integers(0, cfg.global_codebook,
                                    (BATCH, cfg.num_global_tokens)),
                       jnp.int32)
    sem = jnp.asarray(rng.integers(0, cfg.semantic_codebook, (BATCH, S)),
                      jnp.int32)

    results = {}
    for vb in args.subs:
        if BATCH % vb:
            continue

        def leg():
            out = None
            for i in range(0, BATCH, vb):
                out = bicodec.decode(params, glob[i:i + vb],
                                     sem[i:i + vb], cfg)
            return out

        try:
            _sync(leg())                    # compile + warm
        except Exception as e:  # noqa: BLE001 — OOM at large vb
            print(f"voc_b={vb}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", flush=True)
            continue
        # pipelined enqueue + one final device_get fence (bench.py timing
        # discipline — per-iter syncs through the tunnel distort sub-ms)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = leg()
        _sync(out)
        best = (time.perf_counter() - t0) / args.iters
        audio_sec = BATCH * S / C.TOKENS_PER_SECOND
        print(f"voc_b={vb:3d}: {best:.3f} s for 128x512 "
              f"({audio_sec / best:.1f} xRT vocoder-only)", flush=True)
        results[vb] = best

    if results:
        bestv = min(results, key=results.get)
        print(f"best: voc_b={bestv} ({results[bestv]:.3f} s)")


if __name__ == "__main__":
    main()
