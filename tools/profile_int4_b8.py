"""VERDICT r4 #4: one more measured attempt at the batch-8 RTF 0.02 line.

Hypothesis under test: int4-in-HBM with the dequant fused in-kernel
(ops/quant.qmm4_pallas — unpack + scale in VMEM, bf16 MXU dots) halves
the decode step's HBM leg at batch 8, where weights are ~80% of the
step's bytes. The r3 ledger's counter-claim (docs/PERF.md "Why 4-bit
weights cannot speed up small-batch decode"): the wall is the MXU
weight-LOAD pipe, whose per-tile cost is byte-width-independent once
values expand to bf16, so the HBM cut lands on a leg that is already
overlapped (batch-8 hbm_bw_util ≈ 0.6 < 1).

This measures the claim END TO END through the actual serving program
(runtime/engine.lm_program — identical path to bench.py's batch-8
figure) instead of a kernel microbench: same model shape, same inputs,
int8 vs int4 weights, 512 decode steps, 3 timed iterations.

Prints one JSON line with rtf_e2e_batch8 for both layouts; the verdict
criterion is int4 ≤ 0.025 or a recorded rejection (BASELINE.md).
"""

import dataclasses
import json
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
from rwkv_tts_tpu.runtime.engine import lm_program

CFG = dataclasses.replace(RwkvConfig(), state_dtype="bfloat16")
BC_CFG = BiCodecConfig()
BATCH = 8
STEPS = 512
PREFILL = 64


def _sync(x):
    return jax.device_get(x.ravel()[:1])


def run(quant: str, bc_params, on_tpu: bool):
    params = rwkv7.make_serving_params(CFG, jax.random.PRNGKey(0),
                                       fused=False, quant=quant)
    T = 1 << (PREFILL - 1).bit_length()
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        12293, 40000, (BATCH, T)), jnp.int32)
    lengths = jnp.full((BATCH,), PREFILL, jnp.int32)
    keys = jnp.asarray(np.stack(
        [np.array([0, s], np.uint32) for s in range(BATCH)]))
    limits = hard_min = jnp.full((BATCH,), STEPS, jnp.int32)

    def lm():
        return lm_program(params, tokens, lengths, keys, keys, limits,
                          hard_min, CFG, STEPS, False,
                          use_pallas_fwd=on_tpu, use_pallas_step=on_tpu)

    glob, sem, sem_lens = lm()
    _sync(sem)
    assert int(jnp.min(sem_lens)) == STEPS
    wav = bicodec.decode(bc_params, glob, sem, BC_CFG)
    _sync(wav)

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        glob, sem, _ = lm()
    _sync(sem)
    wall_lm = (time.perf_counter() - t0) / n_iter
    t0 = time.perf_counter()
    for _ in range(n_iter):
        wav = bicodec.decode(bc_params, glob, sem, BC_CFG)
    _sync(wav)
    wall_detok = (time.perf_counter() - t0) / n_iter

    audio_s = BATCH * STEPS / C.TOKENS_PER_SECOND
    del params
    return {
        "wall_s_lm": round(wall_lm, 3),
        "wall_s_detok": round(wall_detok, 3),
        "step_ms": round(wall_lm / (32 + STEPS) * 1e3, 3),
        "rtf_e2e_batch8": round((wall_lm + wall_detok) / audio_s, 5),
        "xrt_e2e_batch8": round(audio_s / (wall_lm + wall_detok), 2),
    }


def main():
    on_tpu = jax.default_backend() == "tpu"
    bc_params = bicodec.init_params(BC_CFG, jax.random.PRNGKey(1), fast=True)
    out = {"backend": jax.default_backend(), "batch": BATCH, "steps": STEPS}
    for quant in ("int8", "int4"):
        out[quant] = run(quant, bc_params, on_tpu)
        print(f"# {quant}: {out[quant]}", file=sys.stderr, flush=True)
    i8, i4 = out["int8"]["rtf_e2e_batch8"], out["int4"]["rtf_e2e_batch8"]
    out["int4_wins"] = bool(i4 < i8)
    out["meets_002_line"] = bool(min(i4, i8) <= 0.025)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
