"""TP-path hardware smoke: prove the shard_map/psum decode program lowers
and runs through the axon TPU backend (VERDICT r2 task 1a).

Multi-chip hardware is unreachable from this environment, so this runs
the REAL tensor-parallel program — shard_map over a (data=1, model=1)
mesh, psums and all — on the single chip, next to the plain single-chip
step at the same shapes. That validates the half of the TP projection
that was previously assumed, not known: Mosaic/axon accepts the lowered
collective program, NamedSharding device_puts work, and the TP program's
non-collective overhead (shard_map wrapping, the per-layer psum
structure at axis size 1) is measured rather than guessed. The remaining
unknown — ICI latency of the psums at tp>1 — stays a projection
(docs/PERF.md "TP section"), now anchored on a measured TP step time.

Timing follows bench.py discipline: whole AR stages inside one jitted
program (the engine's semantic_stage with the step_fn hook), final
device_get fence, no sub-ms microbenches through the tunnel.

Usage:  python tools/tpu_tp_smoke.py [--steps 57] [--batch 8]
"""

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import dataclasses

from rwkv_tts_tpu import constants as C
from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.parallel import mesh as meshlib
from rwkv_tts_tpu.parallel import tp as tplib
from rwkv_tts_tpu.runtime.engine import semantic_stage


def _sync(x):
    return jax.device_get(x.ravel()[:1])


def run_stage(params, cfg, batch, steps, step_fn=None, use_pallas=False,
              n_iter=3, label=""):
    """One semantic stage (the AR decode program serving uses): returns
    best wall seconds per stage call."""
    keys = jnp.asarray(
        np.stack([np.array([0, s], np.uint32) for s in range(batch)]))
    limits = jnp.full((batch,), steps, jnp.int32)
    hard_min = jnp.full((batch,), steps, jnp.int32)  # forbid EOS: full run
    logits0 = jnp.zeros((batch, 8320), jnp.float32)
    state = rwkv7.init_state(cfg, batch)
    if step_fn is not None:
        m = step_fn.__wrapped_mesh__
        state = tplib.shard_state_tp(m, state)
        logits0 = jax.device_put(logits0, meshlib.batch_sharding(m, 2))
        keys = jax.device_put(keys, meshlib.batch_sharding(m, 2))
        limits = jax.device_put(limits, meshlib.batch_sharding(m, 1))
        hard_min = jax.device_put(hard_min, meshlib.batch_sharding(m, 1))

    def call():
        sem, sem_lens, _ = semantic_stage(
            params, state, logits0, keys, limits, hard_min, cfg, steps,
            False, use_pallas=use_pallas, feed_tag1=True,
            step_fn=step_fn)
        return sem, sem_lens

    sem, sem_lens = call()          # compile + warm
    _sync(sem)
    assert int(jnp.min(jax.device_get(sem_lens))) == steps, "stopped early"
    best = float("inf")
    for _ in range(n_iter):
        t0 = time.perf_counter()
        sem, _ = call()
        _sync(sem)
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {best * 1e3:.1f} ms for {steps} steps "
          f"({best * 1e3 / steps:.2f} ms/step)", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=57)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", flush=True)
    cfg = dataclasses.replace(RwkvConfig(), state_dtype="bfloat16")

    # RAW int8 layout — what the TP engine path serves
    params = rwkv7.make_serving_params(cfg, jax.random.PRNGKey(0),
                                       fused=False, quant="int8")

    print("plain single-chip step (jnp chain, raw int8):", flush=True)
    t_plain = run_stage(params, cfg, args.batch, args.steps,
                        label="plain")

    print("TP program on (data=1, model=1) mesh (shard_map + psums):",
          flush=True)
    mesh = meshlib.make_mesh(1, model_parallel=1)
    sp = tplib.shard_params_tp(mesh, params)
    step_fn = tplib.make_step_fn(cfg, mesh)
    step_fn.__wrapped_mesh__ = mesh
    t_tp = run_stage(sp, cfg, args.batch, args.steps, step_fn=step_fn,
                     label="tp(1,1)")

    per_step_plain = t_plain * 1e3 / args.steps
    per_step_tp = t_tp * 1e3 / args.steps
    overhead_ms = per_step_tp - per_step_plain
    out = {
        "backend": backend,
        "batch": args.batch,
        "steps": args.steps,
        "plain_ms_per_step": round(per_step_plain, 3),
        "tp11_ms_per_step": round(per_step_tp, 3),
        "tp_program_overhead_ms_per_step": round(overhead_ms, 3),
        "note": "tp=1 mesh on one chip: validates shard_map/psum lowering "
                "through axon + measures the TP program structure tax; "
                "ICI cost at tp>1 remains projected (docs/PERF.md)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
