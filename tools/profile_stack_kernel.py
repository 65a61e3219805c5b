"""ROUND4.md candidate #2: attribute the WKV stack kernel's ~0.8 ms/step
overhead above its DMA floor at the flagship decode shape (B=128).

The serving decode step runs ONE `wkv7_single_bt_stack` pallas call per
layer (32 calls/step), each a 16-cell grid at the heuristic block size
Hb=2 (2 MB state blocks under the 14 MB scoped-VMEM budget). docs/PERF.md
records 3.4 ms/step in-kernel vs a ~2.6 ms state-DMA floor; the round-4
notes prescribed per-cell profiling on hardware before touching anything.

All timings run STEPS decode steps inside ONE jitted program (axon tunnel
discipline). Variants:

  serve_hb{2,4,8}  serving shape: fori over 32 layers, one stack call per
                   layer, inter-layer data dependency, block size Hb.
                   Hb>2 oversubscribes the 16 MB VMEM model — failures
                   are caught and reported.
  serve_nok        the same harness minus the kernel (slices/casts/carry
                   only, state untouched) — the harness's own cost, to
                   be subtracted before comparing kernels.
  merged_hb2/nok   the SAME total DMA + compute volume in ONE pallas call
                   with grid (L·H/Hb,) — legal only because synthetic
                   inputs drop the inter-layer dependency. (serve−nok) −
                   (merged−nok) is the removable per-call overhead
                   (launch + pipeline ramp/drain × 32). Serving cannot
                   actually merge (layer l+1's r..b are projections of
                   layer l's output); this bounds any per-call fix.
  serve_hb2_bf16   seq inputs r..b fed bf16 (cast=False), halving the
                   non-state input read (~201→100 MB/step). Changes
                   numerics (bf16 kernel operands) — a measurement, not
                   a serving config, unless the win justifies a golden
                   regeneration.

Prints one JSON line with ms/step + implied HBM GB/s per variant and the
analytic byte volumes. Run with NO platform env var — the default
platform resolution reaches the tunneled TPU; RWKV_TTS_PLATFORM=tpu
selects the absent native plugin and fails ("no jellyfish device").
"""

import functools
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from rwkv_tts_tpu.ops.wkv7 import (_wkv7_single_bt_stack_kernel,
                                   wkv7_single_bt_stack)

L, H, N, B = 32, 32, 64, 128
STEPS = 64
ITERS = 3
f32, bf16 = jnp.float32, jnp.bfloat16


def _np_dtype(jdt):
    return np.dtype(jnp.dtype(jdt).name)


_INPUT_CACHE = {}


def make_inputs2(seq_dtype):
    key = jnp.dtype(seq_dtype).name
    if key not in _INPUT_CACHE:
        rng = np.random.default_rng(0)
        seq = rng.standard_normal((L, 6, H, N, B), np.float32) * 0.3
        seq[:, 1] = rng.uniform(-3.0, 0.0, (L, H, N, B))
        state = rng.standard_normal((L, H, N, N, B), np.float32) * 0.1
        _INPUT_CACHE[key] = (
            jax.device_put(seq.astype(_np_dtype(seq_dtype))),
            jax.device_put(state.astype(np.dtype("bfloat16"))))
    return _INPUT_CACHE[key]


def serve_step_fn(hb, cast=True, kernel=True):
    @jax.jit
    def run(seq, state):
        def step(_, carry):
            state, acc = carry

            def layer(l, inner):
                state, acc = inner
                s6 = jax.lax.dynamic_index_in_dim(seq, l, 0, keepdims=False)
                # serialize on the previous layer's output, as serving does
                r = (s6[0].astype(seq.dtype)
                     + (0.0 * acc).astype(seq.dtype))
                if kernel:
                    y, state = wkv7_single_bt_stack(
                        r, s6[1], s6[2], s6[3], s6[4], s6[5], state, l,
                        hb=hb, cast=cast)
                else:
                    y = (r + s6[1] + s6[2] + s6[3] + s6[4]
                         + s6[5]).astype(f32)
                return state, jnp.sum(y[0, 0, :1])

            return jax.lax.fori_loop(0, L, layer, (state, acc))

        state, acc = jax.lax.fori_loop(0, STEPS, step,
                                       (state, jnp.float32(0)))
        return state, acc

    return run


def merged_step_fn(hb, kernel=True):
    """All L·H/hb grid cells of one decode step in a single pallas call."""
    g = H // hb
    seq_spec = pl.BlockSpec((hb, N, B), lambda c, l: (c, 0, 0),
                            memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((1, hb, N, N, B),
                              lambda c, l: (c // g, c % g, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L * g,),
        in_specs=[seq_spec] * 6 + [state_spec],
        out_specs=[seq_spec, state_spec],
    )
    call = pl.pallas_call(
        _wkv7_single_bt_stack_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L * H, N, B), f32),
            jax.ShapeDtypeStruct((L, H, N, N, B), bf16),
        ],
        input_output_aliases={7: 1},
    )

    @jax.jit
    def run(seq, state):
        ops = [jnp.reshape(seq[:, i].astype(f32), (L * H, N, B))
               for i in range(6)]
        dummy = jnp.zeros((1,), jnp.int32)

        def step(_, carry):
            state, acc = carry
            o0 = ops[0] + 0.0 * acc
            if kernel:
                y, state = call(dummy, o0, *ops[1:], state)
            else:
                y = o0 + ops[1] + ops[2] + ops[3] + ops[4] + ops[5]
            return state, jnp.sum(y[0, 0, :1])

        state, acc = jax.lax.fori_loop(0, STEPS, step,
                                       (state, jnp.float32(0)))
        return state, acc

    return run


def time_variant(fn, seq_dtype):
    try:
        # one transfer per variant: ~2.3 GB through the tunnel is the
        # dominant wall-clock cost, so inputs are NOT donated and are
        # reused across timed iterations (the aliased pallas output then
        # costs one in-program state copy, ~0.02 ms/step amortized over
        # STEPS — noise at the 3.4 ms/step scale being attributed)
        seq, state = make_inputs2(seq_dtype)
        t0 = time.perf_counter()
        _, acc = fn(seq, state)
        # device_get, NOT block_until_ready: through the axon tunnel the
        # latter returns before remote execution completes (measured
        # 0.04 ms/"step" for a 2.1 GB-DMA program — nonsense); fetching
        # the value is the only real sync.
        float(jax.device_get(acc))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            _, acc = fn(seq, state)
            float(jax.device_get(acc))
            best = min(best, (time.perf_counter() - t0) / STEPS)
        return {"ms_per_step": round(best * 1e3, 3),
                "compile_s": round(compile_s, 1)}
    except Exception as e:  # VMEM oversubscription etc.
        return {"error": f"{type(e).__name__}: {str(e)[:200]}"}


def main():
    state_bytes = 2 * L * H * N * N * B * 2          # in + out, bf16
    seq_bytes_f32 = L * 6 * H * N * B * 4 + L * H * N * B * 4
    out = {"shape": {"L": L, "H": H, "N": N, "B": B},
           "state_bytes_per_step": state_bytes,
           "state_floor_ms_819GBps": round(state_bytes / 819e9 * 1e3, 3),
           "variants": {}}
    plan = [
        ("serve_nok", serve_step_fn(2, kernel=False), f32),
        ("serve_hb2", serve_step_fn(2), f32),
        ("merged_nok", merged_step_fn(2, kernel=False), f32),
        ("merged_hb2", merged_step_fn(2), f32),
        ("serve_hb2_bf16", serve_step_fn(2, cast=False), bf16),
    ]
    if "--hb-sweep" in sys.argv:
        # measured 2026-08-21: BOTH fail remote compile (HTTP 500,
        # tpu_compile_helper exit 1) — 4 MB state blocks double-buffered
        # in+out already oversubscribe the 16 MB VMEM model, so the
        # heuristic Hb=2 is the max block size; this lever is closed.
        plan[2:2] = [("serve_hb4", serve_step_fn(4), f32),
                     ("serve_hb8", serve_step_fn(8), f32)]
    for name, fn, dt in plan:
        out["variants"][name] = time_variant(fn, dt)
        print(f"# {name}: {out['variants'][name]}", flush=True)
    v = out["variants"]

    def ms(n):
        return v.get(n, {}).get("ms_per_step")

    if ms("serve_hb2") and ms("serve_nok"):
        out["kernel_serve_ms"] = round(ms("serve_hb2") - ms("serve_nok"), 3)
    if ms("merged_hb2") and ms("merged_nok"):
        out["kernel_merged_ms"] = round(
            ms("merged_hb2") - ms("merged_nok"), 3)
    if "kernel_serve_ms" in out and "kernel_merged_ms" in out:
        out["per_call_overhead_ms"] = round(
            out["kernel_serve_ms"] - out["kernel_merged_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
