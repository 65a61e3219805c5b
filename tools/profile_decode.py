"""Decode-step profiler: where does a semantic decode step spend its time?

Runs on the real chip at the flagship shape (32L x 2048E) and prints a
per-step breakdown:

  * semantic_stage        the full serving loop (step + sampler + bookkeeping)
  * raw step scan         rwkv7.step only (head_slice'd), no sampling
  * wkv-only scan         just the 32 layers' wkv7_single state updates
                          (the decode loop's HBM state-traffic floor as
                          currently expressed in jnp)
  * matmul-only scan      just the weight-streaming matmuls (no WKV, no
                          norms) — the int8 weight-traffic floor

Usage:  python tools/profile_decode.py [batch] [steps]
"""

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
from rwkv_tts_tpu.ops.quant import qmatmul
from rwkv_tts_tpu.ops.wkv7 import wkv7_single
from rwkv_tts_tpu.runtime.engine import semantic_stage, SEMANTIC_SLICE

import dataclasses


def timeit(fn, n=3, tag=""):
    t0 = time.perf_counter()
    jax.device_get(jax.tree_util.tree_leaves(fn())[0])   # compile + warm
    print(f"  [{tag}] compiled+warm in {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        # device_get forces real completion; block_until_ready alone has
        # been observed returning early through the axon tunnel for some
        # programs (the r2 profiler printed 0.003 ms/step nonsense)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    cfg = dataclasses.replace(RwkvConfig(), state_dtype="bfloat16")
    L, C, H, N = cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.head_size
    print(f"backend={jax.default_backend()}  shape={L}Lx{C}E  "
          f"batch={batch} steps={steps}", flush=True)

    t0 = time.perf_counter()
    qparams = rwkv7.make_serving_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(qparams)
    print(f"  make_serving_params (on-device) {time.perf_counter()-t0:.1f}s",
          flush=True)
    state = rwkv7.init_state(cfg, batch)
    hs = SEMANTIC_SLICE

    # 1. full semantic stage
    keys = jnp.asarray(np.stack([np.array([0, s], np.uint32)
                                 for s in range(batch)]))
    limits = jnp.full((batch,), steps, jnp.int32)
    hard_min = jnp.full((batch,), steps, jnp.int32)
    logits0 = jnp.zeros((batch, cfg.padded_vocab_size), jnp.float32)

    def run_stage():
        return semantic_stage(qparams, state, logits0, keys, limits,
                              hard_min, cfg, steps, False)[0]

    t_stage = timeit(run_stage, tag='stage') / steps

    # 1b. full semantic stage, Pallas decode kernel
    def run_stage_pallas():
        return semantic_stage(qparams, state, logits0, keys, limits,
                              hard_min, cfg, steps, False, use_pallas=True)[0]

    t_stage_p = timeit(run_stage_pallas, tag='stage_pallas') / steps

    # 2. raw step scan (no sampler): feed a constant token each step
    def make_raw(use_pallas):
        @jax.jit
        def raw_scan(qp, state):
            if rwkv7.wkv_bt_active(use_pallas, batch):
                state = rwkv7.state_to_bt(
                    state, rwkv7.bt_fold(cfg.n_head, batch))
            def body(st, _):
                logits, st = rwkv7.step(qp,
                                        jnp.zeros((batch,), jnp.int32),
                                        st, cfg, head_slice=hs,
                                        use_pallas=use_pallas)
                return st, logits[0, 0]
            st, outs = jax.lax.scan(body, state, None, length=steps)
            return outs
        return raw_scan

    raw_jnp = make_raw(False)
    raw_pal = make_raw(True)
    t_raw = timeit(lambda: raw_jnp(qparams, state), tag='raw') / steps
    t_raw_p = timeit(lambda: raw_pal(qparams, state),
                     tag='raw_pallas') / steps

    # 3. WKV-only scan: all L layers' single-token state update per step.
    sdt = jnp.dtype(cfg.state_dtype)
    wkv0 = state["wkv"]                                 # [L, B, H, N, N]
    rv = jnp.ones((L, batch, H, N), jnp.float32) * 0.01

    @jax.jit
    def wkv_scan(rv, wkv):
        def body(wkv, _):
            def layer(s):                               # [B, H, N, N]
                y, s2 = wkv7_single(rv[0], rv[0], rv[0], rv[0], rv[0], rv[0],
                                    s)
                return s2.astype(sdt), y[0, 0, 0]
            wkv, ys = jax.vmap(layer)(wkv)
            return wkv, ys[0]
        wkv, outs = jax.lax.scan(body, wkv, None, length=steps)
        return outs

    t_wkv = timeit(lambda: wkv_scan(rv, wkv0), tag='wkv_only') / steps

    # 4. matmul-only scan: the decode step's weight-streaming GEMMs
    x0 = jnp.zeros((batch, C), jnp.dtype(cfg.dtype))

    @jax.jit
    def mm_scan(qp, x0):
        bp = qp["blocks"]
        def body(x, _):
            def layer(x, lp):
                z = jnp.concatenate([x, x], axis=-1)
                rkv = qmatmul(z, lp["zrkv"])
                x = x + qmatmul(rkv[..., :C], lp["w_o"])
                h = qmatmul(x, lp["ffn_k"])
                x = x + qmatmul(jnp.square(h), lp["ffn_v"])
                return x * 0.5, None
            x, _ = jax.lax.scan(lambda c, lp: layer(c, lp), x, bp)
            head = qp["head"]
            hq = {k: v[..., :hs] for k, v in head.items()} \
                if isinstance(head, dict) else head[:, :hs]
            lg = qmatmul(x, hq)
            return x + 1e-6 * lg[..., :C].astype(x.dtype), lg[0, 0]
        x, outs = jax.lax.scan(body, x0, None, length=steps)
        return outs

    t_mm = timeit(lambda: mm_scan(qparams, x0), tag='matmul_only') / steps

    state_bytes = L * batch * H * N * N * sdt.itemsize
    wbytes = sum(v.nbytes for v in jax.tree_util.tree_leaves(qparams))
    print(f"semantic_stage : {t_stage*1e3:8.3f} ms/step "
          f"({batch/t_stage:,.0f} tok/s)")
    print(f"  w/ pallas wkv: {t_stage_p*1e3:8.3f} ms/step "
          f"({batch/t_stage_p:,.0f} tok/s)")
    print(f"raw step scan  : {t_raw*1e3:8.3f} ms/step   "
          f"sampler+loop = {(t_stage-t_raw)*1e3:.3f} ms")
    print(f"  w/ pallas wkv: {t_raw_p*1e3:8.3f} ms/step")
    print(f"wkv-only scan  : {t_wkv*1e3:8.3f} ms/step   "
          f"(state r+w floor {2*state_bytes/1e9:.2f} GB/step -> "
          f"{2*state_bytes/1e9/820*1e3:.2f} ms @820GB/s)")
    print(f"matmul-only    : {t_mm*1e3:8.3f} ms/step   "
          f"(weights {wbytes/1e9:.2f} GB -> "
          f"{wbytes/1e9/820*1e3:.2f} ms @820GB/s)")
    print(f"unaccounted    : {(t_raw-t_wkv-t_mm)*1e3:8.3f} ms/step "
          f"(norms, loras, elementwise, scheduling)")


if __name__ == "__main__":
    main()
