"""Decode-step soup anatomy: time each non-GEMM, non-WKV piece in isolation.

profile_decode.py bounds the step as matmul floor (3.8 ms) + WKV kernel
(~3.9 ms) + ~6.6 ms of "soup". This tool breaks the soup down: per-layer
[B, C] <-> [H, N, B] transposes, the elementwise/norm chain, the LoRA
stack, and the semantic sampler — each as its own L-deep scan so the
numbers compare directly with the per-step figures.

Usage: python tools/profile_step_pieces.py [batch] [steps]
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


def timeit(fn, n=3, tag=""):
    t0 = time.perf_counter()
    jax.device_get(jax.tree_util.tree_leaves(fn())[0].ravel()[:1])
    print(f"  [{tag}] compiled+warm in {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = RwkvConfig()
    L, C, H, N = cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.head_size
    B = batch
    print(f"backend={jax.default_backend()}  {L}Lx{C}E  batch={B} "
          f"steps={steps}", flush=True)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))

    # 1. transposes: the 6 operand [B,C]->[H,N,B] + 1 output [H,N,B]->[B,C]
    #    per layer, as the pallas decode path does.
    @jax.jit
    def transpose_scan(x0):
        def step(x, _):
            def layer(x, _):
                bt = [jnp.transpose(x.reshape(B, H, N), (1, 2, 0))
                      for _ in range(6)]
                y = sum(bt)
                back = jnp.transpose(y, (2, 0, 1)).reshape(B, C)
                return back, ()
            x, _ = jax.lax.scan(layer, x, None, length=L)
            return x * jax.lax.rsqrt(jnp.mean(x * x) + 1.0), ()
        x, _ = jax.lax.scan(step, x0, None, length=steps)
        return x

    # 2. elementwise/norm soup (no transposes, no GEMMs): ln1 + shaping +
    #    sigmoids + l2norm + v-blend + groupnorm + rk bonus + gate + ln2 +
    #    relu^2 + residuals, on [B, C] operands, L-deep.
    vecs = jnp.asarray(rng.normal(size=(L, 10, C)).astype(np.float32) * 0.1)
    rks = jnp.asarray(rng.normal(size=(L, H, N)).astype(np.float32) * 0.1)

    @jax.jit
    def soup_scan(x0, vecs, rks):
        f32 = jnp.float32

        def ln(x, w, b):
            mu = jnp.mean(x, -1, keepdims=True)
            var = jnp.var(x, -1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-5) * w + b

        def step(x, _):
            def layer(carry, lv):
                x, vf = carry
                v, rk = lv
                h = ln(x, v[0], v[1])
                xx = v[2] - h
                k = h * v[3]
                kk = (h * v[4]).reshape(B, H, N)
                kk = kk * jax.lax.rsqrt(
                    jnp.sum(kk * kk, -1, keepdims=True) + 1e-12)
                a = jax.nn.sigmoid(h * v[5])
                k_in = k * (1.0 + (a - 1.0) * v[6])
                vv = h * v[7]
                gate = jax.nn.sigmoid(h * v[8])
                vb = vv + (vf - vv) * gate
                y = kk.reshape(B, C) + vb
                # group norm over heads
                yh = y.reshape(B, H, N)
                mu = jnp.mean(yh, -1, keepdims=True)
                var = jnp.var(yh, -1, keepdims=True)
                yn = ((yh - mu) * jax.lax.rsqrt(var + 64e-5)).reshape(B, C)
                bonus = jnp.sum(
                    (k_in.reshape(B, H, N)) * rk[None], -1, keepdims=True)
                y2 = yn + (bonus * yh).reshape(B, C)
                out = y2 * gate
                x = x + out
                h2 = ln(x, v[0], v[1])
                ff = jnp.square(jax.nn.relu(h2 * v[9]))
                x = x + ff
                return (x, vb), ()
            (x, _), _ = jax.lax.scan(layer, (x, x * 0.5), (vecs, rks))
            return x * jax.lax.rsqrt(jnp.mean(x * x) + 1.0), ()
        x, _ = jax.lax.scan(step, x0, None, length=steps)
        return x

    # 3. LoRA stack: the fused za GEMM [B,2C]@[2C,SumD] f32 + per-gate
    #    activations, L-deep.
    D = cfg.decay_lora + cfg.a_lora + cfg.v_lora + cfg.gate_lora
    za = jnp.asarray(rng.normal(size=(L, 2 * C, D)).astype(np.float32)
                     * (2 * C) ** -0.5)
    zb = jnp.asarray(rng.normal(size=(L, D, 4 * C)).astype(np.float32)
                     * D ** -0.5)

    @jax.jit
    def lora_scan(x0, za, zb):
        def step(x, _):
            def layer(x, ab):
                A, Bm = ab
                z = jnp.concatenate([x, x * 0.5], -1)
                u = z @ A
                lo = jnp.tanh(u) @ Bm
                return x + 0.001 * lo[:, :C], ()
            x, _ = jax.lax.scan(layer, x, (za, zb))
            return x * jax.lax.rsqrt(jnp.mean(x * x) + 1.0), ()
        x, _ = jax.lax.scan(step, x0, None, length=steps)
        return x

    # 4. semantic sampler alone, exactly as the engine invokes it
    #    (fold per-slot raw threefry keys per step, filtered_probs + vmap'd
    #    inverse-CDF draw) at the engine's head_slice width.
    from rwkv_tts_tpu.runtime.engine import (SEMANTIC_SLICE, _fold_keys,
                                             _sample_batch)
    logits0 = jnp.asarray(
        rng.normal(size=(B, SEMANTIC_SLICE)).astype(np.float32))
    from rwkv_tts_tpu.utils.init import raw_threefry_key
    keys = jnp.asarray(np.stack([raw_threefry_key(s) for s in range(B)]))

    @jax.jit
    def sampler_scan(logits0, keys):
        def step(logits, i):
            ks = _fold_keys(keys, i)
            tok = _sample_batch(logits, ks, 1.0, 0.95, 80)
            logits = logits + tok[:, None].astype(jnp.float32) * 1e-6
            return logits, ()
        logits, _ = jax.lax.scan(step, logits0, jnp.arange(steps))
        return logits

    # 5. the bt WKV decode kernel alone: all L layers' single-token state
    #    update per step, state resident in the scan carry (bf16, as
    #    serving runs it).
    from rwkv_tts_tpu.ops.wkv7 import wkv7_single_bt_pallas
    sdt = jnp.bfloat16
    wkv0 = jnp.zeros((L, H, N, N, B), sdt)
    rv_bt = jnp.asarray(rng.normal(size=(L, H, N, B)).astype(np.float32)
                        * 0.05)

    @jax.jit
    def wkv_bt_scan(rv_bt, wkv0):
        def step(wkv, _):
            def layer(_, xs):
                rv1, s = xs
                # state flows in its storage dtype, as the engine's scan
                # carry does (in-kernel cast only)
                y, s2 = wkv7_single_bt_pallas(rv1, rv1, rv1, rv1, rv1, rv1,
                                              s)
                return (), (s2, y[0, 0, 0])
            _, (wkv, ys) = jax.lax.scan(layer, (), (rv_bt, wkv))
            return wkv, ys[0]
        wkv, outs = jax.lax.scan(step, wkv0, None, length=steps)
        return outs

    t1 = timeit(lambda: transpose_scan(x0), tag="transposes") / steps
    print(f"transposes (7/layer)  : {t1*1e3:8.3f} ms/step", flush=True)
    t2 = timeit(lambda: soup_scan(x0, vecs, rks), tag="soup") / steps
    print(f"elementwise soup      : {t2*1e3:8.3f} ms/step", flush=True)
    t3 = timeit(lambda: lora_scan(x0, za, zb), tag="loras") / steps
    print(f"lora GEMM stack (f32) : {t3*1e3:8.3f} ms/step", flush=True)
    t4 = timeit(lambda: sampler_scan(logits0, keys), tag="sampler") / steps
    print(f"semantic sampler      : {t4*1e3:8.3f} ms/step", flush=True)
    t5 = timeit(lambda: wkv_bt_scan(rv_bt, wkv0), tag="wkv_bt") / steps
    print(f"wkv bt kernel (L deep): {t5*1e3:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
