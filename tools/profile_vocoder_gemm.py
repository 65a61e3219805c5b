"""Vocoder conv-as-GEMM experiment: can bf16 dots beat XLA's f32 convs?

The Pallas kernel routes lost in context (custom-call fusion breakage,
docs/PERF.md) and im2col lost on patch materialization. The remaining
untried formulation is the SHIFTED-SUM of plain XLA dots: for stride-1,
y = Σ_k shift_k(xᵀ) @ W[:, :, k] — K bf16 [B·T, Ci]×[Ci, O] dots with f32
accumulation, no patch tensor, no custom call. k=1 convs degenerate to a
single dot.

Variants (in-context, full 8×512 bicodec.decode, real chip):
  native    f32 XLA convs (serving default)
  k1        k1 convs as single bf16 dots
  widek     k>1 stride-1 convs with Ci ≥ 384 as shifted-sum bf16 dots
  both      k1 + widek
Prints ms per decode + waveform RMS error vs native f32.

Usage: python tools/profile_vocoder_gemm.py [variant ...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu.config import BiCodecConfig
from rwkv_tts_tpu.models import bicodec

B = 8
S = 512


def _gemm_conv(x, w, b, dilation, padding):
    """Stride-1 conv1d as K shifted bf16 dots, f32 accumulation."""
    Bx, Ci, T = x.shape
    O, _, K = w.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    t_out = T + 2 * padding - dilation * (K - 1)
    xb = jnp.moveaxis(xp, 1, 2).astype(jnp.bfloat16)     # [B, Tp, Ci]
    acc = None
    for i in range(K):
        tap = jax.lax.slice_in_dim(xb, i * dilation, i * dilation + t_out,
                                   axis=1)
        wk = w[:, :, i].T.astype(jnp.bfloat16)           # [Ci, O]
        yi = jax.lax.dot_general(tap, wk, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = yi if acc is None else acc + yi
    if b is not None:
        acc = acc + b.astype(jnp.float32)[None, None, :]
    return jnp.moveaxis(acc, 1, 2).astype(x.dtype)


def make_dispatch(which):
    native = bicodec._conv1d

    def dispatch(x, w, b=None, stride=1, dilation=1, groups=1, padding=0):
        O, Ci, K = w.shape
        ok = stride == 1 and groups == 1 and O >= 96 and Ci >= 96
        if ok and K == 1 and which in ("k1", "both"):
            return _gemm_conv(x, w, b, dilation, padding)
        if ok and K > 1 and Ci >= 384 and which in ("widek", "both"):
            return _gemm_conv(x, w, b, dilation, padding)
        return native(x, w, b, stride, dilation, groups, padding)

    return dispatch


def main():
    variants = sys.argv[1:] or ["native", "k1", "widek", "both"]
    cfg = BiCodecConfig()
    params = bicodec.init_params(cfg, jax.random.PRNGKey(1), fast=True)
    g = jnp.zeros((B, 32), jnp.int32)
    s = jnp.zeros((B, S), jnp.int32)
    native = bicodec._conv1d
    ref_wav = None

    for which in variants:
        bicodec._conv1d = native if which == "native" else make_dispatch(which)
        jax.clear_caches()
        try:
            def f(p_, g_, s_, c_):
                return bicodec.decode.__wrapped__(p_, g_, s_, c_)

            jf = jax.jit(f, static_argnames=("c_",))
            t0 = time.perf_counter()
            wav = jf(params, g, s, cfg)
            jax.device_get(wav.ravel()[:1])
            compile_s = time.perf_counter() - t0
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                wav = jf(params, g, s, cfg)
            jax.device_get(wav.ravel()[:1])
            ms = (time.perf_counter() - t0) / n * 1000
            w_np = np.asarray(wav, np.float64)
            if which == "native":
                ref_wav = w_np
                err = 0.0
            else:
                err = float(np.sqrt(np.mean((w_np - ref_wav) ** 2))
                            / (np.sqrt(np.mean(ref_wav ** 2)) + 1e-12))
            print(f"{which:8s}: {ms:8.1f} ms/decode  (compile {compile_s:.0f}s)"
                  f"  rel RMS vs native {err:.4f}", flush=True)
        finally:
            bicodec._conv1d = native


if __name__ == "__main__":
    main()
