"""Vocoder conv benchmark: XLA native vs the Pallas MXU conv kernel.

Two views (real chip; micro-numbers through the axon tunnel are only
trustworthy at >=1 ms program sizes — docs/PERF.md "timing methodology"):

  shapes   — each wave-generator conv shape in isolation
             (the kernel wins everywhere: in-conv 2x, k1 up to 1.9x)
  decode   — the full 8x512 bicodec.decode with the kernel enabled for
             a dispatch subset (all | k1 | wide | narrow | native)
             (native wins in context: custom calls break XLA's
             snake/pad/cast fusion chains around its convs)

This asymmetry is why `BiCodecConfig.conv_impl` defaults to "native" —
see docs/PERF.md "measured and rejected".

Usage:
  python tools/profile_vocoder.py shapes
  python tools/profile_vocoder.py decode [all|k1|wide|narrow|native]
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
from rwkv_tts_tpu.ops.conv1d import conv1d_mxu

B = 8
# (label, Ci, O, T, K, dilation) — the wave-generator conv population at
# a 512-token utterance (dec_channels 1536, rates 8/5/4/2)
SHAPES = [
    ("in   1024->1536 T512 k7", 1024, 1536, 512, 7, 1),
    ("s1 768 T4096 k7 d1", 768, 768, 4096, 7, 1),
    ("s1 768 T4096 k7 d9", 768, 768, 4096, 7, 9),
    ("s1 768 T4096 k1", 768, 768, 4096, 1, 1),
    ("s2 384 T20480 k7 d9", 384, 384, 20480, 7, 9),
    ("s2 384 T20480 k1", 384, 384, 20480, 1, 1),
    ("s3 192 T81920 k7 d9", 192, 192, 81920, 7, 9),
    ("s3 192 T81920 k1", 192, 192, 81920, 1, 1),
    ("s4  96 T163840 k7 d9", 96, 96, 163840, 7, 9),
    ("s4  96 T163840 k1", 96, 96, 163840, 1, 1),
]

PREDS = {
    "all": lambda Ci, K: True,
    "k1": lambda Ci, K: K == 1,
    "wide": lambda Ci, K: Ci >= 384,
    "narrow": lambda Ci, K: Ci < 384,
    "native": None,
}


def _native_conv(x, w, b, dil, pad):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dil,), dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return (out + b[None, :, None]).astype(x.dtype)


def run_shapes():
    jnat = jax.jit(_native_conv, static_argnames=("dil", "pad"))
    for label, Ci, O, T, K, dil in SHAPES:
        pad = (K - 1) * dil // 2
        kx = jax.random.PRNGKey(0)
        x = jax.random.normal(kx, (B, Ci, T), jnp.float32)
        w = jax.random.normal(kx, (O, Ci, K), jnp.float32) * (Ci * K) ** -0.5
        b = jnp.zeros((O,), jnp.float32)
        gflop = 2 * B * T * Ci * O * K / 1e9
        n = max(3, int(3000 / gflop))
        res = {}
        for name, fn in (
                ("native", lambda: jnat(x, w, b, dil, pad)),
                ("mxu", lambda: conv1d_mxu(x, w, b, dilation=dil,
                                           padding=pad))):
            y = fn()
            jax.device_get(y.ravel()[:1])
            t0 = time.perf_counter()
            for _ in range(n):
                y = fn()
            jax.device_get(y.ravel()[:1])
            res[name] = (time.perf_counter() - t0) / n * 1000
        print(f"{label}: native {res['native']:.2f} ms "
              f"({gflop / res['native']:.0f} GF/ms) | mxu {res['mxu']:.2f} ms"
              f" ({gflop / res['mxu']:.0f} GF/ms)", flush=True)


def run_decode(which):
    pred = PREDS[which]
    native = bicodec._conv1d

    def dispatch(x, w, b=None, stride=1, dilation=1, groups=1, padding=0):
        O, Ci, K = w.shape
        if (stride == 1 and groups == 1 and O >= 96 and Ci >= 96
                and pred(Ci, K)):
            return conv1d_mxu(x, w, b, dilation=dilation, padding=padding,
                              compute_dtype=jnp.bfloat16, out_dtype=x.dtype)
        return native(x, w, b, stride, dilation, groups, padding)

    cfg = BiCodecConfig()
    params = bicodec.init_params(cfg, jax.random.PRNGKey(1), fast=True)
    g = jnp.zeros((B, 32), jnp.int32)
    s = jnp.zeros((B, 512), jnp.int32)
    if pred is not None:
        bicodec._conv1d = dispatch
    try:
        def f(p_, g_, s_, c_):
            return bicodec.decode.__wrapped__(p_, g_, s_, c_)

        jf = jax.jit(f, static_argnames=("c_",))
        w = jf(params, g, s, cfg)
        jax.device_get(w.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(10):
            w = jf(params, g, s, cfg)
        jax.device_get(w.ravel()[:1])
        print(f"decode[{which}]: {(time.perf_counter() - t0) / 10 * 1000:.1f}"
              " ms", flush=True)
    finally:
        bicodec._conv1d = native


def run_decode_impl(impl):
    """Time the full 8x512 decode at a BiCodecConfig.conv_impl setting
    ("native" | "mxu" | "mxu_fused") — the production dispatch, no
    monkeypatching."""
    import dataclasses
    cfg = dataclasses.replace(BiCodecConfig(), conv_impl=impl)
    params = bicodec.init_params(cfg, jax.random.PRNGKey(1), fast=True)
    g = jnp.zeros((B, 32), jnp.int32)
    s = jnp.zeros((B, 512), jnp.int32)
    w = bicodec.decode(params, g, s, cfg)
    jax.device_get(w.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(10):
        w = bicodec.decode(params, g, s, cfg)
    jax.device_get(w.ravel()[:1])
    print(f"decode[conv_impl={impl}]: "
          f"{(time.perf_counter() - t0) / 10 * 1000:.1f} ms", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "shapes"
    if mode == "shapes":
        run_shapes()
    elif mode == "impl":
        run_decode_impl(sys.argv[2] if len(sys.argv) > 2 else "mxu_fused")
    else:
        run_decode(sys.argv[2] if len(sys.argv) > 2 else "all")
