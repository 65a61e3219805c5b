"""BiCodec speech codec (SparkTTS architecture family) in JAX.

TPU-native replacement for the reference's two ONNX CPU sessions
(``BiCodecTokenize.onnx`` / ``BiCodecDetokenize.onnx``; I/O contracts at
src/ref_audio_utilities.rs:1047-1297 and 参考/C/tts/sparktts.cpp:155-276):

  encode:  mel [B, 128, 301] + wav2vec2 feat [B, T, 1024]
           → semantic_tokens [B, T] (codebook 8192, 50 Hz)
           + global_tokens [B, 32]  (codebook 4096)
  decode:  global_tokens [B, 32] + semantic_tokens [B, S]
           → waveform [B, S·320] @16 kHz

Components:
  * semantic branch — ConvNeXt-style 1-D backbone over the wav2vec2
    features, then a factorized vector quantizer (low-dim nearest-neighbor
    codebook with in/out projections);
  * global branch — ECAPA-style speaker encoder over the reference mel,
    pooled into 32 learned queries by cross-attention, quantized with FSQ
    (4 dims × 8 levels = 4096 codes per token);
  * decoder — semantic embeddings FiLM-conditioned on the speaker vector
    (rebuilt from the FSQ codes), upsampled 5×4×4×4 = 320× by transposed
    convs with dilated residual stacks, tanh head.

All stages are batched, static-shape, jit-compiled XLA graphs — no session
pool is needed because XLA executables are reentrant (the reference needed
N pooled ORT sessions, src/onnx_session_pool.rs:15-167).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import BiCodecConfig

Params = Dict[str, Any]

FSQ_LEVELS = (8, 8, 8, 8)                   # ∏ = 4096 = global codebook
SEMANTIC_CODE_DIM = 8                        # factorized VQ inner dim


# --------------------------------------------------------------------------
# small building blocks
# --------------------------------------------------------------------------

def _ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _conv1d(x, w, b=None, stride=1, dilation=1, groups=1, padding="SAME"):
    """x [B, C, T], w [O, I/groups, K]."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def _tconv1d(x, w, b=None, stride=1):
    """Transposed conv via input dilation: x [B, C, T], w [O, I, K=3·stride]
    → [B, O, T·stride] exactly (pad 2r−1 each side of the r-dilated input)."""
    k = w.shape[-1]
    assert k == 3 * stride, "kernel must be 3×stride for exact T·r output"
    pad = 2 * stride - 1
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def _convnext_block(p, x):
    """x [B, T, C] → [B, T, C]."""
    h = _conv1d(jnp.moveaxis(x, 1, 2), p["dw"], p["dw_b"],
                groups=x.shape[-1])
    h = jnp.moveaxis(h, 1, 2)
    h = _ln(h, p["ln_w"], p["ln_b"])
    h = jax.nn.gelu(h @ p["p1"] + p["p1_b"], approximate=True)
    h = h @ p["p2"] + p["p2_b"]
    return x + p["gamma"] * h


# --------------------------------------------------------------------------
# FSQ (finite scalar quantization) for global tokens
# --------------------------------------------------------------------------

def fsq_quantize(z: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """z [..., 4] → (codes [...], quantized [..., 4]).

    Each dim is bounded by tanh to (-1, 1), scaled to L levels, rounded.
    Code id = mixed-radix index over dims."""
    levels = jnp.asarray(FSQ_LEVELS, jnp.float32)
    half = (levels - 1.0) / 2.0
    bounded = jnp.tanh(z) * half + half            # [0, L-1]
    idx = jnp.round(bounded)
    radix = jnp.cumprod(jnp.asarray((1,) + FSQ_LEVELS[:-1]))
    code = jnp.sum(idx * radix, axis=-1).astype(jnp.int32)
    quant = (idx - half) / half                    # back to [-1, 1]
    return code, quant


def fsq_dequantize(code: jax.Array) -> jax.Array:
    """codes [...] → vectors [..., 4] in [-1, 1]."""
    levels = jnp.asarray(FSQ_LEVELS, jnp.int32)
    half = (levels.astype(jnp.float32) - 1.0) / 2.0
    radix = jnp.cumprod(jnp.asarray((1,) + FSQ_LEVELS[:-1]))
    idx = (code[..., None] // radix) % levels
    return (idx.astype(jnp.float32) - half) / half


# --------------------------------------------------------------------------
# parameter init
# --------------------------------------------------------------------------

def init_params(cfg: BiCodecConfig, key: jax.Array) -> Params:
    """Host-side NumPy init (utils/init.py): zero per-shape XLA compiles."""
    from ..utils.init import Initializer

    ini = Initializer(key)
    D = cfg.latent_dim

    def lin(i, o, scale=None):
        return jnp.asarray(ini.normal((i, o), scale if scale is not None else i ** -0.5))

    def cnx_block(dim, mult=3):
        return {
            "dw": jnp.asarray(ini.normal((dim, 1, 7), 7 ** -0.5)),
            "dw_b": jnp.asarray(ini.zeros((dim,))),
            "ln_w": jnp.asarray(ini.ones((dim,))),
            "ln_b": jnp.asarray(ini.zeros((dim,))),
            "p1": lin(dim, mult * dim),
            "p1_b": jnp.asarray(ini.zeros((mult * dim,))),
            "p2": lin(mult * dim, dim),
            "p2_b": jnp.asarray(ini.zeros((dim,))),
            "gamma": jnp.asarray(ini.full((dim,), 1e-2)),
        }

    # semantic encoder: 1024 -> D, 4 ConvNeXt blocks
    enc = {
        "inp": lin(cfg.feat_dim, D),
        "inp_b": jnp.asarray(ini.zeros((D,))),
        "blocks": [cnx_block(D) for _ in range(4)],
        "out_ln_w": jnp.asarray(ini.ones((D,))),
        "out_ln_b": jnp.asarray(ini.zeros((D,))),
    }
    # factorized VQ
    vq = {
        "proj_in": lin(D, SEMANTIC_CODE_DIM),
        "codebook": jnp.asarray(ini.normal((cfg.semantic_codebook, SEMANTIC_CODE_DIM))),
        "proj_out": lin(SEMANTIC_CODE_DIM, D),
    }
    # speaker encoder over mel [128, F]
    spk_dim = 256
    spk = {
        "c1": jnp.asarray(ini.normal((spk_dim, cfg.mel_bins, 5), (cfg.mel_bins * 5) ** -0.5)),
        "c1_b": jnp.asarray(ini.zeros((spk_dim,))),
        "res": [
            {
                "w": jnp.asarray(ini.normal((spk_dim, spk_dim, 3), (spk_dim * 3) ** -0.5)),
                "b": jnp.asarray(ini.zeros((spk_dim,))),
            }
            for _ in range(3)
        ],
        "queries": jnp.asarray(ini.normal((cfg.num_global_tokens, spk_dim), 0.02)),
        "q_proj": lin(spk_dim, spk_dim), "k_proj": lin(spk_dim, spk_dim),
        "v_proj": lin(spk_dim, spk_dim),
        "fsq_proj": lin(spk_dim, len(FSQ_LEVELS)),
    }
    # global-token -> condition vector
    cond_dim = 256
    glob_dec = {
        "emb": lin(len(FSQ_LEVELS), cond_dim, 0.5),
        "emb_b": jnp.asarray(ini.zeros((cond_dim,))),
        "mix": lin(cond_dim, cond_dim),
        "mix_b": jnp.asarray(ini.zeros((cond_dim,))),
    }
    # decoder / vocoder
    Dv = cfg.vocoder_dim
    ups = []
    ch = Dv
    for r in cfg.upsample_rates:
        out_ch = max(ch // 2, 32)
        ups.append({
            "t_w": jnp.asarray(ini.normal((out_ch, ch, 3 * r), (ch * 3 * r) ** -0.5)),
            "t_b": jnp.asarray(ini.zeros((out_ch,))),
            "res": [
                {
                    "w1": jnp.asarray(ini.normal((out_ch, out_ch, 3), (out_ch * 3) ** -0.5)),
                    "b1": jnp.asarray(ini.zeros((out_ch,))),
                    "w2": jnp.asarray(ini.normal((out_ch, out_ch, 3), (out_ch * 3) ** -0.5)),
                    "b2": jnp.asarray(ini.zeros((out_ch,))),
                }
                for _ in range(2)
            ],
            "film_scale": lin(cond_dim, out_ch, 0.01),
            "film_shift": lin(cond_dim, out_ch, 0.01),
        })
        ch = out_ch
    dec = {
        "prenet": lin(D, Dv), "prenet_b": jnp.asarray(ini.zeros((Dv,))),
        "ups": ups,
        "post_w": jnp.asarray(ini.normal((1, ch, 7), (ch * 7) ** -0.5)),
        "post_b": jnp.asarray(ini.zeros((1,))),
    }
    return {"encoder": enc, "vq": vq, "speaker": spk,
            "glob_dec": glob_dec, "decoder": dec}


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: Params, feat: jax.Array, mel: jax.Array,
           cfg: BiCodecConfig) -> Tuple[jax.Array, jax.Array]:
    """feat [B, T, 1024], mel [B, 128, F] → (semantic [B, T], global [B, 32])."""
    enc, vq, spk = params["encoder"], params["vq"], params["speaker"]

    # semantic branch
    x = feat @ enc["inp"] + enc["inp_b"]
    for blk in enc["blocks"]:
        x = _convnext_block(blk, x)
    x = _ln(x, enc["out_ln_w"], enc["out_ln_b"])
    z = x @ vq["proj_in"]                                    # [B, T, 8]
    d = (jnp.sum(z * z, -1, keepdims=True)
         - 2.0 * z @ vq["codebook"].T
         + jnp.sum(vq["codebook"] ** 2, -1)[None, None, :])
    semantic = jnp.argmin(d, axis=-1).astype(jnp.int32)      # [B, T]

    # global branch
    h = jax.nn.gelu(_conv1d(mel, spk["c1"], spk["c1_b"]), approximate=True)
    for r in spk["res"]:
        h = h + jax.nn.gelu(_conv1d(h, r["w"], r["b"]), approximate=True)
    h = jnp.moveaxis(h, 1, 2)                                 # [B, F, 256]
    q = spk["queries"] @ spk["q_proj"]                        # [32, 256]
    k = h @ spk["k_proj"]
    v = h @ spk["v_proj"]
    att = jax.nn.softmax(
        jnp.einsum("qd,bfd->bqf", q, k) * (q.shape[-1] ** -0.5), axis=-1)
    pooled = jnp.einsum("bqf,bfd->bqd", att, v)               # [B, 32, 256]
    zg = pooled @ spk["fsq_proj"]                             # [B, 32, 4]
    global_tokens, _ = fsq_quantize(zg)
    return semantic, global_tokens


# --------------------------------------------------------------------------
# decode path (BiCodecDetokenize parity)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def decode(params: Params, global_tokens: jax.Array, semantic_tokens: jax.Array,
           cfg: BiCodecConfig) -> jax.Array:
    """global [B, 32] + semantic [B, S] → wav [B, S·320] in (-1, 1)."""
    vq, gd, dec = params["vq"], params["glob_dec"], params["decoder"]

    z = vq["codebook"][semantic_tokens]                       # [B, S, 8]
    x = z @ vq["proj_out"]                                    # [B, S, D]

    gvec = fsq_dequantize(global_tokens)                      # [B, 32, 4]
    cond = jax.nn.gelu(gvec @ gd["emb"] + gd["emb_b"], approximate=True)
    cond = cond.mean(axis=1) @ gd["mix"] + gd["mix_b"]        # [B, 256]

    x = jnp.moveaxis(x @ dec["prenet"] + dec["prenet_b"], 1, 2)  # [B, Dv, S]
    for up in dec["ups"]:
        x = _tconv1d(jax.nn.gelu(x, approximate=True), up["t_w"], up["t_b"],
                     stride=x_stride(up))
        scale = 1.0 + cond @ up["film_scale"]
        shift = cond @ up["film_shift"]
        x = x * scale[:, :, None] + shift[:, :, None]
        for r in up["res"]:
            h = jax.nn.gelu(x, approximate=True)
            h = _conv1d(h, r["w1"], r["b1"], dilation=1)
            h = jax.nn.gelu(h, approximate=True)
            h = _conv1d(h, r["w2"], r["b2"], dilation=3)
            x = x + h
    x = _conv1d(jax.nn.gelu(x, approximate=True), dec["post_w"], dec["post_b"])
    return jnp.tanh(x[:, 0, :])


def x_stride(up) -> int:
    """Upsample rate is a third of the transposed-conv kernel length."""
    return up["t_w"].shape[-1] // 3


# --------------------------------------------------------------------------
# convenience host wrappers
# --------------------------------------------------------------------------

DETOKENIZE_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _detok_bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // buckets[-1]) * buckets[-1]


def detokenize(params, global_tokens, semantic_tokens, cfg,
               bucket=DETOKENIZE_BUCKETS):
    """Host wrapper: pads the semantic sequence up to an exponential bucket
    (≤ 6 compiled shapes for the 2048-token range, vs one per 64-multiple),
    decodes, trims to S·320 samples (parity: detokenizer resize + run,
    参考/C/tts/sparktts.cpp:221-276). ``bucket`` may be an int (fixed
    multiple) or a sequence of bucket sizes."""
    import numpy as np
    g = jnp.asarray(global_tokens, jnp.int32)[None] \
        if jnp.asarray(global_tokens).ndim == 1 else jnp.asarray(global_tokens, jnp.int32)
    s = np.asarray(semantic_tokens, np.int32)
    if s.ndim == 1:
        s = s[None]
    S = s.shape[1]
    if S == 0:
        return np.zeros((s.shape[0], 0), np.float32)
    if isinstance(bucket, int):
        padded = S + ((-S) % bucket)
    else:
        padded = _detok_bucket(S, tuple(bucket))
    s_pad = np.pad(s, ((0, 0), (0, padded - S)))
    wav = decode(params, g, jnp.asarray(s_pad), cfg)
    hop = 320
    return np.asarray(wav[:, : S * hop], np.float32)
