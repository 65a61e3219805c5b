"""BiCodec speech codec (SparkTTS) in JAX — the real architecture.

TPU-native replacement for the reference's two ONNX CPU sessions
(``BiCodecTokenize.onnx`` / ``BiCodecDetokenize.onnx``; I/O contracts at
src/ref_audio_utilities.rs:1047-1297 and 参考/C/tts/sparktts.cpp:155-276):

  encode:  mel [B, 128, 301] + wav2vec2 feat [B, T, 1024]
           → semantic_tokens [B, T] (codebook 8192, 50 Hz)
           + global_tokens  [B, 32] (codebook 4096 = ∏ FSQ levels 4^6)
  decode:  global_tokens [B, 32] + semantic_tokens [B, S]
           → waveform [B, S·320] @16 kHz

Architecture (the published SparkTTS BiCodec component graph — those ONNX
files are exports of it):

  * semantic branch — Vocos/ConvNeXt backbone over the wav2vec2 features
    (embed conv k7 → LN → 12 ConvNeXt blocks @ dim 384/inter 2048 → LN),
    two ratio-1 sampling stages each followed by a 2-layer backbone,
    projection to 1024, then a *factorized* vector quantizer: 1×1
    weight-normed conv down to 8 dims, L2-normalized nearest-neighbor
    search over an 8192×8 codebook (codes decode UN-normalized).
  * global branch — ECAPA-TDNN speaker encoder over the reference mel
    (conv k5 → 3 SE-Res2Blocks(scale 8, dil 2/3/4) with summed skips →
    1×1 conv to 1536), a 2-layer perceiver resampler pooling the 1536-d
    time features into 32 learned 128-d latents, then FSQ (levels 4^6,
    project 128→6→round→128); the speaker vector is the flattened
    quantized latents projected 4096 → 1024.
  * decode — semantic codes → out-project 8→1024, a 12-layer Vocos
    prenet whose LayerNorms are AdaLN-conditioned on the speaker vector,
    plus the speaker vector broadcast-added, into a DAC-style wave
    generator: conv k7 → 4 × [snake → tconv(k,r ∈ 16/8, 11/5, 8/4, 4/2,
    pad (k−r)/2 — exact ×r upsample) → 3 dilated residual units
    (snake-conv k7 d∈{1,3,9}-snake-conv k1)] → snake → conv k7 → tanh.
    ∏ rates = 320 = the token hop.

All stages are batched, static-shape, jit-compiled XLA graphs — no
session pool is needed because XLA executables are reentrant (the
reference pooled N ORT sessions, src/onnx_session_pool.rs:15-167).

Weights: ``models/convert.load_bicodec_weights`` maps a torch-style
BiCodec state dict onto these pytrees (weight-norm g/v pairs folded).
When only the ONNX exports are available, ``models/onnx_graph`` runs
them directly — that transpiled path is the parity ground truth; where
a detail of this hand-written fast path is a reconstruction (flatten
order of the quantized speaker latents, perceiver norm placement, ECAPA
skip wiring — marked RECONSTRUCTION below), load-time cross-validation
against the transpiled graph decides (runtime/pipeline.py).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import BiCodecConfig

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def _ln(x, w, b, eps=1e-6):
    """LayerNorm; statistics in f32 regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32) \
        + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _ada_ln(p, x, cond, eps=1e-6):
    """AdaLayerNorm: scale/shift regressed from the condition vector.
    x [B, T, D], cond [B, C]. Statistics in f32."""
    f32 = jnp.float32
    cf = cond.astype(f32)
    scale = cf @ p["scale_w"].astype(f32) + p["scale_b"].astype(f32)
    shift = cf @ p["shift_w"].astype(f32) + p["shift_b"].astype(f32)
    xf = x.astype(f32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * scale[:, None, :] + shift[:, None, :]).astype(x.dtype)


def _rms_norm(x, g, eps=1e-8):
    xf = x.astype(jnp.float32)
    scale = x.shape[-1] ** 0.5
    n = xf * jax.lax.rsqrt(jnp.sum(xf * xf, -1, keepdims=True) + eps)
    return (n * scale * g.astype(jnp.float32)).astype(x.dtype)


def _conv1d_im2col(x, w, b, dilation, padding):
    """Stride-1 conv1d as an explicit patches @ weights GEMM.

    Built to chase the 4× bf16 MXU rate that XLA's conv lowering leaves on
    the table — and MEASURED SLOWER on v5e (202 vs 136 ms for the full
    8×512 decode): the [B, T, K·C] patch materialization + transpose costs
    more HBM than the MXU saves, and bf16 error compounds ~25% RMS through
    the four upsampling stages. Kept as tuning infrastructure (numerics
    tested equal to :func:`_conv1d`); not on any dispatch path —
    docs/PERF.md "measured and rejected"."""
    B, Ci, T = x.shape
    O, _, K = w.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    t_out = T + 2 * padding - dilation * (K - 1)
    taps = [xp[:, :, i * dilation: i * dilation + t_out] for i in range(K)]
    patches = jnp.stack(taps, axis=1).reshape(B, K * Ci, t_out)
    pm = jnp.moveaxis(patches, 1, 2)                     # [B, T_out, K·Ci]
    wm = jnp.transpose(w, (2, 1, 0)).reshape(K * Ci, O).astype(x.dtype)
    y = jax.lax.dot_general(pm, wm, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)[None, None, :]
    return jnp.moveaxis(y, 1, 2).astype(x.dtype)


def _conv1d(x, w, b=None, stride=1, dilation=1, groups=1, padding=0):
    """x [B, C, T], w [O, I/groups, K], symmetric int padding. Accumulates
    in f32 (MXU native) and returns ``x.dtype``. Under the bf16 compute
    policy the convs run at the bf16 operand width with f32 accumulation
    (the im2col GEMM alternative measured slower — see above)."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,),
        padding=[(padding, padding)] if isinstance(padding, int) else padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)[None, :, None]
    return out.astype(x.dtype)


def _tconv1d(x, w, b=None, stride=1, padding=0):
    """ConvTranspose1d, torch weight layout [I, O, K], symmetric padding.
    With k, s, p = (k−s)//2 and (k−s) even this is an exact ×s upsample.
    f32 accumulation; returns ``x.dtype`` (see :func:`_conv1d`)."""
    k = w.shape[-1]
    wf = jnp.swapaxes(jnp.flip(w, -1), 0, 1)          # [O, I, K]
    lo = k - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, wf.astype(x.dtype), window_strides=(1,), padding=[(lo, lo)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)[None, :, None]
    return out.astype(x.dtype)


def _snake(x, alpha):
    """Snake activation (DAC): x + sin²(αx)/α, α per channel [C].
    Computed in f32 (sin argument precision matters)."""
    a = alpha.astype(jnp.float32)[None, :, None]
    xf = x.astype(jnp.float32)
    return (xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)).astype(x.dtype)


# --------------------------------------------------------------------------
# Vocos backbone (ConvNeXt-1D)
# --------------------------------------------------------------------------

def _convnext_block(p, x, cond=None):
    """x [B, T, D] → [B, T, D]."""
    h = _conv1d(jnp.moveaxis(x, 1, 2), p["dw_w"], p["dw_b"],
                groups=x.shape[-1], padding=p["dw_w"].shape[-1] // 2)
    h = jnp.moveaxis(h, 1, 2)
    if cond is not None:
        h = _ada_ln(p["norm"], h, cond)
    else:
        h = _ln(h, p["norm_w"], p["norm_b"])
    h = jax.nn.gelu(h @ p["pw1_w"] + p["pw1_b"], approximate=False)
    h = h @ p["pw2_w"] + p["pw2_b"]
    if p.get("gamma") is not None:
        h = p["gamma"] * h
    return x + h


def _vocos_backbone(p, x, cond=None):
    """x [B, C_in, T] → [B, T, dim]. Embed conv k7, pre-norm (AdaLN when
    conditioned), N ConvNeXt blocks, final LN."""
    h = _conv1d(x, p["embed_w"], p["embed_b"],
                padding=p["embed_w"].shape[-1] // 2)
    h = jnp.moveaxis(h, 1, 2)
    if cond is not None:
        h = _ada_ln(p["norm"], h, cond)
    else:
        h = _ln(h, p["norm_w"], p["norm_b"])
    for blk in p["blocks"]:
        h = _convnext_block(blk, h, cond)
    return _ln(h, p["final_ln_w"], p["final_ln_b"])


def _sampling_block(p, x, up: int = 1, down: int = 1):
    """SamplingBlock semantics: x [B, T, D] → [B, D, T·up/down].
    ratio-1 blocks (the shipped config) are a pure transpose; the general
    paths mirror repeat+deconv upsampling / conv+avgpool downsampling."""
    x = jnp.moveaxis(x, 1, 2)                          # [B, D, T]
    if up > 1:
        rep = jnp.repeat(x, up, axis=2)
        dec = _tconv1d(jax.nn.leaky_relu(x, 0.2), p["up_w"], p["up_b"],
                       stride=up, padding=up // 2 + up % 2)
        # output_padding=up%2 under torch; exact-length slice
        dec = dec[..., : rep.shape[-1]]
        x = rep + dec
        rep_res = rep
    else:
        rep_res = x
    if down > 1:
        conv = _conv1d(jax.nn.leaky_relu(x, 0.2), p["down_w"], p["down_b"],
                       stride=down, padding=down // 2 + down % 2)
        T = x.shape[-1] // down
        pool = x[..., : T * down].reshape(*x.shape[:2], T, down).mean(-1)
        pool_rep = rep_res[..., : T * down].reshape(
            *x.shape[:2], T, down).mean(-1)
        x = conv[..., : T] + pool + pool_rep
    return x


# --------------------------------------------------------------------------
# factorized vector quantizer (semantic tokens)
# --------------------------------------------------------------------------

def fvq_tokenize(p, z, l2_norm: bool = True):
    """z [B, D, T] → indices [B, T]. in-project (1×1 conv) to the 8-dim
    code space, L2-normalized nearest neighbor; ties → lowest index."""
    ze = jnp.einsum("bdt,dc->btc", z, p["in_w"]) + p["in_b"]
    cb = p["codebook"]
    if l2_norm:
        ze = ze * jax.lax.rsqrt(jnp.sum(ze * ze, -1, keepdims=True) + 1e-12)
        cb = cb * jax.lax.rsqrt(jnp.sum(cb * cb, -1, keepdims=True) + 1e-12)
    d = (jnp.sum(ze * ze, -1, keepdims=True)
         - 2.0 * ze @ cb.T
         + jnp.sum(cb * cb, -1)[None, None, :])
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def fvq_detokenize(p, idx):
    """indices [B, T] → z_q [B, D, T] (un-normalized codebook rows,
    out-projected)."""
    zq = p["codebook"][idx]                            # [B, T, 8]
    out = jnp.einsum("btc,cd->btd", zq, p["out_w"]) + p["out_b"]
    return jnp.moveaxis(out, 1, 2)


# --------------------------------------------------------------------------
# FSQ (finite scalar quantization) for global tokens
# --------------------------------------------------------------------------

def _fsq_bound(z, levels, eps=1e-3):
    lv = jnp.asarray(levels, jnp.float32)
    half_l = (lv - 1.0) * (1.0 + eps) / 2.0
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def fsq_quantize(z, levels) -> Tuple[jax.Array, jax.Array]:
    """z [..., d] → (codes [...], normalized quantized [..., d]).
    vector-quantize-pytorch FSQ semantics: bound → round → /half_width;
    index = Σ digit·∏levels[:i]."""
    lv = jnp.asarray(levels, jnp.int32)
    half_w = lv // 2
    q = jnp.round(_fsq_bound(z, levels))               # integers around 0
    digits = q + half_w.astype(jnp.float32)            # [0, L)
    basis = jnp.cumprod(jnp.concatenate(
        [jnp.ones((1,), jnp.int32), jnp.asarray(levels, jnp.int32)[:-1]]))
    code = jnp.sum(digits.astype(jnp.int32) * basis, axis=-1)
    return code.astype(jnp.int32), q / half_w.astype(jnp.float32)


def fsq_dequantize(code, levels) -> jax.Array:
    """codes [...] → normalized vectors [..., d]."""
    lv = jnp.asarray(levels, jnp.int32)
    basis = jnp.cumprod(jnp.concatenate(
        [jnp.ones((1,), jnp.int32), lv[:-1]]))
    digits = (code[..., None].astype(jnp.int32) // basis) % lv
    half_w = (lv // 2).astype(jnp.float32)
    return (digits.astype(jnp.float32) - half_w) / half_w


# --------------------------------------------------------------------------
# ECAPA-TDNN speaker encoder (time features for the perceiver)
# --------------------------------------------------------------------------

def _bn1d(p, x, eps=1e-5):
    """Inference BatchNorm over channel dim of [B, C, T] (or [B, C])."""
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"].reshape(shape)) * inv.reshape(shape) \
        * p["w"].reshape(shape) + p["b"].reshape(shape)


def _conv_relu_bn(p, x, dilation=1):
    k = p["w"].shape[-1]
    pad = (k - 1) * dilation // 2
    h = _conv1d(x, p["w"], p["b"], dilation=dilation, padding=pad)
    return _bn1d(p["bn"], jax.nn.relu(h))


def _res2_block(p, x, dilation, scale=8):
    """Res2Net conv over channel groups with cascading adds."""
    width = x.shape[1] // scale
    parts = [x[:, i * width:(i + 1) * width] for i in range(scale)]
    outs = []
    sp = None
    for i, conv in enumerate(p["convs"]):
        sp = parts[i] if i == 0 else sp + parts[i]
        k = conv["w"].shape[-1]
        sp = _conv1d(sp, conv["w"], conv["b"], dilation=dilation,
                     padding=(k - 1) * dilation // 2)
        sp = _bn1d(conv["bn"], jax.nn.relu(sp))
        outs.append(sp)
    outs.append(parts[-1])
    return jnp.concatenate(outs, axis=1)


def _se_connect(p, x):
    s = x.mean(-1)                                      # [B, C]
    s = jax.nn.relu(s @ p["w1"] + p["b1"])
    s = jax.nn.sigmoid(s @ p["w2"] + p["b2"])
    return x * s[:, :, None]


def _se_res2_block(p, x, dilation):
    h = _conv_relu_bn(p["conv1"], x)
    h = _res2_block(p["res2"], h, dilation)
    h = _conv_relu_bn(p["conv2"], h)
    h = _se_connect(p["se"], h)
    return h + x


def ecapa_features(p, mel):
    """mel [B, n_mels, T] → time features [B, 3·channels, T] (the latent
    the perceiver pools; relu(conv1x1(cat(block outputs))))."""
    h = _conv_relu_bn(p["layer1"], mel)
    # RECONSTRUCTION: summed skip inputs between blocks (ECAPA paper /
    # wespeaker wiring); ONNX-transpiled path is authoritative.
    o1 = _se_res2_block(p["layer2"], h, 2)
    o2 = _se_res2_block(p["layer3"], h + o1, 3)
    o3 = _se_res2_block(p["layer4"], h + o1 + o2, 4)
    cat = jnp.concatenate([o1, o2, o3], axis=1)
    k = p["mfa_w"].shape[-1]
    return jax.nn.relu(_conv1d(cat, p["mfa_w"], p["mfa_b"],
                               padding=k // 2))


def ecapa_embedding(p, latent):
    """Attentive-stat-pool x-vector head (kept for state-dict parity /
    the forward() path; tokenize/detokenize don't consume it)."""
    mean = latent.mean(-1, keepdims=True)
    std = jnp.sqrt(jnp.var(latent, axis=-1, keepdims=True) + 1e-7)
    ctx = jnp.concatenate(
        [latent, jnp.broadcast_to(mean, latent.shape),
         jnp.broadcast_to(std, latent.shape)], axis=1)
    a = jnp.tanh(_conv1d(ctx, p["att1_w"], p["att1_b"]))
    a = jax.nn.softmax(_conv1d(a, p["att2_w"], p["att2_b"]), axis=-1)
    mu = jnp.sum(a * latent, axis=-1)
    var = jnp.sum(a * latent ** 2, axis=-1) - mu ** 2
    stats = jnp.concatenate([mu, jnp.sqrt(jnp.clip(var, 1e-7))], axis=1)
    stats = _bn1d(p["bn"], stats)
    return stats @ p["fc_w"] + p["fc_b"]


# --------------------------------------------------------------------------
# perceiver resampler (32 learned latents over the ECAPA features)
# --------------------------------------------------------------------------

def _perceiver_attention(p, lat, ctx, heads, dim_head):
    """Cross-attention with queries included in the context
    (cross_attn_include_queries=True)."""
    B, N, D = lat.shape
    kv_src = jnp.concatenate([lat, ctx], axis=1)
    q = (lat @ p["q_w"]).reshape(B, N, heads, dim_head)
    kv = kv_src @ p["kv_w"]
    k, v = jnp.split(kv, 2, axis=-1)
    M = kv_src.shape[1]
    k = k.reshape(B, M, heads, dim_head)
    v = v.reshape(B, M, heads, dim_head)
    att = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (dim_head ** -0.5)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, -1)
    return out @ p["out_w"]


def perceiver_resample(p, ctx, heads: int, dim_head: int):
    """ctx [B, T, C_ctx] → latents [B, num_latents, dim]."""
    ctx = ctx @ p["ctx_w"] + p["ctx_b"]
    lat = jnp.broadcast_to(p["latents"],
                           (ctx.shape[0],) + p["latents"].shape)
    for layer in p["layers"]:
        lat = _perceiver_attention(layer["attn"], lat, ctx,
                                   heads, dim_head) + lat
        h = jax.nn.gelu(lat @ layer["ff1_w"] + layer["ff1_b"],
                        approximate=False)
        lat = (h @ layer["ff2_w"] + layer["ff2_b"]) + lat
    return _rms_norm(lat, p["norm_g"])


# --------------------------------------------------------------------------
# speaker branch: tokenize / detokenize
# --------------------------------------------------------------------------

def speaker_tokenize(p, mel, cfg: BiCodecConfig):
    """mel [B, n_mels, T] → global tokens [B, 32]."""
    feats = ecapa_features(p["ecapa"], mel)
    lat = perceiver_resample(p["perceiver"], jnp.moveaxis(feats, 1, 2),
                             cfg.perceiver_heads, cfg.perceiver_dim_head)
    z = lat @ p["fsq_in_w"] + p["fsq_in_b"]            # [B, 32, 6]
    codes, _ = fsq_quantize(z, cfg.fsq_levels)
    return codes


def speaker_detokenize(p, codes, cfg: BiCodecConfig):
    """global tokens [B, 32] → speaker vector d [B, out_dim]."""
    q = fsq_dequantize(codes, cfg.fsq_levels)          # [B, 32, 6]
    lat = q @ p["fsq_out_w"] + p["fsq_out_b"]          # [B, 32, latent]
    # RECONSTRUCTION: flatten the quantized latents channel-major
    # ([B, latent, 32] row-major), matching the channel-first reshape in
    # the torch module; verified against the ONNX graph when present.
    flat = jnp.moveaxis(lat, 1, 2).reshape(lat.shape[0], -1)
    return flat @ p["proj_w"] + p["proj_b"]


# --------------------------------------------------------------------------
# encoder / decoder
# --------------------------------------------------------------------------

def encoder_forward(p, feat, cfg: BiCodecConfig):
    """wav2vec2 features [B, T, 1024] → latent z [B, 1024, T]."""
    h = _vocos_backbone(p["backbone"], jnp.moveaxis(feat, 1, 2))
    for ratio, stage in zip(cfg.encoder_ratios, p["stages"]):
        h = _sampling_block(stage.get("sampler", {}), h, down=ratio)
        h = _vocos_backbone(stage["vocos"], h)
    h = h @ p["project_w"] + p["project_b"]            # [B, T, out]
    return jnp.moveaxis(h, 1, 2)


def prenet_forward(p, zq, cond, cfg: BiCodecConfig):
    """z_q [B, 1024, S] + condition [B, 1024] → [B, 1024, S]."""
    h = jnp.moveaxis(zq, 1, 2) @ p["pre_w"] + p["pre_b"]
    for ratio, stage in zip(cfg.prenet_ratios, p["stages"]):
        h = _sampling_block(stage.get("sampler", {}), h, up=ratio)
        h = _vocos_backbone(stage["vocos"], h)
    h = _vocos_backbone(p["backbone"], jnp.moveaxis(h, 1, 2), cond=cond)
    h = h @ p["out_w"] + p["out_b"]
    return jnp.moveaxis(h, 1, 2)


def _wavegen_conv(cfg: BiCodecConfig):
    """Conv backend for the wave generator, per ``cfg.conv_impl``.

    "mxu" routes the stride-1 k7/k1 convs (the generator's FLOP bulk —
    docs/PERF.md "BiCodec vocoder precision policy") to the Pallas
    bf16-MXU kernel (ops/conv1d.conv1d_mxu); tconvs, the 1-channel
    output conv and any grouped conv stay on the XLA path. "mxu_fused"
    additionally fuses each residual unit's snake prologues and residual
    add INTO the kernel (see _residual_unit_fused). CPU (tests) runs the
    kernel in interpret mode so the policy stays testable."""
    if cfg.conv_impl not in ("mxu", "mxu_fused"):
        return _conv1d
    from ..ops.conv1d import conv1d_mxu
    interp = jax.default_backend() != "tpu"

    def conv(x, w, b=None, stride=1, dilation=1, groups=1, padding=0):
        O, Ci, K = w.shape
        if stride == 1 and groups == 1 and O >= 96 and Ci >= 96:
            return conv1d_mxu(x, w, b, dilation=dilation, padding=padding,
                              compute_dtype=jnp.bfloat16, out_dtype=x.dtype,
                              interpret=interp)
        return _conv1d(x, w, b, stride, dilation, groups, padding)

    return conv


def _residual_unit(p, x, dilation, conv=_conv1d):
    k = p["w1"].shape[-1]
    h = _snake(x, p["alpha1"])
    h = conv(h, p["w1"], p["b1"], dilation=dilation,
             padding=(k - 1) * dilation // 2)
    h = _snake(h, p["alpha2"])
    h = conv(h, p["w2"], p["b2"])
    return x + h


def _residual_unit_fused(p, x, dilation, interp):
    """x + conv_k1(snake(conv_k7(snake(x)))) in exactly TWO kernel calls.

    Both snakes and the residual add ride the conv kernels' fused
    prologue/epilogue (ops/conv1d.conv1d_mxu), so the unit launches no
    standalone elementwise pass over the [B, C, T] activations — the
    in-context cost that made the bare "mxu" dispatch slower than XLA's
    natively-fused convs (docs/PERF.md "Pallas MXU conv kernel")."""
    from ..ops.conv1d import conv1d_mxu

    k = p["w1"].shape[-1]
    h = conv1d_mxu(x, p["w1"], p["b1"], dilation=dilation,
                   padding=(k - 1) * dilation // 2,
                   compute_dtype=jnp.bfloat16, out_dtype=x.dtype,
                   interpret=interp, snake_alpha=p["alpha1"])
    return conv1d_mxu(h, p["w2"], p["b2"], compute_dtype=jnp.bfloat16,
                      out_dtype=x.dtype, interpret=interp,
                      snake_alpha=p["alpha2"], residual=x)


def wave_generator(p, x, cfg: BiCodecConfig):
    """x [B, 1024, S] → wav [B, S·320] in (−1, 1). DAC-style decoder."""
    conv = _wavegen_conv(cfg)
    fused = cfg.conv_impl == "mxu_fused"
    interp = jax.default_backend() != "tpu"
    h = conv(x, p["in_w"], p["in_b"], padding=p["in_w"].shape[-1] // 2)
    for blk, rate, k in zip(p["blocks"], cfg.dec_rates, cfg.dec_kernels):
        h = _snake(h, blk["alpha"])
        h = _tconv1d(h, blk["up_w"], blk["up_b"], stride=rate,
                     padding=(k - rate) // 2)
        for ru, d in zip(blk["res"], (1, 3, 9)):
            if fused and min(ru["w1"].shape[0], ru["w1"].shape[1]) >= 96:
                h = _residual_unit_fused(ru, h, d, interp)
            else:
                h = _residual_unit(ru, h, d, conv=conv)
    h = _snake(h, p["alpha_out"])
    h = _conv1d(h, p["out_w"], p["out_b"], padding=p["out_w"].shape[-1] // 2)
    return jnp.tanh(h[:, 0, :].astype(jnp.float32))


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: Params, feat: jax.Array, mel: jax.Array,
           cfg: BiCodecConfig) -> Tuple[jax.Array, jax.Array]:
    """feat [B, T, 1024], mel [B, 128, F] → (semantic [B, T], global [B, 32]).
    Parity: BiCodecTokenize.onnx (ref_audio_utilities.rs:1047-1257).

    Shape note: T tracks the ref audio's length, so each distinct clip
    length compiles a fresh executable (ONNX Runtime was dynamic-shape;
    XLA is not). Padding cannot fix this exactly — the encoder stages see
    the whole sequence, so padded frames would perturb real tokens.
    Enrollment is a rare admin action; the persistent compilation cache
    (enabled by server main()) absorbs repeats across restarts, and
    pipeline.extract_voice_tokens_cached dedupes identical files."""
    z = encoder_forward(params["encoder"], feat, cfg)
    semantic = fvq_tokenize(params["quantizer"], z, cfg.vq_l2_norm)
    global_tokens = speaker_tokenize(params["speaker"], mel, cfg)
    return semantic, global_tokens


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode(params: Params, global_tokens: jax.Array, semantic_tokens: jax.Array,
           cfg: BiCodecConfig) -> jax.Array:
    """global [B, 32] + semantic [B, S] → wav [B, S·320] f32.
    Parity: BiCodecDetokenize.onnx (ref_audio_utilities.rs:1259-1297):
    prenet(z_q, d) + d, then the wave generator.

    ``cfg.dtype`` is the compute policy: with "bfloat16" the conv/matmul
    FLOPs (the DAC wave generator is compute-bound: ~4.5 TFLOP per
    8×512-token call, 141 of 147 ms at f32 on v5e) run at the 4× bf16 MXU
    rate with f32 accumulation; norms, snake and the output tanh stay in
    f32. Default "float32" keeps CPU tests and torch-parity exact.
    """
    cdt = jnp.dtype(cfg.dtype)
    # no-op when the tree was pre-cast at load — do that for serving: this
    # in-graph fallback converts every weight per CALL, a real HBM tax for
    # the per-chunk streaming vocoder
    params = prepare_params(params, cfg)
    zq = fvq_detokenize(params["quantizer"], semantic_tokens).astype(cdt)
    d = speaker_detokenize(params["speaker"], global_tokens, cfg).astype(cdt)
    x = prenet_forward(params["prenet"], zq, d, cfg)
    x = x + d[:, :, None]
    return wave_generator(params["wavegen"], x, cfg)


def prepare_params(params: Params, cfg: BiCodecConfig) -> Params:
    """One-time cast to the cfg.dtype compute policy — of the
    DECODE-EXCLUSIVE subtrees only (prenet + wavegen, where the vocoder
    FLOPs live). The encoder/quantizer/speaker trees are shared with the
    ENCODE path (pipeline.extract_voice_tokens uses the same tree), whose
    FSQ rounding and FVQ nearest-neighbor argmin can flip on near-ties —
    bf16-rounding them would silently drift voice-clone tokens from the
    f32 reference. decode() casts the (tiny) detokenize outputs to
    cfg.dtype itself, so its numerics are unchanged by the scoping. Call
    at load so the per-call conversion becomes a no-op."""
    cdt = jnp.dtype(cfg.dtype)
    if cdt == jnp.float32 or not isinstance(params, dict):
        return params
    cast = jax.tree_util.tree_map(
        lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a,
        {k: params[k] for k in ("prenet", "wavegen") if k in params})
    return {**params, **cast}


# --------------------------------------------------------------------------
# parameter init (host-side numpy; see utils/init.py re: axon transfers)
# --------------------------------------------------------------------------

def init_params(cfg: BiCodecConfig, key: jax.Array,
                fast: bool = False) -> Params:
    from ..utils.init import Initializer

    ini = Initializer(key, fast=fast)

    def lin(i, o, scale=None):
        return jnp.asarray(ini.normal((i, o), scale if scale is not None
                                      else i ** -0.5))

    def zeros(*s):
        return jnp.asarray(ini.zeros(s))

    def ones(*s):
        return jnp.asarray(ini.ones(s))

    def conv(o, i, k):
        return jnp.asarray(ini.normal((o, i, k), (i * k) ** -0.5))

    def ada(c, d):
        return {"scale_w": lin(c, d, 0.02), "scale_b": ones(d),
                "shift_w": lin(c, d, 0.02), "shift_b": zeros(d)}

    def cnx_block(dim, inter, n_layers, cond_dim=None):
        p = {
            "dw_w": conv(dim, 1, 7), "dw_b": zeros(dim),
            "pw1_w": lin(dim, inter), "pw1_b": zeros(inter),
            "pw2_w": lin(inter, dim), "pw2_b": zeros(dim),
            "gamma": jnp.asarray(ini.full((dim,), 1.0 / n_layers)),
        }
        if cond_dim is not None:
            p["norm"] = ada(cond_dim, dim)
        else:
            p["norm_w"] = ones(dim)
            p["norm_b"] = zeros(dim)
        return p

    def vocos(c_in, dim, inter, layers, cond_dim=None):
        p = {
            "embed_w": conv(dim, c_in, 7), "embed_b": zeros(dim),
            "blocks": [cnx_block(dim, inter, layers, cond_dim)
                       for _ in range(layers)],
            "final_ln_w": ones(dim), "final_ln_b": zeros(dim),
        }
        if cond_dim is not None:
            p["norm"] = ada(cond_dim, dim)
        else:
            p["norm_w"] = ones(dim)
            p["norm_b"] = zeros(dim)
        return p

    D = cfg.encoder_dim
    enc = {
        "backbone": vocos(cfg.feat_dim, D, cfg.encoder_inter_dim,
                          cfg.encoder_layers),
        "stages": [{"vocos": vocos(D, D, cfg.encoder_inter_dim, 2)}
                   for _ in cfg.encoder_ratios],
        "project_w": lin(D, cfg.encoder_out), "project_b": zeros(cfg.encoder_out),
    }

    vq = {
        "in_w": lin(cfg.encoder_out, cfg.codebook_dim),
        "in_b": zeros(cfg.codebook_dim),
        "codebook": jnp.asarray(ini.normal(
            (cfg.semantic_codebook, cfg.codebook_dim))),
        "out_w": lin(cfg.codebook_dim, cfg.encoder_out, 0.5),
        "out_b": zeros(cfg.encoder_out),
    }

    # ECAPA
    ch = cfg.spk_channels
    scale = 8
    width = ch // scale

    def crb(i, o, k):
        return {"w": conv(o, i, k), "b": zeros(o),
                "bn": {"w": ones(o), "b": zeros(o),
                       "mean": zeros(o), "var": ones(o)}}

    def se_res2():
        return {
            "conv1": crb(ch, ch, 1),
            "res2": {"convs": [crb(width, width, 3)
                               for _ in range(scale - 1)]},
            "conv2": crb(ch, ch, 1),
            "se": {"w1": lin(ch, 128), "b1": zeros(128),
                   "w2": lin(128, ch), "b2": zeros(ch)},
        }

    cat = 3 * ch
    ecapa = {
        "layer1": crb(cfg.mel_bins, ch, 5),
        "layer2": se_res2(), "layer3": se_res2(), "layer4": se_res2(),
        "mfa_w": conv(cat, cat, 1), "mfa_b": zeros(cat),
        "att1_w": conv(128, cat * 3, 1), "att1_b": zeros(128),
        "att2_w": conv(cat, 128, 1), "att2_b": zeros(cat),
        "bn": {"w": ones(2 * cat), "b": zeros(2 * cat),
               "mean": zeros(2 * cat), "var": ones(2 * cat)},
        "fc_w": lin(2 * cat, cfg.spk_out_dim), "fc_b": zeros(cfg.spk_out_dim),
    }

    # perceiver
    pd = cfg.spk_latent_dim
    inner = cfg.perceiver_heads * cfg.perceiver_dim_head
    perceiver = {
        "ctx_w": lin(cat, pd), "ctx_b": zeros(pd),
        "latents": jnp.asarray(ini.normal((cfg.num_global_tokens, pd), 1.0)),
        "layers": [
            {"attn": {"q_w": lin(pd, inner), "kv_w": lin(pd, 2 * inner),
                      "out_w": lin(inner, pd)},
             "ff1_w": lin(pd, 4 * pd), "ff1_b": zeros(4 * pd),
             "ff2_w": lin(4 * pd, pd), "ff2_b": zeros(pd)}
            for _ in range(cfg.perceiver_depth)
        ],
        "norm_g": ones(pd),
    }

    nf = len(cfg.fsq_levels)
    speaker = {
        "ecapa": ecapa,
        "perceiver": perceiver,
        "fsq_in_w": lin(pd, nf), "fsq_in_b": zeros(nf),
        "fsq_out_w": lin(nf, pd, 0.5), "fsq_out_b": zeros(pd),
        "proj_w": lin(pd * cfg.num_global_tokens, cfg.spk_out_dim),
        "proj_b": zeros(cfg.spk_out_dim),
    }

    Dp = cfg.prenet_dim
    prenet = {
        "pre_w": lin(cfg.encoder_out, Dp), "pre_b": zeros(Dp),
        "stages": [{"vocos": vocos(Dp, Dp, cfg.prenet_inter_dim, 2)}
                   for _ in cfg.prenet_ratios],
        "backbone": vocos(Dp, Dp, cfg.prenet_inter_dim, cfg.prenet_layers,
                          cond_dim=cfg.spk_out_dim),
        "out_w": lin(Dp, cfg.encoder_out), "out_b": zeros(cfg.encoder_out),
    }

    blocks = []
    ch_in = cfg.dec_channels
    for rate, k in zip(cfg.dec_rates, cfg.dec_kernels):
        ch_out = ch_in // 2
        blocks.append({
            "alpha": ones(ch_in),
            "up_w": jnp.asarray(ini.normal((ch_in, ch_out, k),
                                           (ch_in * k) ** -0.5)),
            "up_b": zeros(ch_out),
            "res": [
                {"alpha1": ones(ch_out),
                 "w1": conv(ch_out, ch_out, 7), "b1": zeros(ch_out),
                 "alpha2": ones(ch_out),
                 "w2": conv(ch_out, ch_out, 1), "b2": zeros(ch_out)}
                for _ in range(3)
            ],
        })
        ch_in = ch_out
    wavegen = {
        "in_w": conv(cfg.dec_channels, cfg.encoder_out, 7),
        "in_b": zeros(cfg.dec_channels),
        "blocks": blocks,
        "alpha_out": ones(ch_in),
        "out_w": conv(1, ch_in, 7), "out_b": zeros(1),
    }

    return {"encoder": enc, "quantizer": vq, "speaker": speaker,
            "prenet": prenet, "wavegen": wavegen}


# --------------------------------------------------------------------------
# transpiled-ONNX codec: same API, runs the real exported graphs
# --------------------------------------------------------------------------

class OnnxBiCodec:
    """Drop-in encode/decode backed by the transpiled real ONNX graphs
    (models/onnx_graph.py). Used when the actual BiCodecTokenize /
    BiCodecDetokenize exports are available: bit-faithful to the
    reference's codec by construction, still XLA-compiled."""

    def __init__(self, tokenize_graph=None, detokenize_graph=None):
        from .onnx_graph import OnnxGraph
        self.tok = (OnnxGraph.load(tokenize_graph)
                    if isinstance(tokenize_graph, str) else tokenize_graph)
        self.detok = (OnnxGraph.load(detokenize_graph)
                      if isinstance(detokenize_graph, str) else detokenize_graph)

    def encode(self, feat, mel):
        """feat [B,T,1024] f32, mel [B,128,301] f32 → (semantic, global)."""
        out = self.tok(ref_wav_mel=mel, feat=feat)
        # output order resolved by name (ref_audio_utilities.rs:1114-1256)
        names = self.tok.output_names
        by = dict(zip(names, out if isinstance(out, tuple) else (out,)))
        sem = by.get("semantic_tokens", out[0])
        glob = by.get("global_tokens", out[-1])
        glob = jnp.asarray(glob).reshape(jnp.asarray(sem).shape[0], -1)
        return jnp.asarray(sem), glob

    def decode(self, global_tokens, semantic_tokens):
        g = jnp.asarray(global_tokens)[:, None, :].astype(jnp.int64)
        s = jnp.asarray(semantic_tokens).astype(jnp.int64)
        wav = jnp.asarray(self.detok(global_tokens=g, semantic_tokens=s))
        # normalize to [B, W]: the export's wav_rec rank is unconstrained
        # (the C++ sibling flattens it, sparktts.cpp:267) — some exports
        # carry a size-1 channel axis that downstream [:, :S*hop] /
        # streaming-window slices must not see.
        B = s.shape[0]
        return wav.reshape(B, -1)


# --------------------------------------------------------------------------
# host wrappers (bucketed shapes)
# --------------------------------------------------------------------------

DETOKENIZE_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def receptive_latents(cfg: BiCodecConfig) -> int:
    """Conservative ONE-SIDED receptive field of ``decode`` in latent
    frames: how far a semantic token's influence reaches into the
    waveform. Drives streaming context/lookahead and the bucket padding
    margin (all decode-path norms are per-frame, so locality holds)."""
    def backbone(layers):
        return 3 + 3 * layers          # embed k7 + k7 depthwise per block

    r = backbone(cfg.prenet_layers)
    r += sum(backbone(2) for _ in cfg.prenet_ratios)
    r += 3                              # wave-generator input conv k7
    f = 1
    for rate, k in zip(cfg.dec_rates, cfg.dec_kernels):
        f *= rate
        r += -(-k // f) + 1             # transposed conv
        r += -(-39 // f)                # res units: k7 at dil 1+3+9 → ±39
    return r + 8                        # margin


def _detok_bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // buckets[-1]) * buckets[-1]


def detokenize(params, global_tokens, semantic_tokens, cfg,
               bucket=DETOKENIZE_BUCKETS):
    """Host wrapper: pads the semantic sequence up to an exponential bucket
    (≤ 6 compiled shapes for the 2048-token range), decodes, trims to
    S·320 samples (parity: detokenizer resize + run,
    参考/C/tts/sparktts.cpp:221-276).

    Padding contract: the sequence is EDGE-padded (last token repeated) by
    at least the decoder's receptive field, so the kept tail hears a
    sustained continuation rather than codebook-entry-0 garbage, and the
    streaming vocoder can reproduce bucketed output bit-exactly
    (runtime/streaming.py). ``bucket`` may be an int (fixed multiple) or a
    sequence of bucket sizes. ``params`` may be a pytree (native fast
    path) or an OnnxBiCodec (transpiled real graphs)."""
    import numpy as np
    g = jnp.asarray(global_tokens, jnp.int32)
    if g.ndim == 1:
        g = g[None]
    s = np.asarray(semantic_tokens, np.int32)
    if s.ndim == 1:
        s = s[None]
    S = s.shape[1]
    if S == 0:
        return np.zeros((s.shape[0], 0), np.float32)
    # cfg may be None for transpiled-graph params (OnnxBiCodec carries no
    # native cfg); padding margins then use the published model's dims
    cfg_eff = cfg if cfg is not None else BiCodecConfig()
    need = S + receptive_latents(cfg_eff)
    if isinstance(bucket, int):
        padded = need + ((-need) % bucket)
    else:
        padded = _detok_bucket(need, tuple(bucket))
    s_pad = np.pad(s, ((0, 0), (0, padded - S)), mode="edge")
    if isinstance(params, OnnxBiCodec):
        wav = params.decode(g, jnp.asarray(s_pad))
    else:
        wav = decode(params, g, jnp.asarray(s_pad), cfg)
    hop = cfg_eff.hop
    return np.asarray(wav[:, : S * hop], np.float32)
