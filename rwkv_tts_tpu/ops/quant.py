"""Int8 weight quantization for the RWKV-7 dense projections.

Analog of the reference's ``--quant-type int8 --quant-layers N``
(bin/server.rs:1203-1233, applied per layer at src/shared_runtime.rs:156-176
via web-rwkv's Quant::Int8). TPU-native scheme:

  * symmetric per-output-channel scales (absmax / 127) for every stacked
    dense weight ([L, I, O] → int8 values + f32 scales [L, 1, O]);
  * matmuls run as ``x @ int8 → int32/f32`` with the scale folded into the
    output — XLA lowers int8×bf16 efficiently on the MXU and the weights
    halve HBM traffic, which is exactly what a bandwidth-bound decode wants;
  * embedding/head can be quantized too (biggest tensors at 78k rows);
  * ``quant_layers`` limits quantization to the first N blocks (parity with
    the reference's per-layer option).

The quantized pytree keeps the same keys: a dense leaf becomes
``{"q": int8, "s": f32}`` and models/rwkv7.py's ``_mm`` helper dispatches on
leaf type, so every forward path (prefill, step, pallas/scan) works
unchanged.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# the bandwidth-heavy projections; LoRA adapters and norm/shift vectors are
# tiny and stay full precision
DENSE_KEYS = ("w_r", "w_k", "w_v", "w_o", "ffn_k", "ffn_v")

# opt-in: route decode-sized int8 GEMMs through the Pallas kernel below
USE_PALLAS_QMM = False


def quantize_tensor(w: jax.Array) -> Dict[str, jax.Array]:
    """[..., I, O] float → {"q": int8, "s": f32 per-O-channel scale}."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def dequantize_tensor(t: Dict[str, jax.Array], dtype=jnp.float32) -> jax.Array:
    return (t["q"].astype(jnp.float32) * t["s"]).astype(dtype)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q", "s"}


def qmatmul(x: jax.Array, w) -> jax.Array:
    """x [..., I] @ w — w may be a plain array, an int8 leaf, or an NF4 leaf.

    int8 path: the activations are dynamically quantized per row (absmax /
    127) and the dot runs s8×s8→s32 — native MXU int8, and crucially the
    int8 weights feed the MXU *directly*: the earlier x.dtype upcast made
    XLA materialize a dequantized copy of every weight matrix each decode
    step, tripling weight traffic. Output = int32 · (row_scale · col_scale).
    Activation quantization adds ≤1/254 relative rounding per element on
    top of the weight quantization the caller already opted into.
    """
    if is_quantized(w):
        wq = w["q"]
        # Optional Pallas decode GEMM (int8 HBM reads, VMEM upcast, bf16
        # MXU dot). Measured on v5e at the flagship shape it loses ~10% to
        # the s8×s8 XLA path inside the full decode step (the extra kernel
        # boundary defeats surrounding fusions), so it is opt-in tuning
        # infrastructure rather than the default.
        if (USE_PALLAS_QMM and wq.ndim == 2 and x.ndim == 2
                and x.shape[0] <= 512 and x.shape[0] % 8 == 0
                and wq.shape[0] % 128 == 0 and wq.shape[1] % 128 == 0
                and jax.default_backend() == "tpu"):
            return qmm_pallas(x, wq, w["s"]).astype(x.dtype)
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(absmax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, wq,
            dimension_numbers=(((xq.ndim - 1,), (wq.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scale = sx * w["s"].astype(jnp.float32)[..., 0, :]
        return (y.astype(jnp.float32) * scale).astype(x.dtype)
    if is_nf4(w):
        return (x @ dequantize_tensor_nf4(w, x.dtype)).astype(x.dtype)
    return x @ w.astype(x.dtype)


def quantize_rwkv_params(params: Dict[str, Any], quant_layers: int = -1,
                         quantize_head: bool = True,
                         kind: str = "int8") -> Dict[str, Any]:
    """Quantize the dense projections of a models/rwkv7.py pytree.

    quant_layers: 0 disables, any other value quantizes every block. (The
    reference quantizes the first N layers only; with stacked-layer lax.scan
    a per-layer dtype mix would force an unstacked loop, so we deliberately
    support all-or-nothing — the quality/size trade-off is controlled by
    which *tensors* quantize instead: DENSE_KEYS + optionally the head.)
    """
    if quant_layers == 0:
        return params
    qt = quantize_tensor if kind == "int8" else quantize_tensor_nf4
    out = dict(params)
    blocks = dict(params["blocks"])
    # fused layout (models/rwkv7.fuse_params) carries zrkv instead of w_r/k/v
    keys = [k for k in ("zrkv",) + DENSE_KEYS if k in blocks]
    for k in keys:
        blocks[k] = qt(blocks[k])
    out["blocks"] = blocks
    if quantize_head:
        out["head"] = qt(params["head"])
    return out


# --------------------------------------------------------------------------
# NF4 (4-bit NormalFloat) weight quantization — the reference's
# ``--quant-type nf4`` analog (web-rwkv Quant::NF4). 16-level codebook of
# standard-normal quantiles, per-(input-block, output-channel) absmax
# scales, two codes packed per byte → 4× smaller than f32 (plus scales).
# Dequantization is a 16-entry table lookup folded into the matmul input.
# (The reference's SF4 variant is a web-rwkv-internal float4 format; NF4
# covers the same memory/quality point.)
# --------------------------------------------------------------------------

NF4_BLOCK = 64

# Normal-quantile codebook (QLoRA convention), ascending, includes 0.
NF4_CODE = jnp.asarray([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], jnp.float32)


def quantize_tensor_nf4(w: jax.Array) -> Dict[str, jax.Array]:
    """[..., I, O] float → {"q4": uint8 [..., I/2, O], "s": f32 scales
    [..., I/NF4_BLOCK, 1, O]}. I must be divisible by NF4_BLOCK."""
    wf = w.astype(jnp.float32)
    *lead, I, O = wf.shape
    assert I % NF4_BLOCK == 0, f"input dim {I} not divisible by {NF4_BLOCK}"
    blocks = wf.reshape(*lead, I // NF4_BLOCK, NF4_BLOCK, O)
    scale = jnp.maximum(jnp.max(jnp.abs(blocks), axis=-2, keepdims=True), 1e-8)
    norm = blocks / scale                                  # [-1, 1]
    idx = jnp.argmin(jnp.abs(norm[..., None] - NF4_CODE), axis=-1)
    idx = idx.reshape(*lead, I, O).astype(jnp.uint8)
    hi, lo = idx[..., 0::2, :], idx[..., 1::2, :]
    return {"q4": (hi << 4) | lo, "s": scale}


def dequantize_tensor_nf4(t: Dict[str, jax.Array],
                          dtype=jnp.float32) -> jax.Array:
    q4, scale = t["q4"], t["s"]
    hi = (q4 >> 4).astype(jnp.int32)
    lo = (q4 & 0xF).astype(jnp.int32)
    *lead, I2, O = q4.shape
    # interleave: [.., I2, 2, O] -> rows hi0, lo0, hi1, lo1, …
    idx = jnp.stack([hi, lo], axis=-2).reshape(*lead, 2 * I2, O)
    vals = NF4_CODE[idx]
    blocks = vals.reshape(*lead, scale.shape[-3], NF4_BLOCK, O) * scale
    return blocks.reshape(*lead, 2 * I2, O).astype(dtype)


def is_nf4(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q4", "s"}


# --------------------------------------------------------------------------
# Pallas decode GEMM: x [M≤512, K] bf16 × w int8 [K, N] → f32, per-output-
# channel scales folded in. XLA's own s8 dot lowering at decode-sized M is
# catastrophically slow (measured 122 GB/s effective weight streaming at
# M=64 on v5e — 1/7 of HBM peak); this kernel reads int8 from HBM, upcasts
# in VMEM, and lets the MXU run bf16×bf16 with the N-tile DMA double-
# buffered by the Pallas pipeline. Activations stay bf16 (no dynamic
# activation quantization needed on this path).
# --------------------------------------------------------------------------

def _qmm_kernel(x_ref, wq_ref, ws_ref, o_ref):
    w = wq_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = acc * ws_ref[0]


def qmm_pallas(x: jax.Array, wq: jax.Array, ws: jax.Array,
               block_n: int = 512, interpret: bool = False) -> jax.Array:
    """x [M, K] (bf16/f32), wq [K, N] int8, ws [1, N] f32 → [M, N] f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = wq.shape[1]
    while N % block_n:
        block_n //= 2
    grid = (N // block_n,)
    x = x.astype(jnp.bfloat16)
    out = pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(x, wq, jnp.asarray(ws, jnp.float32))
    return out
