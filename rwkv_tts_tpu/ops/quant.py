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
  * ``quant_layers`` follows the reference's first-N-layers semantics
    (0 = none, -1 = all, 0 < N < n_layer = blocks 0..N quantized, rest
    bf16). Partial quantization splits the stacked blocks into two scan
    segments — see quantize_rwkv_params's docstring.

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
    if is_int4(w):
        return _qmatmul_int4(x, w)
    if is_nf4(w):
        return (x @ dequantize_tensor_nf4(w, x.dtype)).astype(x.dtype)
    return x @ w.astype(x.dtype)


def n_layers_of(blocks) -> int:
    """Layer count of a blocks pytree (dict of [L, ...] stacked leaves, or
    a tuple of layer segments from partial quantization)."""
    if isinstance(blocks, (tuple, list)):
        return sum(n_layers_of(s) for s in blocks)
    return int(blocks["ln1_w"].shape[0])


def quantize_rwkv_params(params: Dict[str, Any], quant_layers: int = -1,
                         quantize_head: bool = True,
                         kind: str = "int8") -> Dict[str, Any]:
    """Quantize the dense projections of a models/rwkv7.py pytree.

    quant_layers mirrors the reference's first-N-layers semantics
    (src/shared_runtime.rs:156-176 quantizes layers ``0..quant_layers``;
    CLI at bin/server.rs:1203-1233): 0 disables, -1 (or N ≥ n_layer)
    quantizes every block, and ``0 < N < n_layer`` quantizes blocks
    ``0..N`` only. Partial quantization stores ``blocks`` as a TUPLE of
    two stacked segments — (quantized[:N], full[N:]) — because one
    stacked lax.scan leaf cannot mix dtypes; models/rwkv7's layer scans
    run segment-by-segment, threading the carry (rwkv7._scan_layers).
    The head quantizes whenever any block does (it is the single biggest
    tensor and the reference's Quant map covers embed/head implicitly).
    """
    if quant_layers == 0:
        return params
    qt = {"int8": quantize_tensor, "nf4": quantize_tensor_nf4,
          "int4": quantize_tensor_int4}[kind]
    out = dict(params)
    blocks = params["blocks"]
    if isinstance(blocks, (tuple, list)):
        raise ValueError("params are already partially quantized")
    L = n_layers_of(blocks)
    n_q = L if quant_layers < 0 or quant_layers >= L else quant_layers

    def quantize_segment(seg: Dict[str, Any]) -> Dict[str, Any]:
        seg = dict(seg)
        # fused layout (models/rwkv7.fuse_params) carries zrkv, not w_r/k/v
        for k in ("zrkv",) + DENSE_KEYS:
            if k in seg:
                seg[k] = qt(seg[k])
        return seg

    if n_q == L:
        out["blocks"] = quantize_segment(blocks)
    else:
        seg_q = jax.tree.map(lambda t: t[:n_q], blocks)
        seg_f = jax.tree.map(lambda t: t[n_q:], blocks)
        out["blocks"] = (quantize_segment(seg_q), seg_f)
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
# int4 ("w4a16") weight quantization — the serving-grade 4-bit path.
#
# NF4 above matches the reference's storage format but is 12× slower than
# int8 at decode (the 16-entry codebook gather dominates — docs/PERF.md).
# This linear-int4 scheme needs NO gather: values unpack with two shifts and
# dequantize with one multiply, so a Pallas kernel can stream the packed
# bytes from HBM and expand them in VMEM — the decode step's weight traffic
# halves vs int8 (2.95 GB → 1.48 GB at the flagship shape), which is the
# whole cost of a small-batch decode step.
#
#   * symmetric 4-bit codes in [-7, 7], group-wise absmax scales along the
#     input dim (INT4_GROUP rows per scale, per output channel);
#   * packing pairs row j with row j + I/2 in one byte (hi/lo nibble) —
#     unpacking yields two contiguous row-blocks, so the matmul is
#     x[:, :I/2] @ W_hi + x[:, I/2:] @ W_lo with no row interleave (an
#     in-kernel sublane shuffle Mosaic would reject);
#   * activations stay bf16 (w4a16): at 4-bit weight error, dynamic act
#     quantization adds nothing but another kernel.
# --------------------------------------------------------------------------

INT4_GROUP = 128


def quantize_tensor_int4(w: jax.Array, group: int = INT4_GROUP
                         ) -> Dict[str, jax.Array]:
    """[..., I, O] float → {"q4p": uint8 [..., I/2, O], "s4": f32
    [..., I/group, O]}. ``group`` shrinks to the largest divisor of I/2 ≤
    its requested value (toy test widths); flagship widths use it as-is."""
    wf = w.astype(jnp.float32)
    *lead, I, O = wf.shape
    assert I % 2 == 0, I
    while (I // 2) % group:
        group //= 2
    assert group >= 1
    blocks = wf.reshape(*lead, I // group, group, O)
    absmax = jnp.max(jnp.abs(blocks), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(blocks / scale), -7, 7).astype(jnp.int32)
    q = q.reshape(*lead, I, O)
    hi, lo = q[..., : I // 2, :], q[..., I // 2:, :]
    packed = (((hi & 0xF) << 4) | (lo & 0xF)).astype(jnp.uint8)
    return {"q4p": packed, "s4": scale[..., 0, :].reshape(
        *lead, I // group, O)}


def _nib(x):
    """Sign-extend a 4-bit two's-complement nibble held in int32 ∈ [0,15]."""
    return (x ^ 8) - 8


def dequantize_tensor_int4(t: Dict[str, jax.Array],
                           dtype=jnp.float32) -> jax.Array:
    q4p, s4 = t["q4p"], t["s4"]
    *lead, I2, O = q4p.shape
    group = 2 * I2 // s4.shape[-2]
    w32 = q4p.astype(jnp.int32)
    hi = _nib(w32 >> 4)
    lo = _nib(w32 & 0xF)
    vals = jnp.concatenate([hi, lo], axis=-2).astype(jnp.float32)
    blocks = vals.reshape(*lead, s4.shape[-2], group, O)
    return (blocks * s4[..., None, :]).reshape(*lead, 2 * I2, O).astype(dtype)


def is_int4(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q4p", "s4"}


def _qmm4_kernel(x_ref, wq_ref, ws_ref, o_ref):
    """One N-tile of y = x @ dequant(wq). Full K resident: x [M, K] bf16,
    wq [K/2, Nb] uint8 (hi nibble = row j, lo = row j + K/2), ws [K/group,
    Nb] f32. Unpack + dequant in VMEM, two bf16 MXU dots, f32 accumulate."""
    K2 = wq_ref.shape[0]
    w32 = wq_ref[:].astype(jnp.int32)
    s = ws_ref[:]                                    # [K/group, Nb]
    gh = s.shape[0] // 2                             # groups per half
    group = K2 // gh

    def half(vals, s_half):
        sf = jnp.broadcast_to(s_half[:, None, :],
                              (gh, group, s_half.shape[-1]))
        sf = sf.reshape(K2, s_half.shape[-1])
        return (vals.astype(jnp.float32) * sf).astype(jnp.bfloat16)

    w_hi = half(_nib(w32 >> 4), s[:gh])
    w_lo = half(_nib(w32 & 0xF), s[gh:])
    acc = jnp.dot(x_ref[:, :K2], w_hi, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, K2:], w_lo, preferred_element_type=jnp.float32)
    o_ref[:] = acc


def qmm4_pallas(x: jax.Array, wq: jax.Array, ws: jax.Array,
                interpret: bool = False) -> jax.Array:
    """x [M, K] → [M, N] f32 with int4-packed weights (see
    :func:`quantize_tensor_int4`). K stays resident; M and N are gridded,
    so both decode (M = batch) and prefill (M = B·T) shapes route here."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    K2, N = wq.shape
    # unpacked bf16 halves are the big VMEM tenants: 2·K2·block_n·2 bytes;
    # keep them ≤ ~2 MB so in+out double buffering stays well inside 16 MB
    block_n = 256 if K2 <= 2048 else 128
    while N % block_n:
        block_n //= 2
    block_m = min(256, -(-M // 8) * 8)       # sublane-aligned
    pad_m = (-M) % block_m
    x = x.astype(jnp.bfloat16)
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    out = pl.pallas_call(
        _qmm4_kernel,
        grid=(Mp // block_m, N // block_n),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ws.shape[0], block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        interpret=interpret,
    )(x, wq, jnp.asarray(ws, jnp.float32))
    return out[:M] if pad_m else out


def _qmatmul_int4(x: jax.Array, w: Dict[str, jax.Array]) -> jax.Array:
    """int4 leaf dispatch: Pallas dequant-GEMM on TPU decode shapes, plain
    dequantized matmul elsewhere (CPU tests / odd shapes)."""
    wq, ws = w["q4p"], w["s4"]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    if (wq.ndim == 2 and jax.default_backend() == "tpu"
            and wq.shape[0] % 256 == 0 and wq.shape[1] % 128 == 0):
        y = qmm4_pallas(x.reshape(M, x.shape[-1]), wq, ws)
        return y.reshape(*lead, wq.shape[1]).astype(x.dtype)
    return (x @ dequantize_tensor_int4(w, x.dtype)).astype(x.dtype)


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
