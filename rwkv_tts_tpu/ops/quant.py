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
    """x [..., I] @ w — w may be a plain array or a quantized leaf."""
    if is_quantized(w):
        y = jnp.matmul(x, w["q"].astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return (y * w["s"].astype(jnp.float32)[..., 0, :]).astype(x.dtype)
    return x @ w.astype(x.dtype)


def quantize_rwkv_params(params: Dict[str, Any], quant_layers: int = -1,
                         quantize_head: bool = True) -> Dict[str, Any]:
    """Quantize the dense projections of a models/rwkv7.py pytree.

    quant_layers: 0 disables, any other value quantizes every block. (The
    reference quantizes the first N layers only; with stacked-layer lax.scan
    a per-layer dtype mix would force an unstacked loop, so we deliberately
    support all-or-nothing — the quality/size trade-off is controlled by
    which *tensors* quantize instead: DENSE_KEYS + optionally the head.)
    """
    if quant_layers == 0:
        return params
    out = dict(params)
    blocks = dict(params["blocks"])
    for k in DENSE_KEYS:
        blocks[k] = quantize_tensor(blocks[k])
    out["blocks"] = blocks
    if quantize_head:
        out["head"] = quantize_tensor(params["head"])
    return out
