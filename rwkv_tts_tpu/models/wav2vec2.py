"""wav2vec2-large-xlsr-53 feature encoder in JAX.

TPU-native replacement for the reference's ``wav2vec2-large-xlsr-53.onnx``
CPU session (src/onnx_session_pool.rs pools; consumed at
src/ref_audio_utilities.rs:927-973). Contract: z-normalized waveform [B, N]
→ features [B, T, 1024] with T ≈ N/320.

Architecture (XLSR-53 / wav2vec2-large with stable layer norm):
  * 7-layer conv feature extractor (512 ch; strides 5,2,2,2,2,2,2 → 320×
    downsample; kernels 10,3,3,3,3,2,2), per-layer LayerNorm + GELU;
  * projection LayerNorm(512) → Linear 512→1024;
  * grouped conv positional embedding (kernel 128, 16 groups) + GELU;
  * 24 pre-LN transformer layers (16 heads, FFN 4096, GELU);
  * output = mean of selected hidden states (SparkTTS mixes layers 11/14/16;
    the ONNX export bakes this reduction in, we keep it configurable).

Weights import from the checkpoint via models/convert.py; random init is used
for tests/benchmarks when the checkpoint is absent.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import Wav2Vec2Config

Params = Dict[str, Any]

OUTPUT_LAYERS = (11, 14, 16)


def init_params(cfg: Wav2Vec2Config, key: jax.Array) -> Params:
    """Host-side NumPy init (utils/init.py): zero per-shape XLA compiles."""
    import numpy as np

    from ..utils.init import Initializer

    ini = Initializer(key)
    H = cfg.hidden_size

    def lin(i, o, scale=None):
        return ini.normal((i, o), scale if scale is not None else i ** -0.5)

    convs = []
    in_ch = 1
    for out_ch, k, s in zip(cfg.conv_dims, cfg.conv_kernels, cfg.conv_strides):
        convs.append({
            "w": jnp.asarray(ini.normal((out_ch, in_ch, k), (in_ch * k) ** -0.5)),
            "ln_w": jnp.asarray(ini.ones((out_ch,))),
            "ln_b": jnp.asarray(ini.zeros((out_ch,))),
        })
        in_ch = out_ch
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln1_w": ini.ones((H,)), "ln1_b": ini.zeros((H,)),
            "q": lin(H, H), "q_b": ini.zeros((H,)),
            "k": lin(H, H), "k_b": ini.zeros((H,)),
            "v": lin(H, H), "v_b": ini.zeros((H,)),
            "o": lin(H, H), "o_b": ini.zeros((H,)),
            "ln2_w": ini.ones((H,)), "ln2_b": ini.zeros((H,)),
            "fc1": lin(H, cfg.ffn_size), "fc1_b": ini.zeros((cfg.ffn_size,)),
            "fc2": lin(cfg.ffn_size, H), "fc2_b": ini.zeros((H,)),
        })
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs)), *layers)
    return {
        "convs": convs,
        "proj_ln_w": jnp.asarray(ini.ones((cfg.conv_dims[-1],))),
        "proj_ln_b": jnp.asarray(ini.zeros((cfg.conv_dims[-1],))),
        "proj_w": jnp.asarray(lin(cfg.conv_dims[-1], H)),
        "proj_b": jnp.asarray(ini.zeros((H,))),
        "pos_conv_w": jnp.asarray(
            ini.normal((H, H // 16, 128), (H // 16 * 128) ** -0.5)),
        "pos_conv_b": jnp.asarray(ini.zeros((H,))),
        "enc_ln_w": jnp.asarray(ini.ones((H,))),
        "enc_ln_b": jnp.asarray(ini.zeros((H,))),
        "layers": stacked,
    }


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _conv1d(x, w, stride=1, groups=1, padding="VALID"):
    """x: [B, C, T]; w: [O, I/groups, K]."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "output_layers"))
def extract_features(params: Params, wav: jax.Array, cfg: Wav2Vec2Config,
                     output_layers: tuple = OUTPUT_LAYERS) -> jax.Array:
    """wav [B, N] (already z-normalized upstream) → features [B, T, 1024]."""
    x = wav[:, None, :].astype(jnp.float32)          # [B, 1, N]
    for conv, stride in zip(params["convs"], cfg.conv_strides):
        x = _conv1d(x, conv["w"], stride=stride)
        if "b" in conv:
            # xlsr-53 ships conv_bias=true (stable-LN checkpoints); HF
            # group-norm base models have no conv bias — key is optional
            x = x + conv["b"][None, :, None]
        x = jnp.moveaxis(x, 1, 2)                     # [B, T, C]
        x = _ln(x, conv["ln_w"], conv["ln_b"])
        x = jax.nn.gelu(jnp.moveaxis(x, 2, 1), approximate=False)

    x = jnp.moveaxis(x, 1, 2)                         # [B, T, 512]
    x = _ln(x, params["proj_ln_w"], params["proj_ln_b"])
    x = x @ params["proj_w"] + params["proj_b"]       # [B, T, 1024]

    # positional conv embedding: pad k//2 both sides; even kernels drop the
    # last column (HF Wav2Vec2SamePadLayer semantics)
    pk = params["pos_conv_w"].shape[-1]
    groups = cfg.hidden_size // params["pos_conv_w"].shape[1]
    pc = jnp.moveaxis(x, 1, 2)
    pc = _conv1d(pc, params["pos_conv_w"], groups=groups,
                 padding=[(pk // 2, pk // 2)])
    if pk % 2 == 0:
        pc = pc[:, :, :-1]
    pc = pc + params["pos_conv_b"][None, :, None]
    x = x + jnp.moveaxis(jax.nn.gelu(pc, approximate=False), 1, 2)

    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    want = tuple(sorted(output_layers))

    def layer_body(carry, lp):
        x, acc, idx = carry
        h = _ln(x, lp["ln1_w"], lp["ln1_b"])
        B, T, H = h.shape
        q = (h @ lp["q"] + lp["q_b"]).reshape(B, T, nh, hd) * (hd ** -0.5)
        k = (h @ lp["k"] + lp["k_b"]).reshape(B, T, nh, hd)
        v = (h @ lp["v"] + lp["v_b"]).reshape(B, T, nh, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, T, H)
        x = x + (out @ lp["o"] + lp["o_b"])
        h = _ln(x, lp["ln2_w"], lp["ln2_b"])
        x = x + (jax.nn.gelu(h @ lp["fc1"] + lp["fc1_b"], approximate=False)
                 @ lp["fc2"] + lp["fc2_b"])
        idx = idx + 1
        # accumulate selected hidden states (hidden_states[i] = input of
        # layer i, so layer output idx corresponds to hidden_states[idx]).
        # The FINAL hidden state is handled post-scan: HF's stable-layer-
        # norm encoder applies encoder.layer_norm to hidden_states[-1]
        # only (Wav2Vec2EncoderStableLayerNorm.forward)
        sel = jnp.any(jnp.asarray(want) == idx) & (idx != cfg.num_layers)
        acc = acc + jnp.where(sel, x, 0.0)
        return (x, acc, idx), None

    acc0 = jnp.zeros_like(x)
    # hidden_states[0] is the pre-encoder input
    sel0 = 0 in want
    if sel0:
        acc0 = acc0 + x
    (x, acc, _), _ = jax.lax.scan(
        layer_body, (x, acc0, jnp.int32(0)), params["layers"]
    )
    if cfg.num_layers in want:
        acc = acc + _ln(x, params["enc_ln_w"], params["enc_ln_b"])
    return acc / float(len(want))


class OnnxWav2Vec2:
    """Feature extractor backed by the transpiled real ONNX export
    (ref src/ref_audio_utilities.rs:927-973: [1, N] z-normalized waveform →
    [1, T, 1024]; the export bakes in the hidden-state layer mix)."""

    def __init__(self, graph):
        from .onnx_graph import OnnxGraph

        self.graph = OnnxGraph.load(graph) if isinstance(graph, str) else graph

    def extract(self, wav):
        import jax.numpy as jnp

        out = self.graph(jnp.asarray(wav, jnp.float32))
        if isinstance(out, tuple):
            out = out[0]
        return jnp.asarray(out)
