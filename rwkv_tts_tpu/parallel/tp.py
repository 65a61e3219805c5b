"""Tensor-parallel RWKV-7 decode: shard the LAYER weights, not just the
vocab head.

Why this exists: the single-chip decode step is weight-load bound — at the
flagship shape ~3.6 of ~5.9 ms/step is streaming the 2.9 GB of int8 layer
weights through the MXU pipe (docs/PERF.md), so the first-chunk latency
floor (~420 ms) cannot move on one chip. The ``parallel/mesh.py`` rules
shard only the embedding/head over the ``model`` axis, which divides the
78k-row head but leaves every layer weight replicated: a TP group still
streams the full 2.9 GB per step. This module adds real Megatron-style
tensor parallelism over the HEAD dimension so a TP=k slice streams 1/k of
the weights per chip per step.

Sharding plan (heads are the natural split — WKV, group-norm, the rk
bonus, and the output gate are all per-head local):

  * column-parallel (out dim = head space, sharded): w_r/w_k/w_v, the
    LoRA second stages w2/a2/v2/g2, per-channel head-space vectors
    (w0/a0/v0/k_k/k_a/ln_x_w/ln_x_b), r_k, ffn_k;
  * row-parallel (in dim = head space, sharded; partial sums psum over
    the ``model`` axis): w_o, ffn_v — two psums of [B, C] per layer, the
    classic 2-collectives-per-block Megatron pattern riding ICI;
  * replicated: the residual stream x, layernorms, token-shift mixes,
    LoRA first stages (tiny), embedding rows;
  * head: row-parallel over C ([C/k, V] per chip) — composes with
    ``head_slice`` (the sampleable TTS prefix) and divides the head's
    weight traffic, unlike vocab-column sharding where the <8320 prefix
    lives entirely on shard 0.

The recurrent state shards over BOTH mesh axes: wkv [L, B, H, N, N] →
(None, data, model, None, None).

The reference has no analog (single GPU, SURVEY.md §2.4); this is the
framework's path below the single-chip first-chunk floor. Token parity
with the unsharded step is tested on the virtual CPU mesh
(tests/test_tp.py); per-step ICI cost is 2·L psums of [B, C] + one
[B, head_slice] psum (~100-200 µs at B=8/L=32 on a v5e slice), against
~2.7 ms/step of weight stream saved at TP=4.

The int8 serving layout (ops/quant) shards too — q like the float
tensor, per-out-channel scales column-sharded/replicated per
orientation — so TP=4 + int8 streams ~1/8 of the bf16 single-chip
bytes. int4/NF4 (packed codes / codebook blocks) and the fused zrkv
layout are not TP-sharded; this path targets the small-batch latency
mode. step_tp keeps the per-head jnp WKV chain (batch-in-lanes folding
across a sharded head axis would tie the fold factor to the mesh —
unmeasurable without multi-chip hardware, so not done yet).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RwkvConfig
from ..models import rwkv7
from ..models.rwkv7 import Params, State
from ..ops.quant import qmatmul
from ..ops.wkv7 import wkv7_single
from .mesh import DATA_AXIS, MODEL_AXIS

# blocks-dict leaf → PartitionSpec (raw/unfused layout; leading L axis)
_BLOCK_SPECS: Dict[str, P] = {
    # column-parallel projections (out dim = head space)
    "w_r": P(None, None, MODEL_AXIS),
    "w_k": P(None, None, MODEL_AXIS),
    "w_v": P(None, None, MODEL_AXIS),
    "w2": P(None, None, MODEL_AXIS),
    "a2": P(None, None, MODEL_AXIS),
    "v2": P(None, None, MODEL_AXIS),
    "g2": P(None, None, MODEL_AXIS),
    "ffn_k": P(None, None, MODEL_AXIS),
    # row-parallel (in dim = head space; psum after)
    "w_o": P(None, MODEL_AXIS, None),
    "ffn_v": P(None, MODEL_AXIS, None),
    # per-channel head-space vectors
    "w0": P(None, MODEL_AXIS),
    "a0": P(None, MODEL_AXIS),
    "v0": P(None, MODEL_AXIS),
    "k_k": P(None, MODEL_AXIS),
    "k_a": P(None, MODEL_AXIS),
    "ln_x_w": P(None, MODEL_AXIS),
    "ln_x_b": P(None, MODEL_AXIS),
    "r_k": P(None, MODEL_AXIS, None),            # [L, H, N]
}


_ROW_PARALLEL = ("w_o", "ffn_v")


def tp_param_specs(params: Params):
    """PartitionSpec pytree for a RAW-layout (unfused) params tree, plain
    or int8-quantized (ops/quant.quantize_tensor leaves {"q","s"}).

    int8 leaves: "q" shards like the float tensor it replaced; the
    per-output-channel scale "s" [.., 1, O] shards its O dim for
    column-parallel weights and replicates for row-parallel ones (the
    scale spans the full contraction, which row-parallel splits). The
    row-parallel int8 activation quantization then uses the LOCAL row
    absmax — a deterministic, tested-tolerance deviation from the
    unsharded global absmax.
    """
    def spec_for(path, x):
        names = [str(getattr(p, "key", p)) for p in path]
        name, top = names[-1], names[0]
        if name in ("q", "s"):                    # int8 leaf member
            owner = names[-2]
            if owner == "head":
                return (P(MODEL_AXIS, None) if name == "q"
                        else P(None, None))
            if owner in _ROW_PARALLEL:
                return (P(None, MODEL_AXIS, None) if name == "q"
                        else P(None, None, None))
            if owner in _BLOCK_SPECS:             # column-parallel
                return P(None, None, MODEL_AXIS)
            return P(*([None] * x.ndim))
        if top == "head":
            return P(MODEL_AXIS, None)            # row-parallel [C, V]
        if top == "blocks" and name in _BLOCK_SPECS:
            return _BLOCK_SPECS[name]
        return P(*([None] * x.ndim))              # replicated
    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_state_specs(state: State):
    """wkv shards over (data, model); shift states over data only."""
    return {
        "att_x": P(None, DATA_AXIS, None),
        "ffn_x": P(None, DATA_AXIS, None),
        "wkv": P(None, DATA_AXIS, MODEL_AXIS, None, None),
    }


def shard_params_tp(mesh: Mesh, params: Params) -> Params:
    # 4-bit layouts are NOT TP-shardable (module docstring): NF4's scale
    # leaf is also named "s", so without this guard tp_param_specs would
    # misclassify it as an int8 scale and emit invalid shardings
    # (from_checkpoints already coerces 4-bit → int8 when tp_mesh is set;
    # this defends the direct API with a clear error instead)
    leaf_names = {str(getattr(entry, "key", entry))
                  for path, _ in
                  jax.tree_util.tree_flatten_with_path(params)[0]
                  for entry in path}
    if leaf_names & {"q4", "q4p", "s4"}:
        raise ValueError("int4/NF4 quantized layouts are not TP-shardable; "
                         "use --quant-type int8 with tensor parallelism")
    specs = tp_param_specs(params)
    return jax.device_put(
        params,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                               is_leaf=lambda x: isinstance(x, P)))


def shard_state_tp(mesh: Mesh, state: State) -> State:
    specs = tp_state_specs(state)
    return jax.device_put(
        state,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                               is_leaf=lambda x: isinstance(x, P)))


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "head_slice"))
def step_tp(params: Params, token: jax.Array, state: State, cfg: RwkvConfig,
            mesh: Mesh, head_slice: Optional[int] = None
            ) -> Tuple[jax.Array, State]:
    """Tensor-parallel single-token decode step.

    Semantics of models/rwkv7.step (unfused path): token [B] → logits
    [B, head_slice or V] and the updated recurrent state — but every
    device of the ``model`` axis holds (and streams) only its head shard
    of the layer weights. f32 partial-sum order differs from the
    unsharded dot, so near-tie samples may flip — the same deviation
    class as every other batch-shape boundary (ops/wkv7.prefill_chunk_for).
    """
    tp = mesh.shape[MODEL_AXIS]
    H, N, C = cfg.n_head, cfg.head_size, cfg.n_embd
    if H % tp:
        raise ValueError(f"n_head={H} not divisible by model axis {tp}")
    H_loc = H // tp
    C_loc = H_loc * N
    C_row = C // tp
    cdt = jnp.dtype(cfg.dtype)
    state_dt = jnp.dtype(cfg.state_dtype)
    f32 = jnp.float32

    p_specs = tp_param_specs(params)
    s_specs = tp_state_specs(state)

    def inner(params, token, state):
        midx = jax.lax.axis_index(MODEL_AXIS)
        B = token.shape[0]
        x = params["emb"][token].astype(cdt)
        x = rwkv7._layer_norm(x, params["ln0_w"], params["ln0_b"], cfg.ln_eps)
        bp = params["blocks"]

        def layer_body(carry, inputs):
            x, v_first, idx = carry
            lp, att_x, ffn_x, wkv = inputs
            is_first = idx == 0

            h = rwkv7._layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
            xx = att_x.astype(cdt) - h
            # the exact single-device step math, head-sliced (models/rwkv7
            # shares these helpers so the parity chain lives in one place)
            r, w, k_in, v, kk, a, g, v_first = rwkv7._step_unfused_front(
                lp, h, xx, v_first, is_first, cfg, cdt, n_head=H_loc)

            def hv(t):
                return t.reshape(B, H_loc, N)

            y, wkv = wkv7_single(
                hv(r.astype(f32)), hv(w), hv(k_in), hv(v),
                hv(-kk), hv(kk * a), wkv)
            wkv = wkv.astype(state_dt)
            att = jax.lax.psum(
                rwkv7._step_post_wkv(lp, y.reshape(B, C_loc), r, k_in, v, g,
                                     H_loc, N, cfg, cdt),
                MODEL_AXIS)
            x = x + att
            new_att_x = h.astype(f32)

            h2 = rwkv7._layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            xk2 = h2 + (ffn_x.astype(cdt) - h2) * lp["ffn_x_k"].astype(cdt)
            hid = jnp.square(jax.nn.relu(qmatmul(xk2, lp["ffn_k"])))
            ffn = jax.lax.psum(qmatmul(hid, lp["ffn_v"]), MODEL_AXIS)
            x = x + ffn
            return (x, v_first, idx + 1), (new_att_x, h2.astype(f32), wkv)

        v_first0 = jnp.zeros((B, C_loc), f32)
        (x, _, _), (att_xs, ffn_xs, wkvs) = jax.lax.scan(
            layer_body,
            (x, v_first0, jnp.int32(0)),
            (bp, state["att_x"], state["ffn_x"], state["wkv"]))

        x = rwkv7._layer_norm(x, params["ln_out_w"], params["ln_out_b"], cfg.ln_eps)
        # row-parallel head: my C/tp slice of x against my [C/tp, V] rows
        xs = jax.lax.dynamic_slice_in_dim(x, midx * C_row, C_row, axis=-1)
        hw = params["head"]
        if head_slice is not None:
            if isinstance(hw, dict):              # int8 leaf {"q","s"}
                hw = {k: v[..., :head_slice] for k, v in hw.items()}
            else:
                hw = hw[:, :head_slice]
        logits = jax.lax.psum(qmatmul(xs, hw), MODEL_AXIS).astype(f32)
        return logits, {"att_x": att_xs, "ffn_x": ffn_xs, "wkv": wkvs}

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(p_specs, P(DATA_AXIS), s_specs),
        out_specs=(P(DATA_AXIS, None), s_specs),
        check_vma=False,
    )(params, token, state)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "last_only"))
def forward_tp(params: Params, tokens: jax.Array, state: State,
               cfg: RwkvConfig, mesh: Mesh, last_only: bool = True,
               lengths: Optional[jax.Array] = None
               ) -> Tuple[jax.Array, State]:
    """Tensor-parallel chunked prefill: semantics of models/rwkv7.forward
    (masked variable-length, last_only) with the layer weights sharded as
    in :func:`step_tp`. Reuses the model's _time_mix/_channel_mix with the
    local head count; their outputs are partial sums psum'ed here."""
    tp = mesh.shape[MODEL_AXIS]
    H_loc = cfg.n_head // tp
    C = cfg.n_embd
    C_row = C // tp
    cdt = jnp.dtype(cfg.dtype)
    f32 = jnp.float32

    p_specs = tp_param_specs(params)
    s_specs = tp_state_specs(state)
    len_spec = P(DATA_AXIS)

    def inner(params, tokens, state, lengths):
        midx = jax.lax.axis_index(MODEL_AXIS)
        B, T = tokens.shape
        if lengths is not None:
            mask = (jnp.arange(T)[None, :] < lengths[:, None])
            last_idx = jnp.clip(lengths - 1, 0, T - 1)
        else:
            mask = None
            last_idx = None
        x = params["emb"][tokens].astype(cdt)
        x = rwkv7._layer_norm(x, params["ln0_w"], params["ln0_b"], cfg.ln_eps)
        bp = params["blocks"]
        v_first0 = jnp.zeros((B, T, H_loc * cfg.head_size), f32)

        def layer_body(carry, inputs):
            x, v_first, idx = carry
            lp, att_x, ffn_x, wkv = inputs
            is_first = idx == 0
            h = rwkv7._layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
            att, att_x, wkv, v_first = rwkv7._time_mix(
                lp, h, att_x, wkv, v_first, is_first, cfg, False,
                mask=mask, last_idx=last_idx, n_head=H_loc)
            x = x + jax.lax.psum(att, MODEL_AXIS)
            h = rwkv7._layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            ffn, ffn_x = rwkv7._channel_mix(lp, h, ffn_x, mask=mask,
                                      last_idx=last_idx)
            x = x + jax.lax.psum(ffn, MODEL_AXIS)
            return (x, v_first, idx + 1), (att_x, ffn_x, wkv)

        (x, _, _), (att_xs, ffn_xs, wkvs) = jax.lax.scan(
            layer_body,
            (x, v_first0, jnp.int32(0)),
            (bp, state["att_x"], state["ffn_x"],
             state["wkv"].astype(f32)))
        wkvs = wkvs.astype(jnp.dtype(cfg.state_dtype))

        x = rwkv7._layer_norm(x, params["ln_out_w"], params["ln_out_b"], cfg.ln_eps)
        if last_only:
            if last_idx is not None:
                x = jnp.take_along_axis(
                    x, last_idx[:, None, None], axis=1)[:, 0]
            else:
                x = x[:, -1, :]
        xs = jax.lax.dynamic_slice_in_dim(x, midx * C_row, C_row, axis=-1)
        logits = jax.lax.psum(qmatmul(xs, params["head"]),
                              MODEL_AXIS).astype(f32)
        return logits, {"att_x": att_xs, "ffn_x": ffn_xs, "wkv": wkvs}

    if lengths is None:
        def inner2(params, tokens, state):
            return inner(params, tokens, state, None)
        return jax.shard_map(
            inner2, mesh=mesh,
            in_specs=(p_specs, P(DATA_AXIS, None), s_specs),
            out_specs=(P(DATA_AXIS, None), s_specs),
            check_vma=False,
        )(params, tokens, state)
    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(p_specs, P(DATA_AXIS, None), s_specs, len_spec),
        out_specs=(P(DATA_AXIS, None), s_specs),
        check_vma=False,
    )(params, tokens, state, lengths)


@functools.lru_cache(maxsize=8)
def make_step_fn(cfg: RwkvConfig, mesh: Mesh):
    """A STABLE (cached) decode-step hook for the engine stages:
    ``step_fn(params, token, state, head_slice)``. Stages treat step_fn as
    a static jit arg, so the same (cfg, mesh) must always yield the same
    object — hence the lru_cache."""
    def step_fn(params, token, state, head_slice):
        return step_tp(params, token, state, cfg, mesh,
                       head_slice=head_slice)
    return step_fn
