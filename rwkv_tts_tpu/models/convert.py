"""Checkpoint import: RWKV-7 safetensors → our stacked-layer pytree, plus a
minimal ONNX initializer reader for the codec weights.

The reference loads ``webrwkv.safetensors`` through web-rwkv's Loader
(src/shared_runtime.rs:85-176, "V7 only" enforced at :115-120). That file is
the standard RWKV-7 checkpoint layout (``blocks.N.att.*``, torch Linear
weights stored [out, in]); we map it into the layout of models/rwkv7.py,
inferring every dimension from tensor shapes — nothing is hard-coded
(the reference's prefab fallback dims at shared_runtime.rs:128-137 are
explicitly NOT trusted, per SURVEY.md §2.2).

ONNX: the ``onnx`` package is not available in this environment, so
``read_onnx_initializers`` parses the protobuf wire format directly — enough
to pull named weight tensors out of any .onnx file for mapping into the JAX
codec modules.
"""

from __future__ import annotations

import json
import logging
import struct
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import RwkvConfig

log = logging.getLogger(__name__)


# --------------------------------------------------------------------------
# safetensors reading (header-driven; F32 tensors are zero-copy views of
# the blob, BF16/F16 expand to f32 — the only copies made)
# --------------------------------------------------------------------------

_ST_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": None,  # bf16 special-cased
    "I64": np.int64, "I32": np.int32, "U8": np.uint8,
}


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a .safetensors file as float32 numpy arrays."""
    import os as _os
    with open(path, "rb") as f:
        head = f.read(8)
        if len(head) < 8:
            raise ValueError(
                f"{path} is not a safetensors file (shorter than the "
                f"8-byte header)")
        (hlen,) = struct.unpack("<Q", head)
        # a non-safetensors file (e.g. a CBOR prefab) yields a garbage
        # header length here — reject BEFORE allocating it
        if hlen > _os.fstat(f.fileno()).st_size - 8:
            raise ValueError(
                f"{path} is not a safetensors file (header length "
                f"{hlen} exceeds the file)")
        try:
            header = json.loads(f.read(hlen))
        except (ValueError, UnicodeDecodeError) as e:
            # web-rwkv "prefab" checkpoints (CBOR, shared_runtime.rs:85-138)
            # and other non-safetensors files land here; the LM loader
            # sniffs formats via read_lm_checkpoint, which retries this
            # file as a prefab (models/prefab.py)
            raise ValueError(f"{path} is not a safetensors file") from e
        blob = f.read()
    out = {}
    for name, info in header.items():
        if name == "__metadata__":
            continue
        dt, shape = info["dtype"], info["shape"]
        s, e = info["data_offsets"]
        raw = blob[s:e]
        if dt == "BF16":
            u16 = np.frombuffer(raw, np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        elif _ST_DTYPES[dt] == np.float32:
            # view, not copy: a flagship checkpoint would otherwise hold
            # blob + a full f32 duplicate resident at load
            arr = np.frombuffer(raw, np.float32)
        else:
            arr = np.frombuffer(raw, _ST_DTYPES[dt]).astype(np.float32)
        out[name] = arr.reshape(shape)
    return out


# --------------------------------------------------------------------------
# RWKV-7 checkpoint → rwkv7.py pytree
# --------------------------------------------------------------------------

# web-rwkv ecosystem naming drift (VERDICT r2 task 5b): the canonical
# layout is BlinkDL's v7 names (blocks.N.att.x_r / w0..g2 / k_k / r_k /
# receptance|key|value|output.weight …) — what web-rwkv's own loader
# expects — but published conversions sometimes carry a wrapper prefix
# (torch .module / HF "rwkv."/"model."), spelled-out submodule names, or
# save the lora factors as nn.Linear children (att.w1.weight). Normalize
# all of those onto the canonical names BEFORE shape inference so the
# importer accepts any of them; unknown layouts still fail loudly in
# stack().
_RWKV_PREFIXES = ("rwkv.", "model.", "module.", "net.")
_RWKV_SUBST = ((".attention.", ".att."), (".feed_forward.", ".ffn."))
_RWKV_TOP_ALIASES = {
    "embeddings.weight": "emb.weight",
    "embedding.weight": "emb.weight",
    "lm_head.weight": "head.weight",
    "ln_f.weight": "ln_out.weight", "ln_f.bias": "ln_out.bias",
    "norm.weight": "ln_out.weight", "norm.bias": "ln_out.bias",
    "pre_ln.weight": "blocks.0.ln0.weight",
    "pre_ln.bias": "blocks.0.ln0.bias",
}
_LORA_NAMES = ("w1", "w2", "a1", "a2", "v1", "v2", "g1", "g2")


def normalize_rwkv7_names(tensors: Dict[str, np.ndarray]
                          ) -> Dict[str, np.ndarray]:
    """Canonicalize checkpoint tensor names; reject non-v7 files loudly
    (parity: web-rwkv enforces "V7 only", shared_runtime.rs:115-120)."""
    if any(".time_decay" in k or ".time_maa_" in k or ".time_mix_k" in k
           for k in tensors):
        raise ValueError(
            "checkpoint has RWKV v5/v6 tensor names (time_decay/time_maa) "
            "— this loader is V7 only, matching the reference "
            "(shared_runtime.rs:115-120)")
    out = {}
    for k, v in tensors.items():
        nk = k
        changed = True
        while changed:
            changed = False
            for p in _RWKV_PREFIXES:
                if nk.startswith(p):
                    nk = nk[len(p):]
                    changed = True
        for a, b in _RWKV_SUBST:
            nk = nk.replace(a, b)
        nk = _RWKV_TOP_ALIASES.get(nk, nk)
        # lora factors exported as Linear children: att.w1.weight → att.w1
        for ln in _LORA_NAMES:
            suffix = f".att.{ln}.weight"
            if nk.endswith(suffix):
                nk = nk[: -len(".weight")]
        if nk in out and nk != k:
            log.warning("normalize_rwkv7_names: %s collides with existing "
                        "%s; keeping the canonical-named tensor", k, nk)
            continue
        out[nk] = v
    return out


def infer_config(tensors: Dict[str, np.ndarray],
                 dtype: str = "bfloat16") -> RwkvConfig:
    """Derive the architecture from tensor shapes (SURVEY.md: actual dims
    come from the safetensors header; never hard-code)."""
    n_layer = 1 + max(
        int(k.split(".")[1]) for k in tensors if k.startswith("blocks.")
    )
    vocab, n_embd = tensors["emb.weight"].shape
    r_k = tensors["blocks.0.att.r_k"]
    n_head, head_size = r_k.shape if r_k.ndim == 2 else (
        n_embd // 64, 64
    )
    def lora(k):
        # rank = the SMALL dim: robust to either save orientation
        # ([C, rank] BlinkDL parameter vs [rank, C] Linear weight)
        t = tensors.get(k)
        return int(min(t.shape)) if t is not None and t.ndim == 2 else 0
    # the big dim is the hidden one in either save orientation
    ffn_hidden = max(tensors["blocks.0.ffn.key.weight"].shape)
    padded = ((vocab + 127) // 128) * 128
    return RwkvConfig(
        n_layer=n_layer, n_embd=n_embd, head_size=head_size,
        vocab_size=vocab, padded_vocab_size=padded,
        ffn_mult=ffn_hidden // n_embd,
        decay_lora=lora("blocks.0.att.w1"),
        a_lora=lora("blocks.0.att.a1"),
        v_lora=lora("blocks.1.att.v1") if "blocks.1.att.v1" in tensors else 0,
        gate_lora=lora("blocks.0.att.g1"),
        dtype=dtype, param_dtype=dtype,
    )


def read_lm_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """LM container sniffing, parity with shared_runtime.rs:108-138: try
    safetensors first, else treat the file as a web-rwkv CBOR prefab
    (models/prefab.py)."""
    try:
        return read_safetensors(path)
    except ValueError as st_err:
        from .prefab import CborError, read_prefab
        try:
            return read_prefab(path)
        except CborError as pe:
            raise ValueError(
                f"{path} is neither a safetensors file nor a readable "
                f"web-rwkv prefab ({pe})") from st_err


def load_rwkv7(path: str, dtype: str = "bfloat16"
               ) -> Tuple[Dict[str, Any], RwkvConfig]:
    """Load webrwkv.safetensors (or a CBOR prefab) into the
    stacked-layer pytree of models/rwkv7.py. Returns (params, config)."""
    import jax.numpy as jnp

    t = normalize_rwkv7_names(read_lm_checkpoint(path))
    cfg = infer_config(t, dtype)
    L, C, H, N = cfg.n_layer, cfg.n_embd, cfg.n_head, cfg.head_size
    V, PV = cfg.vocab_size, cfg.padded_vocab_size
    pdt = jnp.dtype(cfg.param_dtype)

    def flat(x):
        return np.asarray(x).reshape(-1)

    def stack(fmt, shape, transform=None, default=None):
        """Stack blocks.{i}.<fmt> over layers into [L, *shape].

        ``default`` fills LAYER 0 only, for tensors the architecture
        genuinely omits there (the v-lora). Everything else missing is
        checkpoint drift/corruption and raises with the exact key — a
        silent zero-fill loads a broken model that synthesizes garbage
        with no error (the BiCodec loader's resolver behaves the same
        way)."""
        arrs = []
        missing = []
        for i in range(L):
            key = f"blocks.{i}.{fmt}"
            if key in t:
                a = t[key]
                if transform:
                    a = transform(a)
                arrs.append(np.asarray(a, np.float32).reshape(shape))
            elif default is not None and i == 0:
                arrs.append(np.full(shape, default, np.float32))
            else:
                missing.append(key)
        if missing:
            raise KeyError(
                f"checkpoint is missing {missing[0]}"
                + (f" (+{len(missing) - 1} more layers)" if len(missing) > 1
                   else "")
                + " — naming drift or a truncated file; refusing to "
                  "zero-fill a required tensor")
        return np.stack(arrs)

    def j(x, dt=None):
        return jnp.asarray(x, dt or pdt)

    f32 = jnp.float32
    tr = np.transpose  # torch Linear [out,in] → ours [in,out]

    def orient(shape):
        """Orientation-robust mapper for RECTANGULAR 2D tensors (loras,
        ffn): accepts either save orientation, transposing only when the
        shape proves it. Without this, reshape() would silently scramble
        a transposed save (same element count). Square matrices stay on
        the torch [out,in] convention (undetectable by shape)."""
        def f(a):
            a = np.asarray(a)
            if a.ndim == 2 and tuple(a.shape) != tuple(shape) \
                    and tuple(a.T.shape) == tuple(shape):
                return a.T
            return a
        return f

    emb = np.zeros((PV, C), np.float32)
    emb[:V] = t["emb.weight"]
    head = np.zeros((C, PV), np.float32)
    head[:, :V] = tr(t["head.weight"])

    Dw, Da, Dv, Dg = cfg.decay_lora, cfg.a_lora, cfg.v_lora, cfg.gate_lora
    params = {
        "emb": j(emb),
        "ln0_w": j(t["blocks.0.ln0.weight"], f32),
        "ln0_b": j(t["blocks.0.ln0.bias"], f32),
        "ln_out_w": j(t["ln_out.weight"], f32),
        "ln_out_b": j(t["ln_out.bias"], f32),
        "head": j(head),
        "blocks": {
            "ln1_w": j(stack("ln1.weight", (C,)), f32),
            "ln1_b": j(stack("ln1.bias", (C,)), f32),
            "ln2_w": j(stack("ln2.weight", (C,)), f32),
            "ln2_b": j(stack("ln2.bias", (C,)), f32),
            "x_r": j(stack("att.x_r", (C,)), f32),
            "x_w": j(stack("att.x_w", (C,)), f32),
            "x_k": j(stack("att.x_k", (C,)), f32),
            "x_v": j(stack("att.x_v", (C,)), f32),
            "x_a": j(stack("att.x_a", (C,)), f32),
            "x_g": j(stack("att.x_g", (C,)), f32),
            "w_r": j(stack("att.receptance.weight", (C, C), tr)),
            "w_k": j(stack("att.key.weight", (C, C), tr)),
            "w_v": j(stack("att.value.weight", (C, C), tr)),
            "w_o": j(stack("att.output.weight", (C, C), tr)),
            "w0": j(stack("att.w0", (C,)), f32),
            "w1": j(stack("att.w1", (C, Dw), orient((C, Dw)))),
            "w2": j(stack("att.w2", (Dw, C), orient((Dw, C)))),
            "a0": j(stack("att.a0", (C,)), f32),
            "a1": j(stack("att.a1", (C, Da), orient((C, Da)))),
            "a2": j(stack("att.a2", (Da, C), orient((Da, C)))),
            # layer 0 has no v-lora; zeros make σ(v0+..)=0.5 but v_first
            # branch is selected there, so the values are unused
            "v0": j(stack("att.v0", (C,), default=0.0), f32),
            "v1": j(stack("att.v1", (C, Dv), orient((C, Dv)), default=0.0)),
            "v2": j(stack("att.v2", (Dv, C), orient((Dv, C)), default=0.0)),
            "g1": j(stack("att.g1", (C, Dg), orient((C, Dg)))),
            "g2": j(stack("att.g2", (Dg, C), orient((Dg, C)))),
            "k_k": j(stack("att.k_k", (C,)), f32),
            "k_a": j(stack("att.k_a", (C,)), f32),
            "r_k": j(stack("att.r_k", (H, N)), f32),
            "ln_x_w": j(stack("att.ln_x.weight", (C,)), f32),
            "ln_x_b": j(stack("att.ln_x.bias", (C,)), f32),
            "ffn_x_k": j(stack("ffn.x_k", (C,)), f32),
            "ffn_k": j(stack("ffn.key.weight", (C, cfg.ffn_mult * C), orient((C, cfg.ffn_mult * C)))),
            "ffn_v": j(stack("ffn.value.weight", (cfg.ffn_mult * C, C), orient((cfg.ffn_mult * C, C)))),
        },
    }
    return params, cfg


# --------------------------------------------------------------------------
# minimal ONNX protobuf reader (initializers only)
# --------------------------------------------------------------------------

_ONNX_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64,
    10: np.float16, 11: np.float64,
}


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos:pos + 8]; pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]; pos += ln
        elif wire == 5:
            val = buf[pos:pos + 4]; pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_tensor_proto(buf: bytes) -> Tuple[str, Optional[np.ndarray]]:
    dims, name, dtype, raw = [], "", 1, b""
    floats, ints = [], []
    for field, wire, val in _iter_fields(buf):
        if field == 1 and wire == 0:
            dims.append(val)
        elif field == 2:
            dtype = val
        elif field == 8:
            name = val.decode("utf-8", "replace")
        elif field == 9:
            raw = val
        elif field == 4:   # packed float_data
            floats.append(val)
        elif field == 7:   # packed int64_data
            ints.append(val)
    np_dt = _ONNX_DTYPES.get(dtype)
    if np_dt is None:
        return name, None
    if raw:
        arr = np.frombuffer(raw, np_dt)
    elif floats:
        arr = np.frombuffer(b"".join(floats), np.float32)
    elif ints:
        vals = []
        for blob in ints:
            p = 0
            while p < len(blob):
                v, p = _read_varint(blob, p)
                vals.append(v - (1 << 64) if v >= (1 << 63) else v)
        arr = np.asarray(vals, np.int64)
    else:
        arr = np.zeros(0, np_dt)
    try:
        return name, arr.reshape(dims)
    except ValueError:
        return name, arr


def read_onnx_initializers(path: str) -> Dict[str, np.ndarray]:
    """Extract {name: ndarray} for every initializer in an ONNX file."""
    with open(path, "rb") as f:
        model = f.read()
    graph = None
    for field, wire, val in _iter_fields(model):
        if field == 7 and wire == 2:   # ModelProto.graph
            graph = val
            break
    if graph is None:
        raise ValueError("no graph in ONNX file")
    out = {}
    for field, wire, val in _iter_fields(graph):
        if field == 5 and wire == 2:   # GraphProto.initializer
            name, arr = _parse_tensor_proto(val)
            if arr is not None:
                out[name] = arr
    return out


# --------------------------------------------------------------------------
# Native checkpoint format (.npz): save/load any parameter pytree, including
# int8-quantized trees and bf16 leaves. Serving analog of the reference's
# local model files — lets a server persist its post-load (possibly
# quantized) weights and restart without re-importing/re-quantizing.
# --------------------------------------------------------------------------

def save_checkpoint(params, path: str) -> None:
    import jax
    import ml_dtypes

    leaves: list = []

    def enc(x):
        arr = np.asarray(x)
        idx = len(leaves)
        if arr.dtype == ml_dtypes.bfloat16:
            leaves.append(arr.view(np.uint16))
            dt = "bfloat16"
        else:
            leaves.append(arr)
            dt = str(arr.dtype)
        return {"__leaf__": idx, "dtype": dt}

    structure = jax.tree_util.tree_map(enc, params)

    def jsonable(node):
        # JSON has no tuple and tree_map passes None through: tag tuples
        # so load restores the exact pytree structure, and let None
        # round-trip as null (e.g. BiCodec convnext trees carry
        # gamma=None when the checkpoint has no gamma)
        if isinstance(node, tuple):
            return {"__tuple__": [jsonable(v) for v in node]}
        if isinstance(node, list):
            return [jsonable(v) for v in node]
        if isinstance(node, dict) and "__leaf__" not in node:
            return {k: jsonable(v) for k, v in node.items()}
        return node

    manifest = np.frombuffer(
        json.dumps(jsonable(structure)).encode("utf-8"), np.uint8)
    arrays = {f"a{i}": a for i, a in enumerate(leaves)}
    tmp = path + ".tmp"
    np.savez(tmp, __manifest__=manifest, **arrays)
    # np.savez appends .npz to names without it
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    import os as _os
    _os.replace(src, path)


def load_checkpoint(path: str):
    import jax
    import ml_dtypes

    with np.load(path) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode("utf-8"))

        def dec(node):
            if node is None:
                return None
            if isinstance(node, dict) and "__leaf__" in node:
                arr = z[f"a{node['__leaf__']}"]
                if node["dtype"] == "bfloat16":
                    arr = arr.view(ml_dtypes.bfloat16)
                return jax.device_put(arr)
            if isinstance(node, dict) and "__tuple__" in node:
                return tuple(dec(v) for v in node["__tuple__"])
            if isinstance(node, dict):
                return {k: dec(v) for k, v in node.items()}
            if isinstance(node, list):
                return [dec(v) for v in node]
            raise ValueError(f"unexpected manifest node: {type(node)}")

        return dec(manifest)


# --------------------------------------------------------------------------
# wav2vec2 weight import: HF-style state dict → models/wav2vec2.py pytree.
# The reference consumes an ONNX export of facebook/wav2vec2-large-xlsr-53;
# read_onnx_initializers / a HF safetensors file both yield name->array maps
# this function understands (HF names; ONNX exports typically keep them in
# the initializer names).
# --------------------------------------------------------------------------

def load_wav2vec2_weights(tensors: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Map a wav2vec2 (stable-layer-norm) checkpoint into our pytree.

    Accepts HF parameter names with or without the leading
    ``wav2vec2.``/``model.`` prefix. Torch Linear weights ([out, in]) are
    transposed; conv weights keep [out, in, k].
    """
    def get(*names):
        for n in names:
            for prefix in ("", "wav2vec2.", "model.", "model.wav2vec2."):
                if prefix + n in tensors:
                    return np.asarray(tensors[prefix + n], np.float32)
        raise KeyError(f"missing wav2vec2 tensor: {names[0]}")

    tr = np.transpose
    convs = []
    for i in range(len(cfg.conv_dims)):
        base = f"feature_extractor.conv_layers.{i}"
        conv = {
            "w": get(f"{base}.conv.weight"),
            "ln_w": get(f"{base}.layer_norm.weight"),
            "ln_b": get(f"{base}.layer_norm.bias"),
        }
        try:
            # xlsr-53 has conv_bias=true — dropping it would silently
            # skew every extracted feature; optional because group-norm
            # base checkpoints ship without it
            conv["b"] = get(f"{base}.conv.bias")
        except KeyError:
            pass
        convs.append(conv)
    layers = []
    for i in range(cfg.num_layers):
        b = f"encoder.layers.{i}"
        layers.append({
            "ln1_w": get(f"{b}.layer_norm.weight"),
            "ln1_b": get(f"{b}.layer_norm.bias"),
            "q": tr(get(f"{b}.attention.q_proj.weight")),
            "q_b": get(f"{b}.attention.q_proj.bias"),
            "k": tr(get(f"{b}.attention.k_proj.weight")),
            "k_b": get(f"{b}.attention.k_proj.bias"),
            "v": tr(get(f"{b}.attention.v_proj.weight")),
            "v_b": get(f"{b}.attention.v_proj.bias"),
            "o": tr(get(f"{b}.attention.out_proj.weight")),
            "o_b": get(f"{b}.attention.out_proj.bias"),
            "ln2_w": get(f"{b}.final_layer_norm.weight"),
            "ln2_b": get(f"{b}.final_layer_norm.bias"),
            "fc1": tr(get(f"{b}.feed_forward.intermediate_dense.weight")),
            "fc1_b": get(f"{b}.feed_forward.intermediate_dense.bias"),
            "fc2": tr(get(f"{b}.feed_forward.output_dense.weight")),
            "fc2_b": get(f"{b}.feed_forward.output_dense.bias"),
        })
    import jax
    import jax.numpy as jnp
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.asarray(np.stack(xs)),
                                     *layers)
    # positional conv may be stored weight-normalized: legacy
    # (weight_g/weight_v) or torch-parametrize (original0/original1);
    # HF norms this conv over dim=2
    try:
        pos_w = get("encoder.pos_conv_embed.conv.weight")
    except KeyError:
        g = get("encoder.pos_conv_embed.conv.weight_g",
                "encoder.pos_conv_embed.conv.parametrizations.weight.original0")
        v = get("encoder.pos_conv_embed.conv.weight_v",
                "encoder.pos_conv_embed.conv.parametrizations.weight.original1")
        axes = tuple(i for i in range(v.ndim)
                     if g.shape[i] == 1) if g.ndim == v.ndim else (0, 1)
        norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True)) + 1e-12
        pos_w = v / norm * g.reshape(norm.shape)
    return {
        "convs": [{k: jnp.asarray(v) for k, v in c.items()} for c in convs],
        "proj_ln_w": jnp.asarray(get("feature_projection.layer_norm.weight")),
        "proj_ln_b": jnp.asarray(get("feature_projection.layer_norm.bias")),
        "proj_w": jnp.asarray(tr(get("feature_projection.projection.weight"))),
        "proj_b": jnp.asarray(get("feature_projection.projection.bias")),
        "pos_conv_w": jnp.asarray(pos_w),
        "pos_conv_b": jnp.asarray(get("encoder.pos_conv_embed.conv.bias")),
        "enc_ln_w": jnp.asarray(get("encoder.layer_norm.weight")),
        "enc_ln_b": jnp.asarray(get("encoder.layer_norm.bias")),
        "layers": stacked,
    }


# --------------------------------------------------------------------------
# BiCodec weight import: torch-style state dict → models/bicodec.py pytree.
#
# Sources accepted: a torch checkpoint's state dict (torch.load / HF
# safetensors) or the ONNX exports' initializer map (read_onnx_initializers)
# when the exporter preserved module names. Weight-normed convs are stored
# as (weight_g, weight_v) pairs in torch checkpoints — folded here; ONNX
# exports bake the fused weight. Key names follow the public SparkTTS
# BiCodec module tree; every lookup carries alternate candidates and a
# missing key raises with near-miss suggestions, so importing a checkpoint
# whose names drifted fails actionably rather than silently.
# --------------------------------------------------------------------------

def fold_weight_norm(tensors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold torch weight-norm pairs into X.weight.

    Accepts both on-disk namings — classic (X.weight_g / X.weight_v) and
    the torch >= 2.1 parametrize scheme
    (X.parametrizations.weight.original0/original1) — and infers the norm
    dim from g's shape (torch keeps g all-singleton except the kept dim:
    dim=0 for DAC/BiCodec convs, dim=2 for HF's wav2vec2 pos-conv)."""
    V_SUFFIXES = (".weight_v", ".parametrizations.weight.original1")
    out = dict(tensors)
    for k in list(tensors):
        suf = next((s for s in V_SUFFIXES if k.endswith(s)), None)
        if suf is None:
            continue
        base = k[: -len(suf)]
        gk = base + (".weight_g" if suf == ".weight_v"
                     else ".parametrizations.weight.original0")
        if gk not in tensors:
            continue
        v = np.asarray(tensors[k], np.float32)
        g = np.asarray(tensors[gk], np.float32)
        if g.ndim == v.ndim:
            dim = next((i for i, s in enumerate(g.shape) if s != 1), 0)
        else:
            dim = 0
        axes = tuple(i for i in range(v.ndim) if i != dim)
        norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True)) + 1e-12
        out[base + ".weight"] = g.reshape(norm.shape) * v / norm
        out.pop(k, None)
        out.pop(gk, None)
    return out


class _KeyResolver:
    def __init__(self, tensors: Dict[str, np.ndarray]):
        self.t = tensors
        self.prefixes = ("", "model.", "bicodec.", "model.bicodec.",
                         "module.", "generator.")

    def get(self, *names) -> np.ndarray:
        for n in names:
            for p in self.prefixes:
                if p + n in self.t:
                    return np.asarray(self.t[p + n], np.float32)
        import difflib
        close = difflib.get_close_matches(
            names[0], list(self.t), n=4, cutoff=0.4)
        raise KeyError(
            f"missing BiCodec tensor {names[0]!r} (also tried "
            f"{list(names[1:])}); closest checkpoint keys: {close}")

    def has(self, name) -> bool:
        return any(p + name in self.t for p in self.prefixes)


def load_bicodec_weights(tensors: Dict[str, np.ndarray], cfg
                         ) -> Dict[str, Any]:
    """Map a BiCodec state dict onto the models/bicodec.py pytree."""
    import jax.numpy as jnp

    r = _KeyResolver(fold_weight_norm(tensors))
    get, tr = r.get, np.transpose

    def j(x):
        return jnp.asarray(x)

    def jl(*names):                       # torch Linear → ours [in, out]
        return j(tr(get(*names)))

    def ada(base):
        return {"scale_w": jl(f"{base}.scale.weight"),
                "scale_b": j(get(f"{base}.scale.bias")),
                "shift_w": jl(f"{base}.shift.weight"),
                "shift_b": j(get(f"{base}.shift.bias"))}

    def cnx(base, cond):
        p = {"dw_w": j(get(f"{base}.dwconv.weight")),
             "dw_b": j(get(f"{base}.dwconv.bias")),
             "pw1_w": jl(f"{base}.pwconv1.weight"),
             "pw1_b": j(get(f"{base}.pwconv1.bias")),
             "pw2_w": jl(f"{base}.pwconv2.weight"),
             "pw2_b": j(get(f"{base}.pwconv2.bias")),
             "gamma": (j(get(f"{base}.gamma"))
                       if r.has(f"{base}.gamma") else None)}
        if cond:
            p["norm"] = ada(f"{base}.norm")
        else:
            p["norm_w"] = j(get(f"{base}.norm.weight"))
            p["norm_b"] = j(get(f"{base}.norm.bias"))
        return p

    def vocos(base, layers, cond=False):
        p = {"embed_w": j(get(f"{base}.embed.weight")),
             "embed_b": j(get(f"{base}.embed.bias")),
             "blocks": [cnx(f"{base}.convnext.{i}", cond)
                        for i in range(layers)],
             "final_ln_w": j(get(f"{base}.final_layer_norm.weight")),
             "final_ln_b": j(get(f"{base}.final_layer_norm.bias"))}
        if cond:
            p["norm"] = ada(f"{base}.norm")
        else:
            p["norm_w"] = j(get(f"{base}.norm.weight"))
            p["norm_b"] = j(get(f"{base}.norm.bias"))
        return p

    enc = {
        "backbone": vocos("encoder.encoder", cfg.encoder_layers),
        "stages": [{"vocos": vocos(f"encoder.downsample.{i}.1", 2)}
                   for i in range(len(cfg.encoder_ratios))],
        "project_w": jl("encoder.project.weight"),
        "project_b": j(get("encoder.project.bias")),
    }

    vq = {
        "in_w": j(tr(get("quantizer.in_project.weight")[:, :, 0])),
        "in_b": j(get("quantizer.in_project.bias")),
        "codebook": j(get("quantizer.codebook.weight")),
        "out_w": j(tr(get("quantizer.out_project.weight")[:, :, 0])),
        "out_b": j(get("quantizer.out_project.bias")),
    }

    se_base = "speaker_encoder.speaker_encoder"

    def crb(base, conv_names=("conv",), bn_names=("bn",)):
        return {
            "w": j(get(*(f"{base}.{c}.weight" for c in conv_names))),
            "b": j(get(*(f"{base}.{c}.bias" for c in conv_names))),
            "bn": {
                "w": j(get(*(f"{base}.{b}.weight" for b in bn_names))),
                "b": j(get(*(f"{base}.{b}.bias" for b in bn_names))),
                "mean": j(get(*(f"{base}.{b}.running_mean"
                                for b in bn_names))),
                "var": j(get(*(f"{base}.{b}.running_var"
                               for b in bn_names))),
            },
        }

    def se_res2(layer):
        base = f"{se_base}.{layer}"
        scale = 8
        return {
            "conv1": crb(f"{base}.Conv1dReluBn1"),
            "res2": {"convs": [
                {"w": j(get(f"{base}.Res2Conv1dReluBn.convs.{i}.weight")),
                 "b": j(get(f"{base}.Res2Conv1dReluBn.convs.{i}.bias")),
                 "bn": {
                     "w": j(get(f"{base}.Res2Conv1dReluBn.bns.{i}.weight")),
                     "b": j(get(f"{base}.Res2Conv1dReluBn.bns.{i}.bias")),
                     "mean": j(get(
                         f"{base}.Res2Conv1dReluBn.bns.{i}.running_mean")),
                     "var": j(get(
                         f"{base}.Res2Conv1dReluBn.bns.{i}.running_var")),
                 }}
                for i in range(scale - 1)]},
            "conv2": crb(f"{base}.Conv1dReluBn2"),
            "se": {"w1": jl(f"{base}.SE_Connect.linear1.weight"),
                   "b1": j(get(f"{base}.SE_Connect.linear1.bias")),
                   "w2": jl(f"{base}.SE_Connect.linear2.weight"),
                   "b2": j(get(f"{base}.SE_Connect.linear2.bias"))},
        }

    ecapa = {
        "layer1": crb(f"{se_base}.layer1"),
        "layer2": se_res2("layer2"),
        "layer3": se_res2("layer3"),
        "layer4": se_res2("layer4"),
        "mfa_w": j(get(f"{se_base}.conv.weight")),
        "mfa_b": j(get(f"{se_base}.conv.bias")),
        "att1_w": j(get(f"{se_base}.pool.linear1.weight")),
        "att1_b": j(get(f"{se_base}.pool.linear1.bias")),
        "att2_w": j(get(f"{se_base}.pool.linear2.weight")),
        "att2_b": j(get(f"{se_base}.pool.linear2.bias")),
        "bn": {"w": j(get(f"{se_base}.bn.weight")),
               "b": j(get(f"{se_base}.bn.bias")),
               "mean": j(get(f"{se_base}.bn.running_mean")),
               "var": j(get(f"{se_base}.bn.running_var"))},
        "fc_w": jl(f"{se_base}.linear.weight"),
        "fc_b": j(get(f"{se_base}.linear.bias")),
    }

    pv = "speaker_encoder.perceiver_sampler"
    perceiver = {
        "ctx_w": jl(f"{pv}.proj_context.weight"),
        "ctx_b": j(get(f"{pv}.proj_context.bias")),
        "latents": j(get(f"{pv}.latents")),
        "layers": [
            {"attn": {"q_w": jl(f"{pv}.layers.{i}.0.to_q.weight"),
                      "kv_w": jl(f"{pv}.layers.{i}.0.to_kv.weight"),
                      "out_w": jl(f"{pv}.layers.{i}.0.to_out.weight")},
             "ff1_w": jl(f"{pv}.layers.{i}.1.0.weight"),
             "ff1_b": j(get(f"{pv}.layers.{i}.1.0.bias")),
             "ff2_w": jl(f"{pv}.layers.{i}.1.2.weight"),
             "ff2_b": j(get(f"{pv}.layers.{i}.1.2.bias"))}
            for i in range(cfg.perceiver_depth)
        ],
        "norm_g": j(get(f"{pv}.norm.gamma", f"{pv}.norm.g",
                        f"{pv}.norm.weight")),
    }

    speaker = {
        "ecapa": ecapa,
        "perceiver": perceiver,
        "fsq_in_w": jl("speaker_encoder.quantizer.project_in.weight"),
        "fsq_in_b": j(get("speaker_encoder.quantizer.project_in.bias")),
        "fsq_out_w": jl("speaker_encoder.quantizer.project_out.weight"),
        "fsq_out_b": j(get("speaker_encoder.quantizer.project_out.bias")),
        "proj_w": jl("speaker_encoder.project.weight"),
        "proj_b": j(get("speaker_encoder.project.bias")),
    }

    prenet = {
        "pre_w": jl("prenet.linear_pre.weight"),
        "pre_b": j(get("prenet.linear_pre.bias")),
        "stages": [{"vocos": vocos(f"prenet.downsample.{i}.1", 2)}
                   for i in range(len(cfg.prenet_ratios))],
        "backbone": vocos("prenet.vocos_backbone", cfg.prenet_layers,
                          cond=True),
        "out_w": jl("prenet.linear.weight"),
        "out_b": j(get("prenet.linear.bias")),
    }

    blocks = []
    for i in range(len(cfg.dec_rates)):
        base = f"decoder.model.{1 + i}.block"
        blocks.append({
            "alpha": j(get(f"{base}.0.alpha").reshape(-1)),
            "up_w": j(get(f"{base}.1.weight")),
            "up_b": j(get(f"{base}.1.bias")),
            "res": [
                {"alpha1": j(get(f"{base}.{2 + u}.block.0.alpha").reshape(-1)),
                 "w1": j(get(f"{base}.{2 + u}.block.1.weight")),
                 "b1": j(get(f"{base}.{2 + u}.block.1.bias")),
                 "alpha2": j(get(f"{base}.{2 + u}.block.2.alpha").reshape(-1)),
                 "w2": j(get(f"{base}.{2 + u}.block.3.weight")),
                 "b2": j(get(f"{base}.{2 + u}.block.3.bias"))}
                for u in range(3)
            ],
        })
    n_up = len(cfg.dec_rates)
    wavegen = {
        "in_w": j(get("decoder.model.0.weight")),
        "in_b": j(get("decoder.model.0.bias")),
        "blocks": blocks,
        "alpha_out": j(get(f"decoder.model.{1 + n_up}.alpha").reshape(-1)),
        "out_w": j(get(f"decoder.model.{2 + n_up}.weight")),
        "out_b": j(get(f"decoder.model.{2 + n_up}.bias")),
    }

    return {"encoder": enc, "quantizer": vq, "speaker": speaker,
            "prenet": prenet, "wavegen": wavegen}


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Read a tensor map from .safetensors / .npz / torch .pt/.bin/.ckpt."""
    low = path.lower()
    if low.endswith(".safetensors"):
        return read_safetensors(path)
    if low.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}
