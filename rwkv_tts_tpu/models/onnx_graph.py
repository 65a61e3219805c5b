"""ONNX graph → JAX transpiler: parse the full graph topology and execute
it as a traced jnp program (one XLA executable per input-shape bucket).

This is the load path for the reference's three codec graphs
(``BiCodecTokenize.onnx``, ``BiCodecDetokenize.onnx``,
``wav2vec2-large-xlsr-53.onnx`` — consumed through ONNX Runtime sessions at
src/ref_audio_utilities.rs:927-973, :1047-1257, :1259-1297). Where the
reference pools N CPU sessions per graph (src/onnx_session_pool.rs), here
each graph becomes a pure function ``f(**inputs) -> outputs`` that can be
``jax.jit``-ed and runs on the TPU; XLA executables are reentrant so no
pooling is needed.

Design notes (TPU/XLA-first):
  * The executor traces eagerly over the node list. All tensor shapes are
    concrete at trace time, so ONNX's dynamic-shape machinery (Shape /
    Gather / Concat / Reshape chains) collapses into *host-side numpy
    constants* — the resulting XLA program is fully static, exactly what
    the MXU wants. Values that never touch a traced array stay numpy.
  * No onnx / onnxruntime dependency: the protobuf wire format is decoded
    directly (see models/convert.py for the initializer-only reader this
    extends).
  * Unsupported ops raise with the op name — loud, not silent.

Tested against ``torch.onnx`` exports of equivalent modules
(tests/test_onnx_graph.py): conv/transposed-conv stacks, layer/batch norm,
attention blocks, snake activations, resamplers.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .convert import _iter_fields, _parse_tensor_proto, _read_varint

# --------------------------------------------------------------------------
# protobuf parsing (NodeProto / AttributeProto / GraphProto / ModelProto)
# --------------------------------------------------------------------------

_ATTR_FLOAT, _ATTR_INT, _ATTR_STRING, _ATTR_TENSOR = 1, 2, 3, 4
_ATTR_FLOATS, _ATTR_INTS, _ATTR_STRINGS = 6, 7, 8


def _parse_attribute(buf: bytes) -> Tuple[str, Any]:
    name, atype = "", 0
    f = i = s = t = None
    floats: List[float] = []
    ints: List[int] = []
    strings: List[bytes] = []
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            name = val.decode("utf-8", "replace")
        elif field == 20:
            atype = val
        elif field == 2:
            f = np.frombuffer(val, "<f4")[0] if wire == 5 else float(val)
        elif field == 3:
            i = val - (1 << 64) if val >= (1 << 63) else val
        elif field == 4:
            s = val
        elif field == 5:
            t = _parse_tensor_proto(val)[1]
        elif field == 7:
            if wire == 5:
                floats.append(np.frombuffer(val, "<f4")[0])
            else:  # packed
                floats.extend(np.frombuffer(val, "<f4").tolist())
        elif field == 8:
            if wire == 0:
                v = val - (1 << 64) if val >= (1 << 63) else val
                ints.append(v)
            else:  # packed varints
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    ints.append(v - (1 << 64) if v >= (1 << 63) else v)
        elif field == 9:
            strings.append(val)
    if atype == _ATTR_FLOAT:
        return name, f
    if atype == _ATTR_INT:
        return name, i
    if atype == _ATTR_STRING:
        return name, s.decode("utf-8", "replace") if s is not None else ""
    if atype == _ATTR_TENSOR:
        return name, t
    if atype == _ATTR_FLOATS:
        return name, tuple(floats)
    if atype == _ATTR_INTS:
        return name, tuple(ints)
    if atype == _ATTR_STRINGS:
        return name, tuple(x.decode("utf-8", "replace") for x in strings)
    # untyped (old exporters): best effort by which field was set
    for v in (i, f, s):
        if v is not None:
            return name, v
    if ints:
        return name, tuple(ints)
    if floats:
        return name, tuple(floats)
    return name, None


class Node:
    __slots__ = ("op", "inputs", "outputs", "attrs", "name")

    def __init__(self, op: str, inputs: List[str], outputs: List[str],
                 attrs: Dict[str, Any], name: str = ""):
        self.op = op
        self.inputs = inputs
        self.outputs = outputs
        self.attrs = attrs
        self.name = name

    def __repr__(self):
        return f"Node({self.op}, in={self.inputs}, out={self.outputs})"


def _parse_node(buf: bytes) -> Node:
    inputs: List[str] = []
    outputs: List[str] = []
    attrs: Dict[str, Any] = {}
    op = name = ""
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            inputs.append(val.decode("utf-8", "replace"))
        elif field == 2:
            outputs.append(val.decode("utf-8", "replace"))
        elif field == 3:
            name = val.decode("utf-8", "replace")
        elif field == 4:
            op = val.decode("utf-8", "replace")
        elif field == 5:
            k, v = _parse_attribute(val)
            attrs[k] = v
    return Node(op, inputs, outputs, attrs, name)


def _parse_value_info_name(buf: bytes) -> str:
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            return val.decode("utf-8", "replace")
    return ""


class OnnxGraph:
    """Parsed ONNX model: node topology + initializers + I/O names."""

    def __init__(self, data: bytes):
        graph = None
        self.opset = 0
        for field, wire, val in _iter_fields(data):
            if field == 7 and wire == 2:          # ModelProto.graph
                graph = val
            elif field == 8 and wire == 2:        # ModelProto.opset_import
                dom, ver = "", 0
                for f2, w2, v2 in _iter_fields(val):
                    if f2 == 1:
                        dom = v2.decode("utf-8", "replace")
                    elif f2 == 2:
                        ver = v2
                if dom in ("", "ai.onnx"):
                    self.opset = ver
        if graph is None:
            raise ValueError("no graph in ONNX file")
        self.nodes: List[Node] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self.input_names: List[str] = []
        self.output_names: List[str] = []
        for field, wire, val in _iter_fields(graph):
            if field == 1 and wire == 2:          # node
                self.nodes.append(_parse_node(val))
            elif field == 5 and wire == 2:        # initializer
                nm, arr = _parse_tensor_proto(val)
                if arr is not None:
                    self.initializers[nm] = arr
            elif field == 11 and wire == 2:       # graph input
                self.input_names.append(_parse_value_info_name(val))
            elif field == 12 and wire == 2:       # graph output
                self.output_names.append(_parse_value_info_name(val))
        # graph "inputs" include initializers in some exports — keep only
        # the true runtime feeds
        self.input_names = [n for n in self.input_names
                            if n not in self.initializers]

    @classmethod
    def load(cls, path: str) -> "OnnxGraph":
        with open(path, "rb") as f:
            return cls(f.read())

    def op_histogram(self) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for n in self.nodes:
            out[n.op] = out.get(n.op, 0) + 1
        return out

    # ------------------------------------------------------------------
    # execution
    # ------------------------------------------------------------------

    def __call__(self, *args, **inputs):
        """Execute the graph. Positional args map onto input_names in
        order. Returns a single array or a tuple (graph output order)."""
        import jax.numpy as jnp  # local: keep parsing importable w/o jax

        for name, v in zip(self.input_names, args):
            inputs[name] = v
        missing = [n for n in self.input_names if n not in inputs]
        if missing:
            raise ValueError(f"missing graph inputs: {missing}")
        env: Dict[str, Any] = dict(self.initializers)
        env[""] = None                       # ONNX's "absent optional input"
        env.update(inputs)
        for node in self.nodes:
            fn = _OPS.get(node.op)
            if fn is None:
                raise NotImplementedError(
                    f"ONNX op '{node.op}' (node '{node.name}') not "
                    f"implemented; graph needs: {sorted(self.op_histogram())}")
            vals = [env[i] for i in node.inputs]
            out = fn(node, *vals)
            if not isinstance(out, tuple):
                out = (out,)
            for nm, v in zip(node.outputs, out):
                if nm:
                    env[nm] = v
        outs = tuple(env[n] for n in self.output_names)
        return outs[0] if len(outs) == 1 else outs


# --------------------------------------------------------------------------
# op implementations
#
# Values are numpy arrays (host constants: initializers, shape math) or JAX
# arrays (traced). Numpy-only ops stay in numpy so shape pipelines remain
# static under jit; mixed ops promote to jnp.
# --------------------------------------------------------------------------

def _is_np(*xs) -> bool:
    return all(isinstance(x, (np.ndarray, np.generic, int, float, bool))
               for x in xs if x is not None)


def _xp(*xs):
    if _is_np(*xs):
        return np
    import jax.numpy as jnp
    return jnp


def _const_ints(x) -> List[int]:
    """Host-side integer list (shape/axis/index operands must be static)."""
    a = np.asarray(x)
    return [int(v) for v in a.reshape(-1)]


def _elementwise(f_np, f_jnp=None):
    def run(node, *xs):
        xp = _xp(*xs)
        f = f_np if xp is np else (f_jnp or f_np)
        return f(xp, *xs)
    return run


def _binop(sym):
    def run(node, a, b):
        xp = _xp(a, b)
        if sym == "+":
            return xp.add(a, b)
        if sym == "-":
            return xp.subtract(a, b)
        if sym == "*":
            return xp.multiply(a, b)
        if sym == "/":
            # ONNX Div on ints truncates toward zero (C semantics);
            # floor_divide differs by one when exactly one operand is
            # negative and the division is inexact
            r = xp.divide(a, b)
            if np.issubdtype(np.asarray(a).dtype if xp is np else a.dtype,
                             np.integer):
                q = xp.floor_divide(a, b)
                rem = a - q * b
                fix = (rem != 0) & ((a < 0) != (b < 0))
                r = q + fix.astype(q.dtype)
            return r
        raise AssertionError(sym)
    return run


_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 5: np.int16, 6: np.int32,
    7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _op_cast(node, x):
    dt = _DTYPES[node.attrs["to"]]
    xp = _xp(x)
    return xp.asarray(x).astype(dt)


def _op_constant(node):
    for k in ("value", "value_float", "value_int", "value_floats",
              "value_ints"):
        if k in node.attrs:
            v = node.attrs[k]
            return np.asarray(v)
    raise NotImplementedError("Constant without value")


def _op_reshape(node, x, shape):
    target = _const_ints(shape)
    xshape = list(np.shape(x))
    out = []
    for i, d in enumerate(target):
        if d == 0 and not node.attrs.get("allowzero", 0):
            out.append(xshape[i])
        else:
            out.append(d)
    return _xp(x).reshape(x, out) if _xp(x) is np else x.reshape(out)


def _op_transpose(node, x):
    perm = node.attrs.get("perm")
    xp = _xp(x)
    if perm is None:
        perm = tuple(reversed(range(np.ndim(x))))
    return xp.transpose(x, perm)


def _op_unsqueeze(node, x, axes=None):
    ax = _const_ints(axes) if axes is not None else list(
        node.attrs.get("axes", ()))
    xp = _xp(x)
    out = x
    nd = np.ndim(x) + len(ax)
    for a in sorted(a % nd for a in ax):
        out = xp.expand_dims(out, a)
    return out


def _op_squeeze(node, x, axes=None):
    ax = _const_ints(axes) if axes is not None else list(
        node.attrs.get("axes", ()))
    xp = _xp(x)
    if not ax:
        return xp.squeeze(x)
    return xp.squeeze(x, axis=tuple(a % np.ndim(x) for a in ax))


def _op_concat(node, *xs):
    xp = _xp(*xs)
    return xp.concatenate(xs, axis=node.attrs.get("axis", 0))


def _op_gather(node, x, idx):
    axis = node.attrs.get("axis", 0)
    xp = _xp(x, idx)
    return xp.take(x, np.asarray(idx) if _is_np(idx) else idx, axis=axis)


def _op_gather_elements(node, x, idx):
    import jax.numpy as jnp
    axis = node.attrs.get("axis", 0)
    return jnp.take_along_axis(jnp.asarray(x), jnp.asarray(idx), axis=axis)


def _op_slice(node, x, starts=None, ends=None, axes=None, steps=None):
    if starts is None:                       # opset-9 attribute form
        starts = node.attrs["starts"]
        ends = node.attrs["ends"]
        axes = node.attrs.get("axes")
        steps = None
    starts, ends = _const_ints(starts), _const_ints(ends)
    axes = _const_ints(axes) if axes is not None else list(range(len(starts)))
    steps = _const_ints(steps) if steps is not None else [1] * len(starts)
    idx = [slice(None)] * np.ndim(x)
    INT_MAX = 1 << 62
    for s, e, a, st in zip(starts, ends, axes, steps):
        a = a % np.ndim(x)
        e2 = None if e >= INT_MAX else (None if (st < 0 and e == -INT_MAX) else e)
        if st < 0 and e <= -INT_MAX:
            e2 = None
        idx[a] = slice(s, e2, st)
    return x[tuple(idx)]


def _op_shape(node, x):
    shp = np.asarray(np.shape(x), np.int64)
    start = node.attrs.get("start", 0)
    end = node.attrs.get("end")
    return shp[start:end]


def _op_expand(node, x, shape):
    target = _const_ints(shape)
    # ONNX Expand uses bidirectional broadcasting
    out_shape = np.broadcast_shapes(tuple(np.shape(x)), tuple(target))
    xp = _xp(x)
    return xp.broadcast_to(x, out_shape)


def _op_tile(node, x, repeats):
    xp = _xp(x)
    return xp.tile(x, _const_ints(repeats))


def _op_range(node, start, limit, delta):
    s = np.asarray(start).reshape(())
    l = np.asarray(limit).reshape(())
    d = np.asarray(delta).reshape(())
    # ONNX Range supports float dtypes (time grids, positional encodings);
    # int()-casting truncated fractional deltas to a zero step
    return np.arange(s[()], l[()], d[()], dtype=s.dtype)


def _op_constant_of_shape(node, shape):
    val = node.attrs.get("value")
    fill = val.reshape(-1)[0] if val is not None else np.float32(0)
    return np.full(_const_ints(shape), fill)


def _op_where(node, c, a, b):
    xp = _xp(c, a, b)
    return xp.where(c, a, b)


def _reduce(fname):
    def run(node, x, axes=None):
        if axes is None:
            axes = node.attrs.get("axes")
        ax = tuple(a % np.ndim(x) for a in _const_ints(axes)) \
            if axes is not None else None
        keep = bool(node.attrs.get("keepdims", 1))
        xp = _xp(x)
        if fname == "l2":
            sq = xp.sum(xp.square(x), axis=ax, keepdims=keep)
            return xp.sqrt(sq)
        return getattr(xp, fname)(x, axis=ax, keepdims=keep)
    return run


def _op_argmax(node, x):
    return _arg_reduce(node, x, "argmax")


def _op_argmin(node, x):
    return _arg_reduce(node, x, "argmin")


def _arg_reduce(node, x, fname):
    axis = node.attrs.get("axis", 0)
    keep = bool(node.attrs.get("keepdims", 1))
    xp = _xp(x)
    r = getattr(xp, fname)(x, axis=axis)
    if keep:
        r = xp.expand_dims(r, axis)
    return r.astype(np.int64) if xp is np else r.astype("int64")


def _op_matmul(node, a, b):
    xp = _xp(a, b)
    return xp.matmul(a, b)


def _op_gemm(node, a, b, c=None):
    xp = _xp(a, b, c)
    alpha = node.attrs.get("alpha", 1.0)
    beta = node.attrs.get("beta", 1.0)
    if node.attrs.get("transA", 0):
        a = xp.swapaxes(a, -1, -2)
    if node.attrs.get("transB", 0):
        b = xp.swapaxes(b, -1, -2)
    y = alpha * xp.matmul(a, b)
    if c is not None:
        y = y + beta * c
    return y


def _op_einsum(node, *xs):
    import jax.numpy as jnp
    return jnp.einsum(node.attrs["equation"], *xs)


def _conv_pads(node, nd_spatial, x_shape, k_shape, strides, dilations):
    """Resolve ONNX pads/auto_pad to lax [(lo, hi), ...] per spatial dim."""
    auto = node.attrs.get("auto_pad", "NOTSET")
    if auto in ("NOTSET", ""):
        pads = node.attrs.get("pads", (0,) * (2 * nd_spatial))
        return [(pads[i], pads[i + nd_spatial]) for i in range(nd_spatial)]
    if auto == "VALID":
        return [(0, 0)] * nd_spatial
    # SAME_UPPER / SAME_LOWER
    out = []
    for i in range(nd_spatial):
        in_sz = x_shape[2 + i]
        stride, dil, k = strides[i], dilations[i], k_shape[2 + i]
        out_sz = -(-in_sz // stride)
        pad = max(0, (out_sz - 1) * stride + (k - 1) * dil + 1 - in_sz)
        lo = pad // 2 if auto == "SAME_UPPER" else pad - pad // 2
        out.append((lo, pad - lo))
    return out


def _op_conv(node, x, w, b=None):
    import jax
    import jax.numpy as jnp
    nd = np.ndim(w) - 2
    strides = tuple(node.attrs.get("strides", (1,) * nd))
    dil = tuple(node.attrs.get("dilations", (1,) * nd))
    groups = node.attrs.get("group", 1)
    pads = _conv_pads(node, nd, np.shape(x), np.shape(w), strides, dil)
    spec = "NCH"[:2] + "DHW"[3 - nd:]        # NC + spatial letters
    lhs = "NC" + "DHW"[3 - nd:]
    rhs = "OI" + "DHW"[3 - nd:]
    x = jnp.asarray(x)
    if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        x = x.astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=strides, padding=pads,
        rhs_dilation=dil, dimension_numbers=(lhs, rhs, lhs),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
    return out


def _op_conv_transpose(node, x, w, b=None):
    import jax
    import jax.numpy as jnp
    nd = np.ndim(w) - 2
    strides = tuple(node.attrs.get("strides", (1,) * nd))
    dil = tuple(node.attrs.get("dilations", (1,) * nd))
    groups = node.attrs.get("group", 1)
    out_pad = tuple(node.attrs.get("output_padding", (0,) * nd))
    pads_attr = node.attrs.get("pads", (0,) * (2 * nd))
    if node.attrs.get("auto_pad", "NOTSET") not in ("NOTSET", ""):
        raise NotImplementedError("ConvTranspose auto_pad")
    if "output_shape" in node.attrs:
        raise NotImplementedError("ConvTranspose output_shape")
    w = jnp.asarray(w)
    # ONNX ConvTranspose weight: [C_in, C_out/groups, *k]. Equivalent
    # forward conv: flip spatially, swap I/O per group.
    wf = jnp.flip(w, axis=tuple(range(2, 2 + nd)))
    if groups > 1:
        ci, co_g = w.shape[0], w.shape[1]
        wf = wf.reshape((groups, ci // groups, co_g) + w.shape[2:])
        wf = jnp.swapaxes(wf, 1, 2)
        wf = wf.reshape((groups * co_g, ci // groups) + w.shape[2:])
    else:
        wf = jnp.swapaxes(wf, 0, 1)
    pads = []
    for i in range(nd):
        k_eff = (w.shape[2 + i] - 1) * dil[i] + 1
        lo = k_eff - 1 - pads_attr[i]
        hi = k_eff - 1 - pads_attr[nd + i] + out_pad[i]
        pads.append((lo, hi))
    lhs = "NC" + "DHW"[3 - nd:]
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), wf, window_strides=(1,) * nd, padding=pads,
        lhs_dilation=strides, rhs_dilation=dil,
        dimension_numbers=(lhs, "OI" + "DHW"[3 - nd:], lhs),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
    return out


def _pool(kind):
    def run(node, x):
        import jax
        import jax.numpy as jnp
        nd = np.ndim(x) - 2
        ks = tuple(node.attrs["kernel_shape"])
        strides = tuple(node.attrs.get("strides", (1,) * nd))
        if any(d != 1 for d in node.attrs.get("dilations", (1,) * nd)):
            raise NotImplementedError("pooling dilations != 1")
        pads_attr = list(node.attrs.get("pads", (0,) * (2 * nd)))
        if node.attrs.get("ceil_mode", 0):
            # ceil output length = floor after growing the right pad to the
            # next stride boundary: out = ceil((L + p0 + p1 - k)/s) + 1
            if kind != "max":
                # average with ceil_mode needs window-clipping semantics
                # beyond reduce_window's count trick; refuse loudly
                raise NotImplementedError("AveragePool ceil_mode=1")
            for i in range(nd):
                L = np.shape(x)[2 + i]
                span = L + pads_attr[i] + pads_attr[i + nd] - ks[i]
                extra = (-span) % strides[i]
                pads_attr[i + nd] += extra
        pads = [(0, 0), (0, 0)] + [(pads_attr[i], pads_attr[i + nd])
                                   for i in range(nd)]
        window = (1, 1) + ks
        strd = (1, 1) + strides
        x = jnp.asarray(x)
        if kind == "max":
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, window, strd, pads)
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strd, pads)
        if node.attrs.get("count_include_pad", 0) or not any(pads_attr):
            return s / math.prod(ks)
        ones = jnp.ones(x.shape, x.dtype)
        cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strd, pads)
        return s / cnt
    return run


def _op_global_average_pool(node, x):
    import jax.numpy as jnp
    ax = tuple(range(2, np.ndim(x)))
    return jnp.mean(jnp.asarray(x), axis=ax, keepdims=True)


def _op_layer_norm(node, x, scale, bias=None):
    import jax.numpy as jnp
    axis = node.attrs.get("axis", -1)
    eps = node.attrs.get("epsilon", 1e-5)
    x = jnp.asarray(x)
    axes = tuple(range(axis % x.ndim, x.ndim))
    mu = x.mean(axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + eps) * scale
    if bias is not None:
        y = y + bias
    return y


def _op_batch_norm(node, x, scale, bias, mean, var):
    import jax.numpy as jnp
    eps = node.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (np.ndim(x) - 2)
    x = jnp.asarray(x)
    return ((x - mean.reshape(shape)) / np.sqrt(var + eps).reshape(shape)
            * scale.reshape(shape) + bias.reshape(shape))


def _op_instance_norm(node, x, scale, bias):
    import jax.numpy as jnp
    eps = node.attrs.get("epsilon", 1e-5)
    x = jnp.asarray(x)
    axes = tuple(range(2, x.ndim))
    mu = x.mean(axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mu) / jnp.sqrt(var + eps) * scale.reshape(shape)
            + bias.reshape(shape))


def _op_softmax(node, x):
    import jax
    axis = node.attrs.get("axis", -1)
    return jax.nn.softmax(x, axis=axis)


def _op_pad(node, x, pads=None, value=None, axes=None):
    if pads is None:
        pads = node.attrs["pads"]
    pads = _const_ints(pads)
    mode = node.attrs.get("mode", "constant")
    nd = np.ndim(x)
    if axes is not None:
        ax = [a % nd for a in _const_ints(axes)]
    else:
        ax = list(range(nd))
    width = [(0, 0)] * nd
    half = len(pads) // 2
    for j, a in enumerate(ax):
        width[a] = (pads[j], pads[j + half])
    xp = _xp(x)
    if mode == "constant":
        cv = float(np.asarray(value)) if value is not None else 0.0
        return xp.pad(x, width, constant_values=cv)
    return xp.pad(x, width, mode={"reflect": "reflect", "edge": "edge"}[mode])


def _op_split(node, x, split=None):
    axis = node.attrs.get("axis", 0)
    if split is None:
        split = node.attrs.get("split")
    xp = _xp(x)
    n = np.shape(x)[axis]
    if split is None:
        k = node.attrs.get("num_outputs")
        if k is None:
            raise NotImplementedError("Split without sizes")
        size = -(-n // k)
        split = [size] * (k - 1) + [n - size * (k - 1)]
    else:
        split = _const_ints(split)
    pts = np.cumsum(split)[:-1]
    return tuple(xp.split(x, pts, axis=axis))


def _op_clip(node, x, lo=None, hi=None):
    if lo is None and "min" in node.attrs:
        lo = node.attrs["min"]
    if hi is None and "max" in node.attrs:
        hi = node.attrs["max"]
    xp = _xp(x, lo, hi)
    return xp.clip(x, lo, hi)


def _op_resize(node, x, roi=None, scales=None, sizes=None):
    """Nearest/linear resize on trailing spatial dims (static factors)."""
    import jax
    import jax.numpy as jnp
    mode = node.attrs.get("mode", "nearest")
    in_shape = np.shape(x)
    if sizes is not None and np.size(sizes):
        out_shape = _const_ints(sizes)
    else:
        sc = np.asarray(scales, np.float64).reshape(-1)
        out_shape = [int(math.floor(d * s)) for d, s in zip(in_shape, sc)]
    method = {"nearest": "nearest", "linear": "linear",
              "cubic": "cubic"}[mode]
    return jax.image.resize(jnp.asarray(x), out_shape, method=method)


def _op_topk(node, x, k):
    import jax
    kk = int(np.asarray(k).reshape(-1)[0])
    axis = node.attrs.get("axis", -1)
    if axis not in (-1, np.ndim(x) - 1):
        raise NotImplementedError("TopK on non-last axis")
    if node.attrs.get("largest", 1):
        v, i = jax.lax.top_k(x, kk)
    else:
        # k smallest, ascending — the min-distance/nearest-neighbor
        # pattern; lax.top_k only does largest, so negate (keeps the
        # input dtype, which ONNX requires of the values output)
        import jax.numpy as jnp
        xa = jnp.asarray(x)
        if jnp.issubdtype(xa.dtype, jnp.unsignedinteger):
            raise NotImplementedError("TopK largest=0 on unsigned ints")
        v, i = jax.lax.top_k(-xa, kk)
        v = -v
    return v, i.astype("int64")


def _op_cumsum(node, x, axis):
    xp = _xp(x)
    return xp.cumsum(x, axis=int(np.asarray(axis)))


def _op_identity(node, x):
    return x


def _op_prelu(node, x, slope):
    xp = _xp(x, slope)
    return xp.where(np.asarray(x) > 0 if xp is np else x > 0, x, slope * x)


def _op_mod(node, a, b):
    xp = _xp(a, b)
    if node.attrs.get("fmod", 0):
        return xp.fmod(a, b)
    return xp.mod(a, b)


_OPS = {
    "Add": _binop("+"), "Sub": _binop("-"), "Mul": _binop("*"),
    "Div": _binop("/"),
    "Pow": _elementwise(lambda xp, a, b: xp.power(a, b)),
    "Sqrt": _elementwise(lambda xp, x: xp.sqrt(x)),
    "Exp": _elementwise(lambda xp, x: xp.exp(x)),
    "Log": _elementwise(lambda xp, x: xp.log(x)),
    "Abs": _elementwise(lambda xp, x: xp.abs(x)),
    "Reciprocal": _elementwise(lambda xp, x: 1.0 / x),
    "Atanh": _elementwise(lambda xp, x: xp.arctanh(x)),
    "Atan": _elementwise(lambda xp, x: xp.arctan(x)),
    "Asinh": _elementwise(lambda xp, x: xp.arcsinh(x)),
    "Neg": _elementwise(lambda xp, x: xp.negative(x)),
    "Floor": _elementwise(lambda xp, x: xp.floor(x)),
    "Ceil": _elementwise(lambda xp, x: xp.ceil(x)),
    "Round": _elementwise(lambda xp, x: xp.round(x)),
    "Sin": _elementwise(lambda xp, x: xp.sin(x)),
    "Cos": _elementwise(lambda xp, x: xp.cos(x)),
    "Tanh": _elementwise(lambda xp, x: xp.tanh(x)),
    "Erf": _elementwise(
        lambda xp, x: np.vectorize(math.erf)(x).astype(np.asarray(x).dtype),
        lambda xp, x: __import__("jax").scipy.special.erf(x)),
    "Sigmoid": _elementwise(
        lambda xp, x: 1.0 / (1.0 + xp.exp(-x)),
        lambda xp, x: __import__("jax").nn.sigmoid(x)),
    "Relu": _elementwise(lambda xp, x: xp.maximum(x, 0)),
    "LeakyRelu": (lambda node, x: _xp(x).where(
        (np.asarray(x) > 0) if _is_np(x) else (x > 0),
        x, node.attrs.get("alpha", 0.01) * x)),
    "Elu": (lambda node, x: _xp(x).where(
        (np.asarray(x) > 0) if _is_np(x) else (x > 0), x,
        node.attrs.get("alpha", 1.0) * (_xp(x).exp(x) - 1))),
    "Softplus": _elementwise(
        lambda xp, x: xp.log1p(xp.exp(-xp.abs(x))) + xp.maximum(x, 0),
        lambda xp, x: __import__("jax").nn.softplus(x)),
    "PRelu": _op_prelu,
    "HardSigmoid": (lambda node, x: _xp(x).clip(
        node.attrs.get("alpha", 0.2) * x + node.attrs.get("beta", 0.5), 0, 1)),
    "Min": (lambda node, *xs: _xp(*xs).minimum(*xs) if len(xs) == 2 else
            __import__("functools").reduce(_xp(*xs).minimum, xs)),
    "Max": (lambda node, *xs: _xp(*xs).maximum(*xs) if len(xs) == 2 else
            __import__("functools").reduce(_xp(*xs).maximum, xs)),
    "Mod": _op_mod,
    "Equal": _elementwise(lambda xp, a, b: xp.equal(a, b)),
    "Greater": _elementwise(lambda xp, a, b: xp.greater(a, b)),
    "GreaterOrEqual": _elementwise(lambda xp, a, b: xp.greater_equal(a, b)),
    "Less": _elementwise(lambda xp, a, b: xp.less(a, b)),
    "LessOrEqual": _elementwise(lambda xp, a, b: xp.less_equal(a, b)),
    "And": _elementwise(lambda xp, a, b: xp.logical_and(a, b)),
    "Or": _elementwise(lambda xp, a, b: xp.logical_or(a, b)),
    "Not": _elementwise(lambda xp, x: xp.logical_not(x)),
    "Where": _op_where,
    "Cast": _op_cast, "CastLike": (lambda node, x, y: _xp(x, y).asarray(
        x, np.asarray(y).dtype if _is_np(y) else y.dtype)),
    "Constant": (lambda node: _op_constant(node)),
    "ConstantOfShape": _op_constant_of_shape,
    "Shape": _op_shape, "Size": (lambda node, x: np.asarray(np.size(x), np.int64)),
    "Reshape": _op_reshape, "Transpose": _op_transpose,
    "Unsqueeze": _op_unsqueeze, "Squeeze": _op_squeeze,
    "Concat": _op_concat, "Split": _op_split,
    "Gather": _op_gather, "GatherElements": _op_gather_elements,
    "Slice": _op_slice, "Expand": _op_expand, "Tile": _op_tile,
    "Range": _op_range, "Pad": _op_pad,
    "Identity": _op_identity, "Dropout": (lambda node, x, *r: x),
    "ReduceMean": _reduce("mean"), "ReduceSum": _reduce("sum"),
    "ReduceMax": _reduce("max"), "ReduceMin": _reduce("min"),
    "ReduceProd": _reduce("prod"), "ReduceL2": _reduce("l2"),
    "ArgMax": _op_argmax, "ArgMin": _op_argmin, "Clip": _op_clip,
    "MatMul": _op_matmul, "Gemm": _op_gemm, "Einsum": _op_einsum,
    "Conv": _op_conv, "ConvTranspose": _op_conv_transpose,
    "AveragePool": _pool("avg"), "MaxPool": _pool("max"),
    "GlobalAveragePool": _op_global_average_pool,
    "LayerNormalization": _op_layer_norm,
    "BatchNormalization": _op_batch_norm,
    "InstanceNormalization": _op_instance_norm,
    "Softmax": _op_softmax,
    "Resize": _op_resize, "TopK": _op_topk, "CumSum": _op_cumsum,
}


def supported_ops() -> List[str]:
    return sorted(_OPS)
