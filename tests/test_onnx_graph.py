"""ONNX→JAX transpiler tests: every graph here is exported with torch.onnx
and executed with models/onnx_graph.py; outputs must match torch within
fp32 tolerance. The module mix mirrors the op inventory of the three real
codec graphs (conv/tconv stacks, norms, attention, VQ argmin lookups, snake
activations, res2net splits)."""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from rwkv_tts_tpu.models.onnx_graph import OnnxGraph  # noqa: E402

# The legacy torchscript exporter's final step re-serializes the proto with
# the `onnx` package purely to inline custom onnxscript functions; none of
# our exports use any, and `onnx` isn't installed here — make it a no-op.
from torch.onnx._internal.torchscript_exporter import (  # noqa: E402
    onnx_proto_utils as _opu,
)

_opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes


def export_and_run(mod, args, rtol=2e-4, atol=2e-5, dynamic_axes=None,
                   run_args=None, opset=17):
    mod.eval()
    buf = io.BytesIO()
    names = [f"in{i}" for i in range(len(args))]
    with torch.no_grad():
        torch.onnx.export(mod, args, buf, input_names=names,
                          dynamic_axes=dynamic_axes, opset_version=opset,
                          dynamo=False)
    g = OnnxGraph(buf.getvalue())
    run_args = run_args if run_args is not None else args
    with torch.no_grad():
        want = mod(*run_args)
    got = g(*[np.asarray(a) for a in run_args])
    if isinstance(want, (tuple, list)):
        for w, o in zip(want, got):
            np.testing.assert_allclose(np.asarray(o), w.numpy(),
                                       rtol=rtol, atol=atol)
    else:
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=rtol, atol=atol)
    return g


def test_attention_block():
    class Attn(nn.Module):
        def __init__(self, d=32, h=4):
            super().__init__()
            self.h = h
            self.ln = nn.LayerNorm(d)
            self.qkv = nn.Linear(d, 3 * d)
            self.o = nn.Linear(d, d)

        def forward(self, x):
            B, T, D = x.shape
            h = self.ln(x)
            q, k, v = self.qkv(h).chunk(3, -1)
            q = q.view(B, T, self.h, -1).transpose(1, 2)
            k = k.view(B, T, self.h, -1).transpose(1, 2)
            v = v.view(B, T, self.h, -1).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) / (D // self.h) ** 0.5, -1)
            y = (a @ v).transpose(1, 2).reshape(B, T, D)
            return x + self.o(F.gelu(y))

    torch.manual_seed(0)
    export_and_run(Attn(), (torch.randn(2, 7, 32),))


def test_conv_stack_groups_dilation_weightnorm():
    class Convs(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv1d(8, 16, 5, stride=2, padding=2)
            self.dw = nn.Conv1d(16, 16, 7, padding=3, groups=16)
            self.dil = nn.Conv1d(16, 16, 3, padding=4, dilation=4)
            self.wn = nn.utils.weight_norm(nn.Conv1d(16, 8, 1))
            self.bn = nn.BatchNorm1d(8)

        def forward(self, x):
            x = F.leaky_relu(self.c1(x), 0.2)
            x = x + self.dil(F.relu(self.dw(x)))
            x = self.bn(self.wn(x))
            return F.avg_pool1d(x, 2)

    torch.manual_seed(1)
    m = Convs()
    m.eval()
    export_and_run(m, (torch.randn(2, 8, 40),))


def test_conv_transpose_exact_upsample():
    # the WaveGenerator's (kernel, stride, padding=(k-s)//2) combos: exact T·s
    for k, s in [(16, 8), (11, 5), (8, 4), (4, 2)]:
        m = nn.ConvTranspose1d(6, 4, k, stride=s, padding=(k - s) // 2)
        torch.manual_seed(k)
        with torch.no_grad():
            m.weight.normal_(); m.bias.normal_()
        x = torch.randn(1, 6, 9)
        g = export_and_run(m, (x,))
        out = g(np.asarray(x))
        assert np.shape(out)[-1] == 9 * s


def test_conv_transpose_output_padding_groups():
    m = nn.ConvTranspose1d(8, 8, 4, stride=2, padding=2, output_padding=1,
                           groups=2)
    torch.manual_seed(3)
    with torch.no_grad():
        m.weight.normal_(); m.bias.normal_()
    export_and_run(m, (torch.randn(2, 8, 11),))


def test_snake_fsq_vq_ops():
    class SnakeFsqVq(nn.Module):
        def __init__(self):
            super().__init__()
            self.alpha = nn.Parameter(torch.rand(1, 6, 1) + 0.5)
            self.codebook = nn.Parameter(torch.randn(32, 6))

        def forward(self, x):
            # snake: x + sin^2(ax)/a
            x = x + torch.sin(self.alpha * x) ** 2 / self.alpha
            # fsq-ish: bounded round
            q = torch.round(torch.tanh(x) * 3.5 - 0.5)
            q = torch.clamp(q, -4, 3)
            # vq: nearest codebook row over channel dim
            flat = x.transpose(1, 2).reshape(-1, 6)
            d = (flat.pow(2).sum(1, keepdim=True)
                 - 2 * flat @ self.codebook.t()
                 + self.codebook.pow(2).sum(1))
            idx = d.argmin(1)
            zq = F.embedding(idx, self.codebook)
            return q, zq.reshape(x.shape[0], -1, 6).transpose(1, 2)

    torch.manual_seed(4)
    export_and_run(SnakeFsqVq(), (torch.randn(2, 6, 10),))


def test_res2net_split_cat_se():
    class Res2(nn.Module):
        def __init__(self, c=16, scale=4):
            super().__init__()
            w = c // scale
            self.convs = nn.ModuleList(
                [nn.Conv1d(w, w, 3, padding=1) for _ in range(scale - 1)])
            self.se1 = nn.Linear(c, 8)
            self.se2 = nn.Linear(8, c)

        def forward(self, x):
            parts = torch.split(x, 4, dim=1)
            out, sp = [], None
            for i, conv in enumerate(self.convs):
                sp = parts[i] if i == 0 else sp + parts[i]
                sp = conv(sp)
                out.append(sp)
            out.append(parts[-1])
            y = torch.cat(out, dim=1)
            s = torch.sigmoid(self.se2(F.relu(self.se1(y.mean(2)))))
            return y * s.unsqueeze(2)

    torch.manual_seed(5)
    export_and_run(Res2(), (torch.randn(2, 16, 12),))


def test_dynamic_length_reexecution():
    # export with a dynamic time axis, run at a different length than traced
    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.c = nn.Conv1d(4, 4, 3, padding=1)

        def forward(self, x):
            h = self.c(x)
            # shape-dependent math: mean over actual length
            return h / h.shape[-1]

    torch.manual_seed(6)
    m = Net()
    export_and_run(m, (torch.randn(1, 4, 10),),
                   dynamic_axes={"in0": {2: "T"}},
                   run_args=(torch.randn(1, 4, 23),))


def test_interpolate_and_pads():
    class Up(nn.Module):
        def forward(self, x):
            y = F.interpolate(x, scale_factor=2.0, mode="nearest")
            return F.pad(y, (2, 3), mode="reflect")

    export_and_run(Up(), (torch.randn(1, 3, 9),))


def test_jit_compatible():
    import jax

    m = nn.Sequential(nn.Conv1d(4, 8, 3, padding=1), nn.Tanh(),
                      nn.Conv1d(8, 1, 1))
    torch.manual_seed(7)
    m.eval()
    buf = io.BytesIO()
    x = torch.randn(1, 4, 16)
    with torch.no_grad():
        torch.onnx.export(m, (x,), buf, input_names=["x"], opset_version=17,
                          dynamo=False)
        want = m(x).numpy()
    g = OnnxGraph(buf.getvalue())
    jf = jax.jit(lambda a: g(a))
    got = np.asarray(jf(np.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_smallest_topk_ceil_pool_trunc_div_float_range():
    """Ops with silent-wrong failure modes fixed by review: TopK largest=0
    (min-distance selection), MaxPool ceil_mode=1, integer Div truncation
    toward zero, float-dtype Range."""

    class M(nn.Module):
        def forward(self, x, d):
            # smallest-k selection (codebook nearest-neighbor pattern)
            vals, idx = torch.topk(x, 3, largest=False)
            # ceil-mode max pooling on an even length
            p = F.max_pool1d(x.unsqueeze(1), 3, stride=2,
                             ceil_mode=True).squeeze(1)
            # integer division with a negative numerator (C truncation)
            q = (d - 7) / 2  # torch: trunc division on export via Div
            t = torch.arange(0.0, 3.0, 0.5) * torch.ones_like(x[:, :6])
            return vals, idx, p, q.float(), t

    x = torch.randn(2, 10)
    d = torch.tensor([3], dtype=torch.int64)  # (3-7)/2: trunc -2, floor -3
    mod = M().eval()
    buf = io.BytesIO()
    with torch.no_grad():
        torch.onnx.export(mod, (x, d), buf, input_names=["x", "d"],
                          opset_version=17, dynamo=False)
    g = OnnxGraph(buf.getvalue())
    with torch.no_grad():
        want = mod(x, d)
    got = g(np.asarray(x), np.asarray(d))
    for w, o in zip(want, got):
        np.testing.assert_allclose(np.asarray(o, np.float64),
                                   w.numpy().astype(np.float64),
                                   rtol=1e-5, atol=1e-6)
