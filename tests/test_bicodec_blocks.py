"""Block-level numeric parity of the BiCodec JAX modules vs torch
reference semantics (same weights both sides).

The real BiCodec ONNX exports are not present in this offline environment;
these tests pin each building block of models/bicodec.py to the exact
torch-op semantics the SparkTTS modules are built from (weight-normed
convs, (k−s)//2-padded transposed convs, snake, res2net splits, AdaLN,
attentive-stat pooling, FSQ bound/round formulas), so that a weight import
via models/convert.load_bicodec_weights reproduces the torch graph
numerically. End-to-end ground truth with real files is the transpiled
ONNX path (models/onnx_graph.py), tested separately."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from rwkv_tts_tpu.models import bicodec as bc  # noqa: E402

RTOL, ATOL = 1e-4, 1e-5


def t2n(t):
    return t.detach().numpy()


def test_tconv_matches_torch_all_stages():
    torch.manual_seed(0)
    for k, s in [(16, 8), (11, 5), (8, 4), (4, 2)]:
        m = nn.ConvTranspose1d(6, 4, k, stride=s, padding=(k - s) // 2)
        x = torch.randn(2, 6, 13)
        with torch.no_grad():
            want = m(x)
        got = bc._tconv1d(jnp.asarray(t2n(x)), jnp.asarray(t2n(m.weight)),
                          jnp.asarray(t2n(m.bias)), stride=s,
                          padding=(k - s) // 2)
        assert got.shape == tuple(want.shape) == (2, 4, 13 * s)
        np.testing.assert_allclose(np.asarray(got), t2n(want), RTOL, ATOL)


def test_snake_matches_dac_formula():
    torch.manual_seed(1)
    alpha = torch.rand(5) + 0.1
    x = torch.randn(2, 5, 17)
    want = x + (alpha.view(1, 5, 1) + 1e-9).reciprocal() \
        * torch.sin(alpha.view(1, 5, 1) * x).pow(2)
    got = bc._snake(jnp.asarray(t2n(x)), jnp.asarray(t2n(alpha)))
    np.testing.assert_allclose(np.asarray(got), t2n(want), RTOL, ATOL)


def test_residual_unit_matches_torch():
    torch.manual_seed(2)
    dim, dil = 8, 3
    c1 = nn.Conv1d(dim, dim, 7, dilation=dil, padding=(7 - 1) * dil // 2)
    c2 = nn.Conv1d(dim, dim, 1)
    a1 = torch.rand(dim) + 0.1
    a2 = torch.rand(dim) + 0.1

    def snake(x, a):
        a = a.view(1, -1, 1)
        return x + (a + 1e-9).reciprocal() * torch.sin(a * x).pow(2)

    x = torch.randn(2, dim, 21)
    with torch.no_grad():
        want = x + c2(snake(c1(snake(x, a1)), a2))
    p = {"alpha1": jnp.asarray(t2n(a1)),
         "w1": jnp.asarray(t2n(c1.weight)), "b1": jnp.asarray(t2n(c1.bias)),
         "alpha2": jnp.asarray(t2n(a2)),
         "w2": jnp.asarray(t2n(c2.weight)), "b2": jnp.asarray(t2n(c2.bias))}
    got = bc._residual_unit(p, jnp.asarray(t2n(x)), dil)
    np.testing.assert_allclose(np.asarray(got), t2n(want), RTOL, ATOL)


class TorchConvNeXt(nn.Module):
    """The Vocos ConvNeXtBlock (dwconv k7 → LN → pw → GELU → pw → γ)."""

    def __init__(self, dim, inter, gamma_init):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pw1 = nn.Linear(dim, inter)
        self.pw2 = nn.Linear(inter, dim)
        self.gamma = nn.Parameter(gamma_init * torch.ones(dim))

    def forward(self, x):            # x [B, T, D]
        res = x
        h = self.dwconv(x.transpose(1, 2)).transpose(1, 2)
        h = self.norm(h)
        h = self.pw2(F.gelu(self.pw1(h)))
        return res + self.gamma * h


def cnx_params(m):
    return {
        "dw_w": jnp.asarray(t2n(m.dwconv.weight)),
        "dw_b": jnp.asarray(t2n(m.dwconv.bias)),
        "norm_w": jnp.asarray(t2n(m.norm.weight)),
        "norm_b": jnp.asarray(t2n(m.norm.bias)),
        "pw1_w": jnp.asarray(t2n(m.pw1.weight).T),
        "pw1_b": jnp.asarray(t2n(m.pw1.bias)),
        "pw2_w": jnp.asarray(t2n(m.pw2.weight).T),
        "pw2_b": jnp.asarray(t2n(m.pw2.bias)),
        "gamma": jnp.asarray(t2n(m.gamma)),
    }


def test_convnext_block_matches_torch():
    torch.manual_seed(3)
    m = TorchConvNeXt(12, 24, 1 / 4)
    x = torch.randn(2, 9, 12)
    with torch.no_grad():
        want = m(x)
    got = bc._convnext_block(cnx_params(m), jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), t2n(want), RTOL, ATOL)


def test_ada_layer_norm_matches_torch():
    torch.manual_seed(4)
    cond_dim, dim = 10, 6
    scale = nn.Linear(cond_dim, dim)
    shift = nn.Linear(cond_dim, dim)
    x = torch.randn(2, 5, dim)
    c = torch.randn(2, cond_dim)
    with torch.no_grad():
        want = F.layer_norm(x, (dim,), eps=1e-6) \
            * scale(c).unsqueeze(1) + shift(c).unsqueeze(1)
    p = {"scale_w": jnp.asarray(t2n(scale.weight).T),
         "scale_b": jnp.asarray(t2n(scale.bias)),
         "shift_w": jnp.asarray(t2n(shift.weight).T),
         "shift_b": jnp.asarray(t2n(shift.bias))}
    got = bc._ada_ln(p, jnp.asarray(t2n(x)), jnp.asarray(t2n(c)))
    np.testing.assert_allclose(np.asarray(got), t2n(want), RTOL, ATOL)


def test_res2_block_matches_torch():
    torch.manual_seed(5)
    ch, scale, dil = 16, 4, 2
    width = ch // scale
    convs = [nn.Conv1d(width, width, 3, dilation=dil, padding=dil)
             for _ in range(scale - 1)]
    bns = [nn.BatchNorm1d(width) for _ in range(scale - 1)]
    for b in bns:
        b.eval()
        with torch.no_grad():
            b.running_mean.normal_(0, 0.1)
            b.running_var.uniform_(0.5, 1.5)
            b.weight.normal_(1, 0.1)
            b.bias.normal_(0, 0.1)
    x = torch.randn(2, ch, 11)
    with torch.no_grad():
        parts = torch.split(x, width, 1)
        outs, sp = [], None
        for i, (cv, bn) in enumerate(zip(convs, bns)):
            sp = parts[i] if i == 0 else sp + parts[i]
            sp = bn(F.relu(cv(sp)))
            outs.append(sp)
        outs.append(parts[-1])
        want = torch.cat(outs, 1)
    p = {"convs": [
        {"w": jnp.asarray(t2n(cv.weight)), "b": jnp.asarray(t2n(cv.bias)),
         "bn": {"w": jnp.asarray(t2n(bn.weight)),
                "b": jnp.asarray(t2n(bn.bias)),
                "mean": jnp.asarray(t2n(bn.running_mean)),
                "var": jnp.asarray(t2n(bn.running_var))}}
        for cv, bn in zip(convs, bns)]}
    got = bc._res2_block(p, jnp.asarray(t2n(x)), dil, scale)
    np.testing.assert_allclose(np.asarray(got), t2n(want), RTOL, 1e-4)


def test_fsq_matches_vector_quantize_pytorch_formulas():
    """Reference formulas from the public FSQ (vector-quantize-pytorch):
    bound = tanh(z + atanh(offset/half_l))·half_l − offset, round, /half_w;
    index = Σ digit·∏levels[:i]."""
    levels = (4, 4, 4, 4, 4, 4)
    torch.manual_seed(6)
    z = torch.randn(3, 7, 6) * 2
    eps = 1e-3
    lv = torch.tensor(levels, dtype=torch.float32)
    half_l = (lv - 1) * (1 + eps) / 2
    offset = torch.where(lv % 2 == 0, torch.tensor(0.5), torch.tensor(0.0))
    shift = torch.atanh(offset / half_l)
    bounded = torch.tanh(z + shift) * half_l - offset
    q = torch.round(bounded)
    half_w = torch.tensor(levels) // 2
    want_norm = q / half_w
    digits = q + half_w
    basis = torch.cumprod(torch.tensor((1,) + levels[:-1]), 0)
    want_idx = (digits * basis).sum(-1).long()

    codes, quant = bc.fsq_quantize(jnp.asarray(t2n(z)), levels)
    np.testing.assert_array_equal(np.asarray(codes), want_idx.numpy())
    np.testing.assert_allclose(np.asarray(quant), want_norm.numpy(),
                               RTOL, ATOL)
    deq = bc.fsq_dequantize(codes, levels)
    np.testing.assert_allclose(np.asarray(deq), want_norm.numpy(),
                               RTOL, ATOL)


def test_fvq_matches_torch_l2_normalized_lookup():
    torch.manual_seed(7)
    D, C, K = 10, 4, 20
    in_proj = nn.Conv1d(D, C, 1)
    out_proj = nn.Conv1d(C, D, 1)
    codebook = torch.randn(K, C)
    z = torch.randn(2, D, 9)
    with torch.no_grad():
        ze = in_proj(z)                              # [B, C, T]
        enc = F.normalize(ze.transpose(1, 2).reshape(-1, C))
        cb = F.normalize(codebook)
        dist = (enc.pow(2).sum(1, keepdim=True) - 2 * enc @ cb.t()
                + cb.pow(2).sum(1))
        idx = dist.argmin(1).view(2, 9)
        zq = F.embedding(idx, codebook).transpose(1, 2)   # un-normalized
        want = out_proj(zq)
    p = {"in_w": jnp.asarray(t2n(in_proj.weight)[:, :, 0].T),
         "in_b": jnp.asarray(t2n(in_proj.bias)),
         "codebook": jnp.asarray(t2n(codebook)),
         "out_w": jnp.asarray(t2n(out_proj.weight)[:, :, 0].T),
         "out_b": jnp.asarray(t2n(out_proj.bias))}
    got_idx = bc.fvq_tokenize(p, jnp.asarray(t2n(z)), True)
    np.testing.assert_array_equal(np.asarray(got_idx), idx.numpy())
    got_zq = bc.fvq_detokenize(p, got_idx)
    np.testing.assert_allclose(np.asarray(got_zq), t2n(want), RTOL, ATOL)


def test_astp_embedding_matches_torch():
    torch.manual_seed(8)
    C = 12
    att1 = nn.Conv1d(3 * C, 8, 1)
    att2 = nn.Conv1d(8, C, 1)
    bn = nn.BatchNorm1d(2 * C)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.1)
        bn.running_var.uniform_(0.5, 1.5)
    fc = nn.Linear(2 * C, 5)
    x = torch.randn(2, C, 15)
    with torch.no_grad():
        mean = x.mean(-1, keepdim=True).expand_as(x)
        std = torch.sqrt(x.var(-1, keepdim=True, unbiased=False) + 1e-7
                         ).expand_as(x)
        ctx = torch.cat([x, mean, std], 1)
        a = torch.softmax(att2(torch.tanh(att1(ctx))), dim=2)
        mu = (a * x).sum(2)
        var = (a * x * x).sum(2) - mu ** 2
        stats = torch.cat([mu, torch.sqrt(var.clamp(min=1e-7))], 1)
        want = fc(bn(stats))
    p = {"att1_w": jnp.asarray(t2n(att1.weight)),
         "att1_b": jnp.asarray(t2n(att1.bias)),
         "att2_w": jnp.asarray(t2n(att2.weight)),
         "att2_b": jnp.asarray(t2n(att2.bias)),
         "bn": {"w": jnp.asarray(t2n(bn.weight)),
                "b": jnp.asarray(t2n(bn.bias)),
                "mean": jnp.asarray(t2n(bn.running_mean)),
                "var": jnp.asarray(t2n(bn.running_var))},
         "fc_w": jnp.asarray(t2n(fc.weight).T),
         "fc_b": jnp.asarray(t2n(fc.bias))}
    got = bc.ecapa_embedding(p, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), t2n(want), RTOL, 1e-4)


def test_wave_generator_length_and_range():
    from rwkv_tts_tpu.config import BiCodecConfig
    import jax

    cfg = BiCodecConfig.tiny()
    params = bc.init_params(cfg, jax.random.PRNGKey(0))
    S = 12
    x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.encoder_out, S))
    wav = bc.wave_generator(params["wavegen"], x, cfg)
    assert wav.shape == (1, S * cfg.hop) == (1, S * 320)
    w = np.asarray(wav)
    assert np.all(np.isfinite(w)) and np.max(np.abs(w)) <= 1.0
