"""Codec resolution tests: the full load path from a model directory —
native state-dict import, transpiled ONNX graphs (exported from the torch
reference with the REAL graphs' I/O names), cross-validation between the
two, and the loud-failure contract when nothing real exists."""

import io
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from torch_bicodec_ref import TorchBiCodec  # noqa: E402

from rwkv_tts_tpu.config import BiCodecConfig  # noqa: E402
from rwkv_tts_tpu.models import bicodec as bc  # noqa: E402
from rwkv_tts_tpu.models.codec_loader import (  # noqa: E402
    load_bicodec,
    load_codecs,
)

# keep exporter offline-capable (no `onnx` package in this env)
from torch.onnx._internal.torchscript_exporter import (  # noqa: E402
    onnx_proto_utils as _opu,
)

_opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

CFG = BiCodecConfig.tiny(feat_dim=24, semantic_codebook=64, mel_bins=16)


class _TokenizeWrapper(nn.Module):
    """I/O contract of BiCodecTokenize.onnx: (ref_wav_mel [1,128,301],
    feat [1,T,1024]) → semantic_tokens [1,L] + global_tokens [1,1,32]
    (ref_audio_utilities.rs:1109-1256)."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, ref_wav_mel, feat):
        sem, glob = self.m.tokenize(feat, ref_wav_mel)
        return sem, glob.unsqueeze(1)


class _DetokenizeWrapper(nn.Module):
    """I/O contract of BiCodecDetokenize.onnx: (global_tokens [1,1,G] i64,
    semantic_tokens [1,S] i64) → wav_rec (ref_audio_utilities.rs:1281-1296)."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, global_tokens, semantic_tokens):
        return self.m.detokenize(semantic_tokens, global_tokens.squeeze(1))


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchBiCodec(CFG)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm1d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


@pytest.fixture(scope="module")
def model_dir(torch_model, tmp_path_factory):
    """A codec dir holding BOTH the torch state dict and the two ONNX
    exports with the reference's tensor names."""
    d = tmp_path_factory.mktemp("codec")
    torch.save(torch_model.state_dict(), d / "bicodec.pt")

    mel = torch.randn(1, CFG.mel_bins, 61)
    feat = torch.randn(1, 30, CFG.feat_dim)
    with torch.no_grad():
        torch.onnx.export(
            _TokenizeWrapper(torch_model), (mel, feat),
            str(d / "BiCodecTokenize.onnx"),
            input_names=["ref_wav_mel", "feat"],
            output_names=["semantic_tokens", "global_tokens"],
            dynamic_axes={"feat": {1: "T"}, "ref_wav_mel": {2: "F"},
                          "semantic_tokens": {1: "L"}},
            opset_version=17, dynamo=False)
        g = torch.randint(0, CFG.global_codebook, (1, 1, 32))
        s = torch.randint(0, CFG.semantic_codebook, (1, 24))
        torch.onnx.export(
            _DetokenizeWrapper(torch_model), (g, s),
            str(d / "BiCodecDetokenize.onnx"),
            input_names=["global_tokens", "semantic_tokens"],
            output_names=["wav_rec"],
            dynamic_axes={"semantic_tokens": {1: "S"},
                          "wav_rec": {1: "N"}},
            opset_version=17, dynamo=False)
    return d


def test_onnx_graphs_match_torch(torch_model, model_dir):
    torch_model.eval()     # the exporter flips training mode and may not restore
    g = np.random.default_rng(0).integers(0, CFG.global_codebook, (1, 32))
    s = np.random.default_rng(1).integers(0, CFG.semantic_codebook, (1, 40))
    codec = bc.OnnxBiCodec(str(model_dir / "BiCodecTokenize.onnx"),
                           str(model_dir / "BiCodecDetokenize.onnx"))
    with torch.no_grad():
        want = torch_model.detokenize(torch.tensor(s), torch.tensor(g)).numpy()
    got = np.asarray(codec.decode(jnp.asarray(g), jnp.asarray(s)))
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=1e-3, atol=1e-4)

    mel = np.random.default_rng(2).normal(
        size=(1, CFG.mel_bins, 61)).astype(np.float32)
    feat = np.random.default_rng(3).normal(
        size=(1, 30, CFG.feat_dim)).astype(np.float32)
    with torch.no_grad():
        want_sem, want_glob = torch_model.tokenize(
            torch.tensor(feat), torch.tensor(mel))
    sem, glob = codec.encode(jnp.asarray(feat), jnp.asarray(mel))
    np.testing.assert_array_equal(np.asarray(sem), want_sem.numpy())
    np.testing.assert_array_equal(np.asarray(glob), want_glob.numpy())


def test_load_bicodec_prefers_validated_native(model_dir, caplog):
    import logging

    with caplog.at_level(logging.INFO, "rwkv_tts_tpu.models.codec_loader"):
        params, cfg = load_bicodec(str(model_dir), CFG)
    # state dict + graphs both present, parity holds → native fast path
    assert not isinstance(params, bc.OnnxBiCodec)
    assert isinstance(params, dict) and "wavegen" in params
    assert any("matches the ONNX graphs" in r.message for r in caplog.records)


def test_load_bicodec_onnx_only(model_dir, tmp_path):
    only = tmp_path / "onnx_only"
    only.mkdir()
    for f in ("BiCodecTokenize.onnx", "BiCodecDetokenize.onnx"):
        (only / f).write_bytes((model_dir / f).read_bytes())
    params, cfg = load_bicodec(str(only), CFG)
    assert isinstance(params, bc.OnnxBiCodec)


def test_corrupt_state_dict_falls_back_to_onnx(model_dir, tmp_path, caplog):
    """A truncated/corrupt optional state dict must not kill startup when
    valid ONNX exports sit in the same directory — the loader logs and
    serves the transpiled graphs."""
    import logging

    d = tmp_path / "corrupt_sd"
    d.mkdir()
    for f in ("BiCodecTokenize.onnx", "BiCodecDetokenize.onnx"):
        (d / f).write_bytes((model_dir / f).read_bytes())
    (d / "BiCodec.safetensors").write_bytes(b"\x00garbage not safetensors")
    with caplog.at_level(logging.WARNING, "rwkv_tts_tpu.models.codec_loader"):
        params, cfg = load_bicodec(str(d), CFG)
    assert isinstance(params, bc.OnnxBiCodec)
    assert any("failed to import" in r.message for r in caplog.records)


def test_missing_codec_raises_or_warns(tmp_path, caplog):
    import logging

    with pytest.raises(FileNotFoundError, match="noise, not speech"):
        load_codecs(str(tmp_path))
    with caplog.at_level(logging.ERROR, "rwkv_tts_tpu.models.codec_loader"):
        bc_p, bc_cfg, w2v_p, w2v_cfg, layers = load_codecs(
            str(tmp_path), allow_random=True)
    assert bc_p is not None and w2v_p is not None
    assert any("RANDOM codec weights" in r.message for r in caplog.records)


def test_onnx_decode_normalizes_3d_wav_rec(model_dir, torch_model, tmp_path):
    """The exported wav_rec rank is unconstrained (the C++ sibling
    flattens whatever comes out, sparktts.cpp:267). An export that keeps
    a size-1 channel axis must still yield [B, W] from OnnxBiCodec.decode
    — downstream detokenize/streaming slice [:, :S*hop] and a silent
    [1, 1, W] would slice the channel axis instead."""

    class _Detok3D(nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, global_tokens, semantic_tokens):
            return self.m.detokenize(
                semantic_tokens, global_tokens.squeeze(1)).unsqueeze(1)

    g = torch.randint(0, CFG.global_codebook, (1, 1, 32))
    s = torch.randint(0, CFG.semantic_codebook, (1, 24))
    with torch.no_grad():
        torch.onnx.export(
            _Detok3D(torch_model), (g, s),
            str(tmp_path / "BiCodecDetokenize.onnx"),
            input_names=["global_tokens", "semantic_tokens"],
            output_names=["wav_rec"],
            dynamic_axes={"semantic_tokens": {1: "S"},
                          "wav_rec": {2: "N"}},
            opset_version=17, dynamo=False)
    codec = bc.OnnxBiCodec(None, str(tmp_path / "BiCodecDetokenize.onnx"))
    wav = np.asarray(codec.decode(jnp.asarray(g.squeeze(1).numpy()),
                                  jnp.asarray(s.numpy())))
    assert wav.shape == (1, 24 * 320)
    full = bc.detokenize(codec, list(g[0, 0].numpy()), list(s[0].numpy()),
                         CFG, bucket=16)
    assert full.shape == (1, 24 * 320) and np.all(np.isfinite(full))


def test_detokenize_wrapper_uses_onnx_codec(model_dir, torch_model):
    codec = bc.OnnxBiCodec(str(model_dir / "BiCodecTokenize.onnx"),
                           str(model_dir / "BiCodecDetokenize.onnx"))
    g = list(range(32))
    s = list(np.random.default_rng(4).integers(0, CFG.semantic_codebook, 37))
    wav = bc.detokenize(codec, g, s, CFG, bucket=16)
    assert wav.shape == (1, 37 * 320)
    assert np.all(np.isfinite(wav))
