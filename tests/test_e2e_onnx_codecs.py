"""End-to-end pipeline over TRANSPILED ONNX codecs: a codec directory is
populated with real torch.onnx exports (wav2vec2 with the baked hidden-state
mean, BiCodecTokenize/Detokenize with the reference graphs' I/O names), the
pipeline loads them through models/codec_loader, and voice enrollment +
zero-shot cloning run through the HTTP-facing pipeline API — with the
extracted tokens verified integer-exact against the torch reference chain.

This is the offline stand-in for the reference's real codec files: the
load/execute path exercised here is byte-for-byte the one a real
deployment's ONNX exports take (ref src/ref_audio_utilities.rs:927-1297)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402

from torch_bicodec_ref import TorchBiCodec  # noqa: E402
from test_codec_loader import _DetokenizeWrapper, _TokenizeWrapper  # noqa: E402

from rwkv_tts_tpu.config import (  # noqa: E402
    BiCodecConfig,
    EngineConfig,
    RwkvConfig,
    TtsArgs,
)
from rwkv_tts_tpu.audio.io import encode_wav_16bit  # noqa: E402
from rwkv_tts_tpu.models import bicodec, rwkv7, wav2vec2  # noqa: E402
from rwkv_tts_tpu.models.codec_loader import load_bicodec, load_w2v  # noqa: E402
from rwkv_tts_tpu.runtime.pipeline import TtsPipeline  # noqa: E402
from rwkv_tts_tpu.runtime.voice_store import VoiceStore  # noqa: E402

from torch.onnx._internal.torchscript_exporter import (  # noqa: E402
    onnx_proto_utils as _opu,
)

_opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

W2V_LAYERS = (1, 2, 3)
# real token spaces (semantic 8192, global 4096) so LM-generated ids are
# always in range of the codec embeddings; everything else tiny
BC_CFG = BiCodecConfig.tiny(feat_dim=24)


class _W2VExport(nn.Module):
    """The reference's wav2vec2 export contract: [1, N] z-normalized
    waveform → [1, T, D] features with the hidden-state mean baked in."""

    def __init__(self, hf):
        super().__init__()
        self.hf = hf

    def forward(self, input):
        out = self.hf(input, output_hidden_states=True)
        hs = out.hidden_states
        acc = hs[W2V_LAYERS[0]]
        for i in W2V_LAYERS[1:]:
            acc = acc + hs[i]
        return acc / len(W2V_LAYERS)


@pytest.fixture(scope="module")
def codec_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("onnx_codecs")
    torch.manual_seed(0)

    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=24, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=48,
        conv_dim=(16,) * 7, conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        do_stable_layer_norm=True, feat_extract_norm="layer",
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
    )
    hf = transformers.Wav2Vec2Model(hf_cfg)
    hf.eval()
    w2v = _W2VExport(hf)

    bc = TorchBiCodec(BC_CFG)
    with torch.no_grad():
        for m in bc.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    bc.eval()

    with torch.no_grad():
        torch.onnx.export(
            w2v, (torch.randn(1, 8000),),
            str(d / "wav2vec2-large-xlsr-53.onnx"),
            input_names=["input"], output_names=["output"],
            dynamic_axes={"input": {1: "N"}, "output": {1: "T"}},
            opset_version=17, dynamo=False)
        mel = torch.randn(1, BC_CFG.mel_bins, 301)
        feat = torch.randn(1, 25, BC_CFG.feat_dim)
        torch.onnx.export(
            _TokenizeWrapper(bc), (mel, feat),
            str(d / "BiCodecTokenize.onnx"),
            input_names=["ref_wav_mel", "feat"],
            output_names=["semantic_tokens", "global_tokens"],
            dynamic_axes={"feat": {1: "T"}, "semantic_tokens": {1: "L"}},
            opset_version=17, dynamo=False)
        g = torch.randint(0, BC_CFG.global_codebook, (1, 1, 32))
        s = torch.randint(0, BC_CFG.semantic_codebook, (1, 24))
        torch.onnx.export(
            _DetokenizeWrapper(bc), (g, s),
            str(d / "BiCodecDetokenize.onnx"),
            input_names=["global_tokens", "semantic_tokens"],
            output_names=["wav_rec"],
            dynamic_axes={"semantic_tokens": {1: "S"}, "wav_rec": {1: "W"}},
            opset_version=17, dynamo=False)
    hf.eval()
    bc.eval()
    return d, w2v, bc


@pytest.fixture(scope="module")
def pipeline(codec_dir, tmp_path_factory):
    d, _, _ = codec_dir
    bc_params, bc_cfg = load_bicodec(str(d), BC_CFG)
    w2v_params, w2v_cfg, _ = load_w2v(str(d))
    assert isinstance(bc_params, bicodec.OnnxBiCodec) or isinstance(bc_params, dict)
    assert isinstance(w2v_params, wav2vec2.OnnxWav2Vec2)

    lm_cfg = RwkvConfig(
        n_layer=2, n_embd=128, head_size=64, vocab_size=77923,
        padded_vocab_size=78080, decay_lora=32, a_lora=32, v_lora=16,
        gate_lora=32, dtype="float32", param_dtype="float32",
    )
    return TtsPipeline(
        rwkv7.init_params(lm_cfg, jax.random.PRNGKey(0)), lm_cfg,
        bc_params, bc_cfg, w2v_params, w2v_cfg,
        voice_store=VoiceStore(str(tmp_path_factory.mktemp("raf"))),
        engine_cfg=EngineConfig(prefill_buckets=(32, 64, 128),
                                max_semantic_tokens=12),
        use_pallas=False,
    )


def test_enrollment_tokens_match_torch_chain(codec_dir, pipeline, tmp_path):
    """pipeline.extract_voice_tokens (front end → transpiled wav2vec2 →
    transpiled BiCodecTokenize) must reproduce the torch chain exactly."""
    d, w2v, bc = codec_dir
    rng = np.random.default_rng(0)
    wav = (np.sin(np.linspace(0, 700, 24000)) * 0.4
           + rng.normal(0, 0.05, 24000)).astype(np.float32)
    path = tmp_path / "ref.wav"
    path.write_bytes(encode_wav_16bit(wav, 16000))

    glob, sem, dur = pipeline.extract_voice_tokens(str(path))

    # the torch chain over the same preprocessed audio
    from rwkv_tts_tpu.audio.frontend import load_and_process, \
        zero_mean_unit_variance
    pa = load_and_process(str(path))
    z = zero_mean_unit_variance(pa.wav)
    with torch.no_grad():
        feats = w2v(torch.tensor(np.asarray(z, np.float32))[None])
        want_sem, want_glob = bc.tokenize(
            feats, torch.tensor(np.asarray(pa.ref_mel[None], np.float32)))
    assert sem == [int(t) for t in want_sem[0]]
    assert glob == [int(t) for t in want_glob[0]]


def test_clone_roundtrip_through_onnx_codecs(pipeline, tmp_path):
    """enroll → synthesize with voice_id → audio out, all through the
    transpiled graphs (the reference's serving composition)."""
    rng = np.random.default_rng(1)
    wav = rng.normal(0, 0.2, 16000).astype(np.float32)
    path = tmp_path / "v.wav"
    path.write_bytes(encode_wav_16bit(wav, 16000))
    feat = pipeline.enroll_voice(str(path), "onnx voice", "prompt")

    res = pipeline.synthesize(TtsArgs(text="clone via onnx", seed=4,
                                      voice_id=feat.id, max_tokens=12))
    assert res.audio.shape == (len(res.semantic_tokens) * 320,)
    assert np.all(np.isfinite(res.audio))
    assert res.global_tokens == feat.global_tokens
