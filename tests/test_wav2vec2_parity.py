"""wav2vec2 parity against the REAL HuggingFace module (the reference's
ONNX file is an export of facebook/wav2vec2-large-xlsr-53, the stable-
layer-norm architecture; ref src/ref_audio_utilities.rs:927-973).

A small HF Wav2Vec2Model with the XLSR structural flags is built with
random weights; its state dict must import through
models/convert.load_wav2vec2_weights, and our extract_features must
reproduce the mean of the selected HF hidden states — validating both the
name mapping and the architecture (conv extractor, pos-conv padding,
pre-LN transformer, hidden-state indexing)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from rwkv_tts_tpu.config import Wav2Vec2Config  # noqa: E402
from rwkv_tts_tpu.models import wav2vec2  # noqa: E402
from rwkv_tts_tpu.models.convert import load_wav2vec2_weights  # noqa: E402

LAYERS = (1, 2, 3)


@pytest.fixture(scope="module")
def hf_and_ours():
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32,
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(24, 24, 24, 24, 24, 24, 24),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        do_stable_layer_norm=True, feat_extract_norm="layer",
        conv_bias=True,  # as in the real xlsr-53 export
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(hf_cfg)
    hf.eval()

    cfg = Wav2Vec2Config(
        conv_dims=(24,) * 7, hidden_size=32, num_layers=4, num_heads=2,
        ffn_size=64,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = load_wav2vec2_weights(sd, cfg)
    return hf, params, cfg


def test_feature_parity_vs_hf(hf_and_ours):
    hf, params, cfg = hf_and_ours
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 8000)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(wav), output_hidden_states=True)
    want = np.mean([out.hidden_states[i].numpy() for i in LAYERS], axis=0)

    got = np.asarray(wav2vec2.extract_features(
        params, jnp.asarray(wav), cfg, output_layers=LAYERS))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_downsample_is_320x(hf_and_ours):
    _, params, cfg = hf_and_ours
    wav = jnp.zeros((1, 16000))
    feats = wav2vec2.extract_features(params, wav, cfg, output_layers=LAYERS)
    assert abs(feats.shape[1] - 16000 // 320) <= 2


def test_final_hidden_state_applies_encoder_layer_norm(hf_and_ours):
    """HF's stable-layer-norm encoder applies encoder.layer_norm to the
    LAST hidden state only; selecting it via output_layers must match
    (it used to return the pre-norm activation silently)."""
    hf, params, cfg = hf_and_ours
    rng = np.random.default_rng(1)
    wav = rng.normal(size=(1, 6000)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(wav), output_hidden_states=True)
    want = out.hidden_states[cfg.num_layers].numpy()   # post final LN
    got = np.asarray(wav2vec2.extract_features(
        params, jnp.asarray(wav), cfg, output_layers=(cfg.num_layers,)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
