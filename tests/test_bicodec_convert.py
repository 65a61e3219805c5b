"""End-to-end BiCodec weight-import parity: a torch reference model (the
SparkTTS module tree, canonical parameter names) is built at tiny dims, its
state_dict converted with models/convert.load_bicodec_weights, and
encode/decode outputs must match the JAX implementation — validating the
converter name map, every transpose, weight-norm folding, and the
composition order (sampling stages, AdaLN conditioning, FSQ flatten)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rwkv_tts_tpu.config import BiCodecConfig  # noqa: E402
from rwkv_tts_tpu.models import bicodec as bc  # noqa: E402
from rwkv_tts_tpu.models.convert import load_bicodec_weights  # noqa: E402

CFG = BiCodecConfig.tiny(feat_dim=24, semantic_codebook=64, mel_bins=16)


from torch_bicodec_ref import TorchBiCodec  # noqa: E402

# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TorchBiCodec(CFG)
    # randomize batchnorm running stats so folding them matters
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    jp = load_bicodec_weights(sd, CFG)
    return tm, jp


def test_decode_parity_torch_vs_jax(models):
    tm, jp = models
    rng = np.random.default_rng(0)
    g = rng.integers(0, CFG.global_codebook, (2, 32))
    s = rng.integers(0, CFG.semantic_codebook, (2, 40))
    want = tm.detokenize(torch.tensor(s), torch.tensor(g)).numpy()
    got = np.asarray(bc.decode(jp, jnp.asarray(g), jnp.asarray(s), CFG))
    assert got.shape == want.shape == (2, 40 * 320)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_encode_parity_torch_vs_jax(models):
    tm, jp = models
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(2, 30, CFG.feat_dim)).astype(np.float32)
    mel = rng.normal(size=(2, CFG.mel_bins, 61)).astype(np.float32)
    want_sem, want_glob = tm.tokenize(torch.tensor(feat), torch.tensor(mel))
    got_sem, got_glob = bc.encode(jp, jnp.asarray(feat), jnp.asarray(mel), CFG)
    np.testing.assert_array_equal(np.asarray(got_sem), want_sem.numpy())
    np.testing.assert_array_equal(np.asarray(got_glob), want_glob.numpy())


def test_weight_norm_folding_in_converter(models):
    tm, jp = models
    # spot-check: the folded wavegen input conv equals g·v/|v|
    sd = tm.state_dict()
    v = sd["decoder.model.0.weight_v"].numpy()
    g = sd["decoder.model.0.weight_g"].numpy()
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    np.testing.assert_allclose(np.asarray(jp["wavegen"]["in_w"]),
                               g * v / norm, rtol=1e-5, atol=1e-6)
