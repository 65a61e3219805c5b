"""tools/validate_real_assets.py proven end to end on miniature assets.

The real five published files are unreachable here (no egress), so the
first-contact validation script is itself validated: a complete asset
directory is synthesized — a real-layout ``webrwkv.safetensors`` (full
77,923-token vocab), the canonical ``tokenizer.json``, and genuine
torch.onnx codec exports with the reference graphs' I/O contracts — and
the script must run every stage to ALL STAGES PASSED on it.
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def asset_dir(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_convert import make_rwkv7_checkpoint, write_safetensors
    from test_e2e_onnx_codecs import codec_dir as _unused  # noqa: F401

    d = tmp_path_factory.mktemp("real_assets")
    # LM: tiny layers, REAL vocab size so property/text/token ids resolve
    write_safetensors(
        str(d / "webrwkv.safetensors"),
        make_rwkv7_checkpoint(L=2, C=128, H=2, N=64, V=77923))
    shutil.copy(os.path.join(REPO, "assets/model/tokenizer.json"),
                d / "tokenizer.json")

    # codec exports: reuse the e2e fixture's export recipe via pytest's
    # fixture machinery is awkward across modules — export directly here
    import torch.nn as nn
    from torch_bicodec_ref import TorchBiCodec
    from test_codec_loader import _DetokenizeWrapper, _TokenizeWrapper
    from test_e2e_onnx_codecs import BC_CFG, W2V_LAYERS, _W2VExport
    from torch.onnx._internal.torchscript_exporter import (
        onnx_proto_utils as _opu,
    )
    _opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

    torch.manual_seed(0)
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=24, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=48,
        conv_dim=(16,) * 7, conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        do_stable_layer_norm=True, feat_extract_norm="layer",
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0)
    hf = transformers.Wav2Vec2Model(hf_cfg)
    hf.eval()
    bc = TorchBiCodec(BC_CFG)
    with torch.no_grad():
        for m in bc.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    bc.eval()
    with torch.no_grad():
        torch.onnx.export(
            _W2VExport(hf), (torch.randn(1, 8000),),
            str(d / "wav2vec2-large-xlsr-53.onnx"),
            input_names=["input"], output_names=["output"],
            dynamic_axes={"input": {1: "N"}, "output": {1: "T"}},
            opset_version=17, dynamo=False)
        torch.onnx.export(
            _TokenizeWrapper(bc),
            (torch.randn(1, BC_CFG.mel_bins, 301),
             torch.randn(1, 25, BC_CFG.feat_dim)),
            str(d / "BiCodecTokenize.onnx"),
            input_names=["ref_wav_mel", "feat"],
            output_names=["semantic_tokens", "global_tokens"],
            dynamic_axes={"feat": {1: "T"}, "semantic_tokens": {1: "L"}},
            opset_version=17, dynamo=False)
        torch.onnx.export(
            _DetokenizeWrapper(bc),
            (torch.randint(0, BC_CFG.global_codebook, (1, 1, 32)),
             torch.randint(0, BC_CFG.semantic_codebook, (1, 24))),
            str(d / "BiCodecDetokenize.onnx"),
            input_names=["global_tokens", "semantic_tokens"],
            output_names=["wav_rec"],
            dynamic_axes={"semantic_tokens": {1: "S"}, "wav_rec": {1: "W"}},
            opset_version=17, dynamo=False)
    return str(d)


def test_validation_script_all_stages_pass(asset_dir, tmp_path):
    raf = tmp_path / "raf"
    shutil.copytree(os.path.join(REPO, "assets/raf"), raf)
    out = tmp_path / "out"
    # RWKV_TTS_PLATFORM (not JAX_PLATFORMS): sitecustomize re-pins the
    # plain env var to the TPU tunnel on this host — the first run of this
    # test silently compiled everything REMOTELY and took 14 minutes
    env = dict(os.environ, RWKV_TTS_PLATFORM="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/validate_real_assets.py"),
         "--model-dir", asset_dir, "--raf-dir", str(raf), "--no-download",
         "--out", str(out), "--quant-type", "int8", "--max-tokens", "16"],
        # ceiling ≥3× the ~767 s idle runtime: the shared single-core VM
        # inflates this subprocess under suite contention (r2 full-run
        # flake); a generous ceiling only matters when genuinely hung
        capture_output=True, text=True, cwd=REPO, env=env,
        timeout=3000)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ALL STAGES PASSED" in r.stdout
    report = json.loads((out / "report.json").read_text())
    assert all(v["ok"] for v in report.values()), report
    # the shape-class stage must have flagged the non-flagship test shape
    assert report["lm_shape_class"]["matches_pinned_flagship"] is False
    # r5 stages: the quantified cached-speaker A/B and the production-
    # engine replays ran and produced their metrics
    assert 0.0 <= report["cached_speaker_ab"]["speaker_token_overlap"] <= 1.0
    assert report["continuous_replay"]["mismatched_seeds"] == []
    devs = report["streaming_replay"]["max_abs_dev"]
    assert set(devs) == {"exact", "low", "ultra", "flash"}
    assert devs["exact"] <= 1e-3
    # artifacts: playable WAVs were produced
    from rwkv_tts_tpu.audio.io import read_wav_file
    wav, sr, ch = read_wav_file(str(out / "normal_seed42.wav"))
    assert sr == 16000 and ch == 1 and np.isfinite(wav).all()


def test_validation_script_quick_preset(asset_dir, tmp_path):
    """--quick (r5): the first-minutes-on-real-hardware preset — presence
    + header + load + one 8-token decode + one vocode, then stop."""
    raf = tmp_path / "raf"
    shutil.copytree(os.path.join(REPO, "assets/raf"), raf)
    out = tmp_path / "out_quick"
    env = dict(os.environ, RWKV_TTS_PLATFORM="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/validate_real_assets.py"),
         "--model-dir", asset_dir, "--raf-dir", str(raf), "--no-download",
         "--out", str(out), "--quick"],
        capture_output=True, text=True, cwd=REPO, env=env,
        timeout=1800)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "QUICK PRESET PASSED" in r.stdout
    report = json.loads((out / "report.json").read_text())
    assert report["normal_synth"]["ok"]
    # the quick preset STOPS after the first decode+vocode
    assert "parity_capture" not in report
    assert "continuous_replay" not in report
