"""Downloader tests via a local file:// endpoint (no network in env)."""

import os

import pytest

from rwkv_tts_tpu.utils.download import (
    MODEL_FILES,
    download_file,
    ensure_models,
    missing_files,
)


def test_missing_files(tmp_path):
    d = str(tmp_path / "model")
    assert set(missing_files(d)) == set(MODEL_FILES)
    os.makedirs(d)
    (tmp_path / "model" / "tokenizer.json").write_text("{}")
    assert "tokenizer.json" not in missing_files(d)


def test_download_via_local_endpoint(tmp_path, monkeypatch):
    # lay out a fake HF repo served over file://
    repo = tmp_path / "hub" / "cgisky" / "rwkv-tts" / "resolve" / "main"
    repo.mkdir(parents=True)
    (repo / "tokenizer.json").write_bytes(b'{"1": "x"}')
    monkeypatch.setenv("HF_ENDPOINT", f"file://{tmp_path}/hub")
    dest = str(tmp_path / "model")
    assert download_file(dest, "tokenizer.json")
    assert (tmp_path / "model" / "tokenizer.json").read_bytes() == b'{"1": "x"}'


def test_ensure_models_soft_failure(tmp_path, monkeypatch):
    # endpoint with nothing in it → every file still missing, no raise
    monkeypatch.setenv("HF_ENDPOINT", f"file://{tmp_path}/empty")
    still = ensure_models(str(tmp_path / "model"),
                          files=("webrwkv.safetensors",), required=False,
                          timeout=3.0)
    assert still == ["webrwkv.safetensors"]
    with pytest.raises(FileNotFoundError):
        ensure_models(str(tmp_path / "model"),
                      files=("webrwkv.safetensors",), required=True,
                      timeout=3.0)
