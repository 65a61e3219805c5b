"""Voice library tests, including byte-exact checksum compatibility with the
reference's shipped .raf.json files."""

import json
import os
import shutil

import pytest

from rwkv_tts_tpu.runtime.voice_store import (
    ChecksumError,
    VoiceFeature,
    VoiceStore,
    compute_checksum,
)

REF_RAF = "/root/reference/assets/raf"


def test_reference_raf_checksum_compatibility():
    """Our checksum must reproduce the reference's for its shipped voices."""
    if not os.path.isdir(REF_RAF):
        pytest.skip("reference raf dir unavailable")
    n = 0
    for fn in os.listdir(REF_RAF):
        if not fn.endswith(".raf.json"):
            continue
        with open(os.path.join(REF_RAF, fn), encoding="utf-8") as f:
            doc = json.load(f)
        feat = VoiceFeature(**doc)
        assert compute_checksum(feat) == doc["checksum"], fn
        n += 1
    assert n >= 2


def test_load_reference_voices(tmp_path):
    if not os.path.isdir(REF_RAF):
        pytest.skip("reference raf dir unavailable")
    d = tmp_path / "raf"
    d.mkdir()
    for fn in os.listdir(REF_RAF):
        if fn.endswith(".raf.json"):
            shutil.copy(os.path.join(REF_RAF, fn), d / fn)
    store = VoiceStore(str(d))
    voices = store.list()
    assert len(voices) == 2
    g, s, prompt = store.get_voice_tokens(voices[0]["id"])
    assert len(g) == 32
    assert len(s) > 0
    assert prompt


def test_roundtrip_crud(tmp_path):
    store = VoiceStore(str(tmp_path / "raf"))
    feat = store.save("测试音色", "你好世界", list(range(32)), [1, 2, 3, 8191],
                      3.5, 16000)
    assert feat.checksum
    loaded = store.load(feat.id)
    assert loaded.global_tokens == list(range(32))
    assert loaded.semantic_tokens == [1, 2, 3, 8191]

    # list + metadata
    assert [v["id"] for v in store.list()] == [feat.id]
    meta = json.load(open(tmp_path / "raf" / "voices_metadata.json"))
    assert meta["voices"][0]["id"] == feat.id

    # rename preserves checksum validity
    store.rename(feat.id, "renamed")
    store2 = VoiceStore(str(tmp_path / "raf"))  # fresh cache → disk read
    assert store2.load(feat.id).name == "renamed"

    # delete
    assert store.delete(feat.id)
    assert store.list() == []
    assert not store.delete(feat.id)


def test_checksum_tamper_detected(tmp_path):
    store = VoiceStore(str(tmp_path / "raf"))
    feat = store.save("v", "p", [1] * 32, [5], 1.0, 16000)
    path = tmp_path / "raf" / f"{feat.id}.raf.json"
    doc = json.load(open(path))
    doc["semantic_tokens"] = [6]
    with open(path, "w") as f:
        json.dump(doc, f)
    store2 = VoiceStore(str(tmp_path / "raf"))
    with pytest.raises(ChecksumError):
        store2.load(feat.id)
    # tampered voice is skipped by list()
    assert store2.list() == []


def test_cache_stats(tmp_path):
    store = VoiceStore(str(tmp_path / "raf"))
    feat = store.save("v", "p", [1] * 32, [5], 1.0, 16000)
    store.load(feat.id)          # hit (cached by save)
    s = store.stats()
    assert s["cache_hits"] >= 1


def test_binary_raf_roundtrip(tmp_path):
    from rwkv_tts_tpu.runtime.voice_store import load_binary, save_binary
    feat = VoiceFeature(
        id="voice_x", name="二进制", prompt_text="binary prompt",
        created_at="2026-08-16T00:00:00.000000000Z",
        global_tokens=list(range(32)), semantic_tokens=[1, 5, 8191],
        audio_duration=2.5, sample_rate=16000,
    )
    p = str(tmp_path / "v.raf")
    save_binary(feat, p)
    back = load_binary(p)
    assert back.global_tokens == feat.global_tokens
    assert back.semantic_tokens == feat.semantic_tokens
    assert back.name == feat.name and back.prompt_text == feat.prompt_text
    # corruption detected
    blob = bytearray(open(p, "rb").read())
    blob[60] ^= 0xFF
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ChecksumError):
        load_binary(p)


def test_import_voices_from_reference_layout(tmp_path):
    """Migration path for reference-server users: a directory of .raf.json
    files imports with checksum verification; corrupt files are isolated."""
    import json

    from rwkv_tts_tpu.runtime.voice_store import VoiceStore

    src = tmp_path / "ref_raf"
    src.mkdir()
    donor = VoiceStore(str(src))
    f1 = donor.save("alice", "hello", list(range(32)), [1, 2, 3], 2.5, 16000)
    f2 = donor.save("bob", "hi", list(range(32)), [4, 5], 1.0, 16000)
    # corrupt a third file
    bad = dict(json.loads(open(donor._path(f1.id)).read()))
    bad["semantic_tokens"] = [9, 9, 9]          # checksum now wrong
    (src / "voice_broken.raf.json").write_text(json.dumps(bad))

    dest = VoiceStore(str(tmp_path / "mine"))
    report = dest.import_voices(str(src))
    assert sorted(report["imported"]) == sorted([f1.id, f2.id])
    assert list(report["failed"]) == ["voice_broken"]
    g, s, p = dest.get_voice_tokens(f1.id)
    assert s == [1, 2, 3] and p == "hello"

    # second run: skipped, not re-imported
    report2 = dest.import_voices(str(src))
    assert sorted(report2["skipped"]) == sorted([f1.id, f2.id])


def test_import_voices_cli(tmp_path, capsys):
    from rwkv_tts_tpu.cli import main
    from rwkv_tts_tpu.runtime.voice_store import VoiceStore

    src = tmp_path / "src"
    src.mkdir()
    VoiceStore(str(src)).save("v", "", list(range(32)), [7], 0.5, 16000)
    rc = main(["--raf-dir", str(tmp_path / "dst"), "import-voices", str(src)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"imported"' in out and VoiceStore(str(tmp_path / "dst")).list()
