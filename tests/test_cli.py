"""CLI surface tests (voice library ops run without any model)."""

import json

from rwkv_tts_tpu.cli import main
from rwkv_tts_tpu.runtime.voice_store import VoiceStore


def test_cli_voices_and_delete(tmp_path, capsys):
    store = VoiceStore(str(tmp_path))
    feat = store.save("cli voice", "prompt", [1] * 32, [5, 6], 1.0, 16000)

    assert main(["--raf-dir", str(tmp_path), "voices"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out[0]["id"] == feat.id

    assert main(["--raf-dir", str(tmp_path), "delete", feat.id]) == 0
    assert json.loads(capsys.readouterr().out) == {"deleted": True}
    assert main(["--raf-dir", str(tmp_path), "delete", feat.id]) == 1
