"""Model-asset verification and auto-download from HuggingFace.

Parity with the reference server's startup check
(bin/server.rs:1074-1198,1306-1351): the five model files are fetched from
the ``cgisky/rwkv-tts`` repo, trying ``HF_ENDPOINT`` (if set) then
huggingface.co then the hf-mirror.com mirror, with a per-file timeout.
Uses stdlib urllib — zero extra dependencies — and fails soft: serving can
start in dev mode without weights.
"""

from __future__ import annotations

import http.client
import logging
import os
import time
import urllib.error
import urllib.request
from typing import List, Sequence

log = logging.getLogger(__name__)

HF_REPO = "cgisky/rwkv-tts"
MODEL_FILES = (
    "webrwkv.safetensors",
    "tokenizer.json",
    "BiCodecTokenize.onnx",
    "BiCodecDetokenize.onnx",
    "wav2vec2-large-xlsr-53.onnx",
)
MIRRORS = ("https://huggingface.co", "https://hf-mirror.com")
TIMEOUT_S = 300.0           # 5-minute per-file timeout (bin/server.rs:1082)


def missing_files(model_dir: str,
                  files: Sequence[str] = MODEL_FILES) -> List[str]:
    return [f for f in files
            if not os.path.exists(os.path.join(model_dir, f))]


def _endpoints() -> List[str]:
    eps = []
    env = os.environ.get("HF_ENDPOINT")
    if env:
        eps.append(env.rstrip("/"))
    eps.extend(m for m in MIRRORS if m not in eps)
    return eps


def download_file(model_dir: str, filename: str,
                  repo: str = HF_REPO,
                  timeout: float = TIMEOUT_S) -> bool:
    """Fetch one file, trying each endpoint; atomic rename on success."""
    os.makedirs(model_dir, exist_ok=True)
    dest = os.path.join(model_dir, filename)
    for ep in _endpoints():
        url = f"{ep}/{repo}/resolve/main/{filename}"
        # per-PROCESS temp name: a fixed dest+".part" shared by concurrent
        # downloaders (server startup + a CLI run) interleaves writes and
        # os.replace can publish a corrupt file
        tmp = f"{dest}.part.{os.getpid()}"
        try:
            log.info("downloading %s from %s", filename, ep)
            req = urllib.request.Request(
                url, headers={"User-Agent": "rwkv-tts-tpu/0.1"})
            deadline = time.monotonic() + timeout
            with urllib.request.urlopen(req, timeout=min(timeout, 60.0)) \
                    as r, open(tmp, "wb") as f:
                # chunked copy under a WHOLE-FILE deadline (the reference's
                # 5-minute per-file timeout, bin/server.rs:1082): urllib's
                # timeout alone is per socket operation, so a trickling
                # server would stall startup indefinitely
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"{filename}: exceeded the {timeout:.0f}s "
                            "whole-file deadline")
                    f.write(chunk)
            os.replace(tmp, dest)
            log.info("downloaded %s (%d bytes)", filename,
                     os.path.getsize(dest))
            return True
        except (urllib.error.URLError, http.client.HTTPException,
                OSError, TimeoutError) as e:
            # HTTPException covers IncompleteRead & co. — mid-body drops
            # must try the next mirror, not crash the fails-soft startup
            log.warning("download of %s from %s failed: %s", filename, ep, e)
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    return False


def ensure_models(model_dir: str,
                  files: Sequence[str] = MODEL_FILES,
                  required: bool = False,
                  timeout: float = TIMEOUT_S) -> List[str]:
    """Download whatever is missing; returns files still missing after.

    required=False (default) logs and continues — the server falls back to
    dev mode; required=True raises on any missing file.
    """
    still = []
    for f in missing_files(model_dir, files):
        if not download_file(model_dir, f, timeout=timeout):
            still.append(f)
    if still:
        msg = ("model files unavailable (no network in this environment?): "
               + ", ".join(still))
        if required:
            raise FileNotFoundError(msg)
        log.warning(msg)
    return still
