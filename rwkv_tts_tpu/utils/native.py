"""Build + bind the native C++ components (ctypes; no pybind11 in env).

``native/rwkv_trie.cpp`` is compiled on demand with g++ into a cached shared
library; every entry point degrades gracefully to the pure-Python
implementation when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import shutil
import struct
import subprocess
import tempfile
import threading
from typing import Dict, Optional

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_CACHE_DIR = os.environ.get(
    "RWKV_TTS_NATIVE_CACHE",
    os.path.join(tempfile.gettempdir(), "rwkv_tts_tpu_native"),
)

_lib_cache: Dict[str, Optional[ctypes.CDLL]] = {}


_build_lock = threading.Lock()


def _build(source: str) -> Optional[ctypes.CDLL]:
    """Compile a .cpp into a cached .so keyed by source hash.

    Serialized by a process-wide lock: two THREADS hitting a cold cache
    concurrently would otherwise share the per-pid temp name, race g++
    onto it, and publish a truncated .so into the content-addressed cache
    — where the exists-check pins the corrupt artifact forever (compiles
    are rare and ~1 s, so the lock costs nothing in steady state)."""
    src_path = os.path.abspath(os.path.join(_NATIVE_DIR, source))
    with _build_lock:
        if src_path in _lib_cache:
            return _lib_cache[src_path]
        lib = None
        try:
            with open(src_path, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            os.makedirs(_CACHE_DIR, exist_ok=True)
            so_path = os.path.join(
                _CACHE_DIR, f"{os.path.splitext(source)[0]}-{digest}.so")
            if not os.path.exists(so_path):
                gxx = shutil.which("g++")
                if gxx is None:
                    raise RuntimeError("g++ not found")
                # unique per-process temp: two concurrent builder
                # PROCESSES (server + CLI) sharing one fixed tmp path
                # could publish a half-written .so that gets cached forever
                tmp = f"{so_path}.tmp.{os.getpid()}"
                try:
                    subprocess.run(
                        [gxx, "-O2", "-std=c++17", "-shared", "-fPIC",
                         "-o", tmp, src_path],
                        check=True, capture_output=True,
                    )
                    os.replace(tmp, so_path)
                finally:
                    if os.path.exists(tmp):
                        os.remove(tmp)
            lib = ctypes.CDLL(so_path)
        except Exception as e:  # noqa: BLE001 — any failure → fallback
            log.info("native %s unavailable (%s); using Python fallback",
                     source, e)
            lib = None
        _lib_cache[src_path] = lib
        return lib


class NativeTrie:
    """ctypes wrapper over native/rwkv_trie.cpp."""

    def __init__(self, id_to_bytes: Dict[int, bytes]):
        lib = _build("rwkv_trie.cpp")
        if lib is None:
            raise RuntimeError("native trie unavailable")
        lib.rwkv_trie_create.restype = ctypes.c_void_p
        lib.rwkv_trie_create.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.rwkv_trie_destroy.argtypes = [ctypes.c_void_p]
        lib.rwkv_trie_encode.restype = ctypes.c_int64
        lib.rwkv_trie_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t,
        ]
        self._lib = lib

        parts = [struct.pack("<I", len(id_to_bytes))]
        for tid in sorted(id_to_bytes):          # ascending: later ids win
            bs = id_to_bytes[tid]
            parts.append(struct.pack("<II", tid, len(bs)))
            parts.append(bs)
        blob = b"".join(parts)
        self._handle = lib.rwkv_trie_create(blob, len(blob))
        if not self._handle:
            raise RuntimeError("native trie construction failed")

    def encode_bytes(self, data: bytes):
        cap = max(16, len(data) + 4)
        out = (ctypes.c_int32 * cap)()
        n = self._lib.rwkv_trie_encode(self._handle, data, len(data), out, cap)
        if n < 0:  # capacity exceeded (cannot happen: ≥1 byte per token)
            raise RuntimeError("native trie output capacity exceeded")
        return list(out[: int(n)])

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.rwkv_trie_destroy(self._handle)
                self._handle = None
        except Exception:  # noqa: BLE001 — interpreter shutdown
            pass
