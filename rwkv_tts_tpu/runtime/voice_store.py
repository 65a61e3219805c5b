"""Persisted voice-feature library, drop-in compatible with the reference's
``.raf.json`` format (src/voice_feature_manager.rs).

File format: pretty-printed JSON ``{id, name, prompt_text, created_at,
global_tokens, semantic_tokens, audio_duration, sample_rate, checksum}``
where ``checksum`` = SHA-256 over the same document serialized with
``checksum = ""`` (serde_json::to_vec_pretty semantics — reproduced
byte-exactly by ``json.dumps(indent=2, ensure_ascii=False,
separators=(',', ': '))``; verified against the reference's shipped voices).
A ``voices_metadata.json`` index sits alongside.
"""

from __future__ import annotations

import dataclasses
import datetime
import hashlib
import json
import os
import threading
import uuid
from typing import Dict, List, Optional

_FIELD_ORDER = (
    "id", "name", "prompt_text", "created_at", "global_tokens",
    "semantic_tokens", "audio_duration", "sample_rate", "checksum",
)


@dataclasses.dataclass
class VoiceFeature:
    id: str
    name: str
    prompt_text: str
    created_at: str
    global_tokens: List[int]
    semantic_tokens: List[int]
    audio_duration: float
    sample_rate: int
    checksum: str = ""

    def to_ordered_dict(self) -> Dict:
        d = dataclasses.asdict(self)
        return {k: d[k] for k in _FIELD_ORDER}


def _serialize(doc: Dict) -> str:
    return json.dumps(doc, indent=2, ensure_ascii=False, separators=(",", ": "))


def compute_checksum(feature: VoiceFeature) -> str:
    doc = feature.to_ordered_dict()
    doc["checksum"] = ""
    return hashlib.sha256(_serialize(doc).encode("utf-8")).hexdigest()


class ChecksumError(ValueError):
    pass



def _atomic_write_text(path: str, text: str) -> None:
    """Write-then-rename so readers (this process, or a reference server
    sharing the raf directory) never observe a half-written file."""
    tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, path)


class VoiceStore:
    """Thread-safe voice library with an in-memory cache and hit/miss stats
    (parity: VoiceFeatureManager save/load/list/delete/rename/get_voice_tokens,
    src/voice_feature_manager.rs:169-369)."""

    def __init__(self, raf_dir: str):
        self.raf_dir = raf_dir
        os.makedirs(raf_dir, exist_ok=True)
        self._cache: Dict[str, VoiceFeature] = {}
        self._lock = threading.Lock()
        self.cache_hits = 0
        self.cache_misses = 0

    # -- paths ---------------------------------------------------------------

    def _path(self, voice_id: str) -> str:
        return os.path.join(self.raf_dir, f"{voice_id}.raf.json")

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.raf_dir, "voices_metadata.json")

    # -- core API --------------------------------------------------------------

    def save(self, name: str, prompt_text: str, global_tokens: List[int],
             semantic_tokens: List[int], audio_duration: float,
             sample_rate: int, voice_id: Optional[str] = None) -> VoiceFeature:
        now = datetime.datetime.now(datetime.timezone.utc)
        if voice_id is None:
            voice_id = "voice_{}_{}".format(
                now.strftime("%Y%m%d_%H%M%S"), uuid.uuid4().hex[:8]
            )
        feat = VoiceFeature(
            id=voice_id, name=name, prompt_text=prompt_text,
            created_at=now.strftime("%Y-%m-%dT%H:%M:%S.%f000Z"),
            global_tokens=[int(t) for t in global_tokens],
            semantic_tokens=[int(t) for t in semantic_tokens],
            audio_duration=float(audio_duration), sample_rate=int(sample_rate),
        )
        feat.checksum = compute_checksum(feat)
        blob = _serialize(feat.to_ordered_dict())
        path = self._path(voice_id)
        _atomic_write_text(path, blob)
        with self._lock:
            self._cache[voice_id] = feat
        self._update_metadata()
        return feat

    def load(self, voice_id: str) -> VoiceFeature:
        with self._lock:
            if voice_id in self._cache:
                self.cache_hits += 1
                return self._cache[voice_id]
            self.cache_misses += 1
        path = self._path(voice_id)
        if not os.path.exists(path):
            raise FileNotFoundError(f"voice feature not found: {voice_id}")
        with open(path, "r", encoding="utf-8") as f:
            doc = json.load(f)
        feat = VoiceFeature(**{k: doc[k] for k in _FIELD_ORDER})
        if compute_checksum(feat) != feat.checksum:
            raise ChecksumError(f"voice feature checksum mismatch: {voice_id}")
        with self._lock:
            self._cache[voice_id] = feat
        return feat

    def get_voice_tokens(self, voice_id: str):
        feat = self.load(voice_id)
        return feat.global_tokens, feat.semantic_tokens, feat.prompt_text

    def import_voices(self, src_dir: str, overwrite: bool = False) -> Dict:
        """Bring a reference server's voice library (its ``assets/raf``
        directory of ``*.raf.json`` files — byte-compatible schema +
        SHA-256) into this store. Checksums are verified before copying;
        existing ids are skipped unless ``overwrite``. Returns
        {imported: [...], skipped: [...], failed: {id: reason}}."""
        imported, skipped, failed = [], [], {}
        for fn in sorted(os.listdir(src_dir)):
            if not fn.endswith(".raf.json"):
                continue
            vid = fn[: -len(".raf.json")]
            try:
                with open(os.path.join(src_dir, fn), encoding="utf-8") as f:
                    doc = json.load(f)
                feat = VoiceFeature(**{k: doc[k] for k in _FIELD_ORDER})
                if compute_checksum(feat) != feat.checksum:
                    raise ChecksumError("checksum mismatch")
            except Exception as e:  # noqa: BLE001 — per-file isolation
                failed[vid] = f"{type(e).__name__}: {e}"
                continue
            dest = self._path(feat.id)
            if os.path.exists(dest) and not overwrite:
                skipped.append(feat.id)
                continue
            _atomic_write_text(dest, _serialize(feat.to_ordered_dict()))
            with self._lock:
                self._cache[feat.id] = feat
            imported.append(feat.id)
        if imported:
            self._update_metadata()
        return {"imported": imported, "skipped": skipped, "failed": failed}

    def list(self) -> List[Dict]:
        out = []
        for fn in sorted(os.listdir(self.raf_dir)):
            if not fn.endswith(".raf.json"):
                continue
            vid = fn[: -len(".raf.json")]
            try:
                feat = self.load(vid)
            except (ChecksumError, FileNotFoundError, KeyError,
                    json.JSONDecodeError):
                continue
            path = self._path(vid)
            out.append({
                # the reference's VoiceMetadata fields
                # (voice_feature_manager.rs:40-48), so clients written
                # against its /api/voice-clone/list keep working …
                "id": feat.id, "name": feat.name,
                "prompt_text": feat.prompt_text,
                "created_at": feat.created_at,
                "file_path": path,
                "file_size": os.path.getsize(path),
                "checksum": feat.checksum,
                # … plus extras this store can answer cheaply
                "audio_duration": feat.audio_duration,
                "sample_rate": feat.sample_rate,
                "semantic_token_count": len(feat.semantic_tokens),
            })
        return out

    def delete(self, voice_id: str) -> bool:
        path = self._path(voice_id)
        with self._lock:
            self._cache.pop(voice_id, None)
        try:
            # no exists-then-remove: two concurrent deletes of the same id
            # would both pass the check and the loser would 500
            os.remove(path)
        except FileNotFoundError:
            return False
        self._update_metadata()
        return True

    def rename(self, voice_id: str, new_name: str) -> VoiceFeature:
        feat = self.load(voice_id)
        feat = dataclasses.replace(feat, name=new_name, checksum="")
        feat.checksum = compute_checksum(feat)
        _atomic_write_text(self._path(voice_id),
                           _serialize(feat.to_ordered_dict()))
        with self._lock:
            self._cache[voice_id] = feat
        self._update_metadata()
        return feat

    def stats(self) -> Dict:
        with self._lock:
            return {
                "cache_hits": self.cache_hits,
                "cache_misses": self.cache_misses,
                "cached": len(self._cache),
            }

    # -- metadata index ----------------------------------------------------------

    def _update_metadata(self) -> None:
        # under the lock: concurrent save/delete/rename each rebuild the
        # index; without serialization two writers interleave on the same
        # path (atomic replace alone still loses one update's view)
        with self._lock:
            self._update_metadata_locked()

    def _update_metadata_locked(self) -> None:
        voices = []
        for fn in sorted(os.listdir(self.raf_dir)):
            if not fn.endswith(".raf.json"):
                continue
            path = os.path.join(self.raf_dir, fn)
            try:
                with open(path, "r", encoding="utf-8") as f:
                    doc = json.load(f)
                voices.append({
                    "id": doc["id"], "name": doc["name"],
                    "prompt_text": doc["prompt_text"],
                    "created_at": doc["created_at"],
                    "file_path": path,
                    "file_size": os.path.getsize(path),
                    "checksum": doc["checksum"],
                })
            except (KeyError, json.JSONDecodeError, OSError):
                continue
        _atomic_write_text(
            self._meta_path,
            json.dumps({"voices": voices}, ensure_ascii=False, indent=2))


# --------------------------------------------------------------------------
# Compact binary voice format (.raf) — analog of the reference's older
# bincode-based store (src/voice_feature.rs:103-158). The JSON format above
# is the interchange format; this one is for dense libraries (token arrays
# as raw int32) and round-trips through the same VoiceFeature.
# --------------------------------------------------------------------------

_RAF_MAGIC = b"RAFB"
_RAF_VERSION = 2


def save_binary(feature: VoiceFeature, path: str) -> None:
    import struct as _struct

    import numpy as _np

    def _s(x: str) -> bytes:
        b = x.encode("utf-8")
        return _struct.pack("<I", len(b)) + b

    g = _np.asarray(feature.global_tokens, _np.int32)
    s = _np.asarray(feature.semantic_tokens, _np.int32)
    payload = (
        _s(feature.id) + _s(feature.name) + _s(feature.prompt_text)
        + _s(feature.created_at)
        + _struct.pack("<fI", feature.audio_duration, feature.sample_rate)
        + _struct.pack("<I", g.size) + g.tobytes()
        + _struct.pack("<I", s.size) + s.tobytes()
    )
    digest = hashlib.sha256(payload).digest()
    with open(path, "wb") as f:
        f.write(_RAF_MAGIC + _struct.pack("<I", _RAF_VERSION) + digest + payload)


def load_binary(path: str) -> VoiceFeature:
    import struct as _struct

    import numpy as _np

    with open(path, "rb") as f:
        blob = f.read()
    if blob[:4] != _RAF_MAGIC:
        raise ValueError("not a binary .raf file")
    (version,) = _struct.unpack_from("<I", blob, 4)
    if version != _RAF_VERSION:
        raise ValueError(f"unsupported .raf version {version}")
    digest, payload = blob[8:40], blob[40:]
    if hashlib.sha256(payload).digest() != digest:
        raise ChecksumError(f"binary voice file corrupted: {path}")

    pos = 0

    def _s():
        nonlocal pos
        (n,) = _struct.unpack_from("<I", payload, pos)
        pos += 4
        out = payload[pos:pos + n].decode("utf-8")
        pos += n
        return out

    vid, name, prompt, created = _s(), _s(), _s(), _s()
    duration, sr = _struct.unpack_from("<fI", payload, pos)
    pos += 8
    (ng,) = _struct.unpack_from("<I", payload, pos); pos += 4
    g = _np.frombuffer(payload, _np.int32, ng, pos).tolist(); pos += 4 * ng
    (ns,) = _struct.unpack_from("<I", payload, pos); pos += 4
    s = _np.frombuffer(payload, _np.int32, ns, pos).tolist()
    feat = VoiceFeature(id=vid, name=name, prompt_text=prompt,
                        created_at=created, global_tokens=g,
                        semantic_tokens=s, audio_duration=duration,
                        sample_rate=sr)
    feat.checksum = compute_checksum(feat)
    return feat
