"""RWKV "world" byte-trie tokenizer over the unified TTS vocabulary.

Loads the reference's ``tokenizer.json`` (a JSON object mapping decimal id
strings to token strings; 77,922 entries, ids 1..77922; reference
``assets/model/tokenizer.json``, consumed by web-rwkv's ``Tokenizer`` in
``src/shared_runtime.rs``) and performs greedy longest-match encoding over
UTF-8 bytes, identical in behavior to the reference server for all valid
UTF-8 input.

Byte-semantics note: the JSON format cannot represent raw (non-UTF-8) byte
tokens unambiguously — e.g. id 12421 (raw byte ``0x80``) and id 14715 (text
``U+0080``) serialize to the same JSON string.  Like the reference runtime we
resolve every value with UTF-8 encoding; on duplicate byte sequences the
highest id wins (JSON insertion order), which matches hash-map overwrite
semantics in the reference stack.  Raw-byte tokens are unreachable from valid
UTF-8 input either way.

The canonical ``rwkv_vocab_*.txt`` format (lines of ``id 'repr' byte_len``,
where raw-byte entries use ``b'..'`` literals) is also supported and is
unambiguous; prefer it when available.
"""

from __future__ import annotations

import ast
import json
import os
from typing import Dict, Iterable, List


class _TrieNode:
    __slots__ = ("children", "token_id")

    def __init__(self):
        self.children: Dict[int, _TrieNode] = {}
        self.token_id: int = -1


class RwkvTokenizer:
    """Greedy longest-match byte trie tokenizer.

    Parameters
    ----------
    id_to_bytes:
        Mapping of token id -> byte sequence.
    """

    def __init__(self, id_to_bytes: Dict[int, bytes], native: bool = True):
        self._id_to_bytes = dict(id_to_bytes)
        self._root = _TrieNode()
        # Ascending id order: later (higher) ids overwrite on duplicates.
        for tid in sorted(self._id_to_bytes):
            bs = self._id_to_bytes[tid]
            if not bs:
                continue
            node = self._root
            for b in bs:
                nxt = node.children.get(b)
                if nxt is None:
                    nxt = _TrieNode()
                    node.children[b] = nxt
                node = nxt
            node.token_id = tid
        # optional native (C++) trie for the hot encode loop; the Python
        # trie above stays as fallback and decode source
        self._native = None
        if native:
            try:
                from ..utils.native import NativeTrie
                self._native = NativeTrie(self._id_to_bytes)
            except Exception:  # noqa: BLE001 — toolchain absent etc.
                self._native = None

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_json(cls, path: str | os.PathLike) -> "RwkvTokenizer":
        """Load from the reference's tokenizer.json (id -> string)."""
        with open(path, "r", encoding="utf-8") as f:
            raw = json.load(f)
        id_to_bytes = {int(k): v.encode("utf-8") for k, v in raw.items()}
        return cls(id_to_bytes)

    @classmethod
    def from_vocab_txt(cls, path: str | os.PathLike) -> "RwkvTokenizer":
        """Load from the canonical ``id 'repr' len`` vocab text format."""
        id_to_bytes: Dict[int, bytes] = {}
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                sp = line.index(" ")
                tid = int(line[:sp])
                rest = line[sp + 1 :]
                rsp = rest.rindex(" ")
                literal, blen = rest[:rsp], int(rest[rsp + 1 :])
                val = ast.literal_eval(literal)
                bs = val.encode("utf-8") if isinstance(val, str) else bytes(val)
                if len(bs) != blen:
                    raise ValueError(
                        f"vocab line for id {tid}: byte length {len(bs)} != declared {blen}"
                    )
                id_to_bytes[tid] = bs
        return cls(id_to_bytes)

    @classmethod
    def from_file(cls, path: str | os.PathLike) -> "RwkvTokenizer":
        p = str(path)
        if p.endswith(".json"):
            return cls.from_json(p)
        return cls.from_vocab_txt(p)

    # -- core API -----------------------------------------------------------

    @property
    def vocab_size(self) -> int:
        """Number of ids including the reserved id 0."""
        return max(self._id_to_bytes) + 1

    def encode(self, text: str) -> List[int]:
        """Greedy longest-match encode of UTF-8 text to token ids."""
        return self.encode_bytes(text.encode("utf-8"))

    def encode_bytes(self, data: bytes) -> List[int]:
        if self._native is not None:
            return self._native.encode_bytes(data)
        return self._encode_bytes_py(data)

    def _encode_bytes_py(self, data: bytes) -> List[int]:
        out: List[int] = []
        i, n = 0, len(data)
        root = self._root
        while i < n:
            node = root
            best_id, best_len = -1, 0
            j = i
            while j < n:
                node = node.children.get(data[j])
                if node is None:
                    break
                j += 1
                if node.token_id >= 0:
                    best_id, best_len = node.token_id, j - i
            if best_id < 0:
                # Unknown byte: cannot be represented (all 256 single bytes
                # exist in the world vocab, so this only fires on a truncated
                # vocab). Skip the byte to stay total.
                i += 1
                continue
            out.append(best_id)
            i += best_len
        return out

    def decode(self, ids: Iterable[int]) -> str:
        return self.decode_bytes(ids).decode("utf-8", errors="replace")

    def decode_bytes(self, ids: Iterable[int]) -> bytes:
        parts = []
        for tid in ids:
            bs = self._id_to_bytes.get(int(tid))
            if bs:
                parts.append(bs)
        return b"".join(parts)

    def token_bytes(self, tid: int) -> bytes:
        return self._id_to_bytes.get(int(tid), b"")


# Prefer the canonical txt vocab: it is byte-exact (raw-byte tokens survive),
# so arbitrary UTF-8 — emoji included — always has an encoding path. The JSON
# form loses 256 raw-byte tokens to duplicate-string clobbering (see module
# docstring) and is kept as a fallback for drop-in reference compatibility.
_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets", "model")
_DEFAULT_PATHS = (
    os.path.join(_ASSET_DIR, "vocab_canonical.txt"),
    os.path.join(_ASSET_DIR, "tokenizer.json"),
    "/root/reference/assets/model/tokenizer.json",
)

_cached: Dict[str, RwkvTokenizer] = {}


def load_tokenizer(path: str | None = None) -> RwkvTokenizer:
    """Load (and cache) the unified TTS tokenizer."""
    if path is None:
        for cand in _DEFAULT_PATHS:
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(
                "tokenizer.json not found; pass an explicit path"
            )
    path = os.path.abspath(path)
    tok = _cached.get(path)
    if tok is None:
        tok = RwkvTokenizer.from_file(path)
        _cached[path] = tok
    return tok


_SPCT_MARKER = None  # compiled lazily (re imported here only)


def encode_with_spct(tokenizer: RwkvTokenizer, text: str) -> List[int]:
    """Encode text with pronunciation-hotfix markup expanded.

    The published model supports runtime pronunciation fixes via literal
    ``SPCT_48<word>SPCT_49<ipa-or-pinyin>SPCT_50`` markup (no spaces
    around the markers), mapping each ``SPCT_n`` to the control token
    ``<|spct_n|>`` = 77823+n (参考/python/README.md:55 — the Python
    sibling implements it; the Rust server never wired it, so text
    containing these markers is where this framework deliberately goes
    BEYOND the reference server: without markers the encoding is
    bit-identical). Only well-formed 48/49/50 triples expand; a lone
    ``SPCT_n`` in ordinary text (or a malformed/partial triple) passes
    through as plain text, so ids like ``SPCT_100`` or stray markers
    can never silently become property-range control tokens."""
    global _SPCT_MARKER
    if _SPCT_MARKER is None:
        import re
        _SPCT_MARKER = re.compile(
            r"SPCT_48(?!\d)(.*?)SPCT_49(?!\d)(.*?)SPCT_50(?!\d)", re.S)
    from .. import constants as C

    off = C.TTS_SPECIAL_TOKEN_OFFSET
    out: List[int] = []
    pos = 0
    for m in _SPCT_MARKER.finditer(text):
        if m.start() > pos:
            out.extend(tokenizer.encode(text[pos:m.start()]))
        out.append(off + 48)
        out.extend(tokenizer.encode(m.group(1)))
        out.append(off + 49)
        out.extend(tokenizer.encode(m.group(2)))
        out.append(off + 50)
        pos = m.end()
    out.extend(tokenizer.encode(text[pos:]))
    return out


def normalize_text(text: str) -> str:
    """Whitespace cleanup ahead of encoding (parity with the reference's
    FeatureExtractor::preprocess_text, src/feature_extractor.rs:59-75):
    trim, newlines/tabs → spaces, collapse runs of spaces."""
    out = text.strip().replace("\n", " ").replace("\t", " ")
    while "  " in out:
        out = out.replace("  ", " ")
    return out


class CachedEncoder:
    """Text→tokens LRU cache keyed by the raw text (parity with the
    reference's FeatureExtractor cache, src/feature_extractor.rs:35-56).
    Thread-safe via functools.lru_cache's internal lock."""

    def __init__(self, tokenizer: RwkvTokenizer, maxsize: int = 1024,
                 normalize: bool = True, spct: bool = True):
        """``spct``: expand SPCT_n pronunciation-hotfix markers
        (:func:`encode_with_spct`); text without markers encodes
        bit-identically either way."""
        import functools

        self._tok = tokenizer
        self._normalize = normalize

        @functools.lru_cache(maxsize=maxsize)
        def _encode(text: str):
            if normalize:
                text = normalize_text(text)
            if spct and "SPCT_" in text:
                return tuple(encode_with_spct(tokenizer, text))
            return tuple(tokenizer.encode(text))

        self._encode = _encode

    def encode(self, text: str):
        return list(self._encode(text))

    def cache_info(self):
        return self._encode.cache_info()
