"""Native C++ trie: build, parity with the Python trie, speed sanity."""

import os
import time

import pytest

from rwkv_tts_tpu.tokenizer import RwkvTokenizer, load_tokenizer

VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets", "model",
                     "vocab_canonical.txt")

pytestmark = pytest.mark.skipif(not os.path.exists(VOCAB),
                                reason="vocab unavailable")


@pytest.fixture(scope="module")
def tok():
    t = load_tokenizer(VOCAB)
    if t._native is None:
        pytest.skip("native trie unavailable (no toolchain)")
    return t


TEXTS = [
    "Hello, world! This is a longer English sentence for the tokenizer.",
    "今天天气真不错，我们一起去公园散步吧。中文分词测试。",
    "Mixed 中英文 with numbers 12345 and symbols @#$%^&*() plus emoji 🎤🎶",
    " " * 50 + "whitespace runs",
    "a" * 2000,
    "",
]


def test_native_matches_python(tok):
    for text in TEXTS:
        data = text.encode("utf-8")
        assert tok._native.encode_bytes(data) == tok._encode_bytes_py(data), \
            text[:40]


def test_native_roundtrip(tok):
    for text in TEXTS:
        assert tok.decode(tok.encode(text)) == text


def test_native_random_bytes(tok):
    import numpy as np
    rng = np.random.default_rng(0)
    for _ in range(5):
        data = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
        assert tok._native.encode_bytes(data) == tok._encode_bytes_py(data)


def test_native_is_faster(tok):
    text = ("性能测试，speed test sentence with mixed content. " * 200)
    data = text.encode("utf-8")
    t0 = time.perf_counter()
    for _ in range(20):
        tok._native.encode_bytes(data)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        tok._encode_bytes_py(data)
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)
