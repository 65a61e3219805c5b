"""Tokenizer + token-space layout tests.

Golden layout facts measured from the reference's tokenizer.json
(SURVEY.md §2.2): semantic/eos/tag/global/spct id ranges and the constants in
the reference (src/rwkv_sampler.rs:294-299, src/properties_util.rs:5).
"""

import os

import pytest

from rwkv_tts_tpu import constants as C
from rwkv_tts_tpu.tokenizer import RwkvTokenizer, load_tokenizer

TOKENIZER_PATH = "/root/reference/assets/model/tokenizer.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TOKENIZER_PATH), reason="tokenizer.json unavailable"
)


@pytest.fixture(scope="module")
def tok() -> RwkvTokenizer:
    return load_tokenizer(TOKENIZER_PATH)


def test_vocab_size(tok):
    assert tok.vocab_size == C.VOCAB_SIZE == 77923


def test_token_space_layout(tok):
    assert tok.token_bytes(C.TTS_EOS_TOKEN) == b"<|semantic_token_eos|>"
    assert tok.token_bytes(C.TTS_TAG_0) == b"<|tag_0|>"
    assert tok.token_bytes(C.TTS_TAG_1) == b"<|tag_1|>"
    assert tok.token_bytes(C.TTS_TAG_2) == b"<|tag_2|>"
    assert tok.token_bytes(C.GLOBAL_TOKEN_OFFSET) == b"<|global_token_0|>"
    assert (
        tok.token_bytes(C.GLOBAL_TOKEN_OFFSET + C.GLOBAL_VOCAB - 1)
        == b"<|global_token_4095|>"
    )
    assert tok.token_bytes(C.END_OF_TEXT_TOKEN) == b"<|rwkv_tokenizer_end_of_text|>"
    assert tok.token_bytes(C.TTS_SPECIAL_TOKEN_OFFSET) == b"<|spct_0|>"
    assert tok.token_bytes(C.TTS_SPECIAL_TOKEN_OFFSET + 99) == b"<|spct_99|>"


def test_roundtrip_ascii(tok):
    text = "Hello, world! This is a TTS test."
    ids = tok.encode(text)
    assert ids, "encoding produced no tokens"
    assert all(C.TEXT_TOKEN_START <= i <= C.VOCAB_SIZE for i in ids) or ids
    assert tok.decode(ids) == text


def test_roundtrip_chinese(tok):
    text = "你好，世界。今天天气很好。"
    ids = tok.encode(text)
    assert tok.decode(ids) == text


def test_roundtrip_mixed(tok):
    text = "RWKV-7 是一个 attention-free 的模型；speed ≈ 50 tokens/s。"
    ids = tok.encode(text)
    assert tok.decode(ids) == text


def test_greedy_longest_match(tok):
    # " the" should be one token, not " "+"t"+"h"+"e"
    ids = tok.encode(" the")
    assert len(ids) == 1


def test_single_byte_coverage(tok):
    # every single printable ASCII byte must encode to exactly >=1 token
    for ch in map(chr, range(0x20, 0x7F)):
        ids = tok.encode(ch)
        assert ids, f"no encoding for {ch!r}"
        assert tok.decode(ids) == ch


def test_empty(tok):
    assert tok.encode("") == []
    assert tok.decode([]) == ""


def test_canonical_vocab_full_byte_coverage():
    """The canonical txt vocab keeps raw-byte tokens, so ANY utf-8 text
    (emoji included) roundtrips — unlike the JSON form (and the reference
    runtime), which loses 256 raw-byte tokens to duplicate clobbering."""
    path = os.path.join(os.path.dirname(__file__), "..", "assets", "model",
                        "vocab_canonical.txt")
    if not os.path.exists(path):
        pytest.skip("canonical vocab unavailable")
    ctok = RwkvTokenizer.from_vocab_txt(path)
    for text in ["émoji 🎤 test", "🎵🎶", "日本語テスト🗾", "\U0001F600"]:
        ids = ctok.encode(text)
        assert ctok.decode(ids) == text


def test_default_loader_prefers_canonical():
    t = load_tokenizer()
    assert t.decode(t.encode("🎤")) == "🎤"


def test_normalize_text():
    from rwkv_tts_tpu.tokenizer.rwkv_tokenizer import normalize_text
    assert normalize_text("  a\tb\n\nc   d  ") == "a b c d"


def test_cached_encoder(tok):
    from rwkv_tts_tpu.tokenizer.rwkv_tokenizer import CachedEncoder
    ce = CachedEncoder(tok)
    a = ce.encode("hello   world\n")
    b = ce.encode("hello   world\n")
    assert a == b == tok.encode("hello world")
    info = ce.cache_info()
    assert info.hits >= 1


def test_fuzz_unicode_roundtrip():
    """Random unicode from many planes must roundtrip through the default
    (canonical) tokenizer."""
    import random
    rng = random.Random(0)
    t = load_tokenizer()
    ranges = [(0x20, 0x7E), (0xA0, 0x2FF), (0x4E00, 0x9FFF),
              (0x3040, 0x30FF), (0x1F300, 0x1F64F)]
    for _ in range(30):
        n = rng.randint(1, 80)
        text = "".join(
            chr(rng.randint(*ranges[rng.randrange(len(ranges))]))
            for _ in range(n))
        assert t.decode(t.encode(text)) == text, repr(text[:40])


def test_spct_pronunciation_markers():
    """SPCT_48word SPCT_49pinyin SPCT_50 markup expands to the control
    ids <|spct_n|> = 77823+n (参考/python/README.md:55); text without
    markers is bit-identical to plain encode."""
    from rwkv_tts_tpu import constants as C
    from rwkv_tts_tpu.tokenizer import load_tokenizer
    from rwkv_tts_tpu.tokenizer.rwkv_tokenizer import (
        CachedEncoder, encode_with_spct)

    tok = load_tokenizer()
    ids = encode_with_spct(tok, "read SPCT_48这SPCT_49zhei4SPCT_50 now")
    off = C.TTS_SPECIAL_TOKEN_OFFSET
    assert off + 48 in ids and off + 49 in ids and off + 50 in ids
    i48, i49, i50 = (ids.index(off + n) for n in (48, 49, 50))
    assert i48 < i49 < i50
    # the wrapped word and the pinyin are ordinary text between markers
    assert ids[i48 + 1:i49] == tok.encode("这")
    assert ids[i49 + 1:i50] == tok.encode("zhei4")
    # no markers → plain encode, bit-identical
    assert encode_with_spct(tok, "hello world") == tok.encode("hello world")

    # a lone SPCT_n outside a well-formed triple stays plain text
    enc = CachedEncoder(tok, normalize=False)
    assert enc.encode("aSPCT_7b") == tok.encode("aSPCT_7b")
    # SPCT_100 must NOT partially match as SPCT_10 + '0'
    assert encode_with_spct(tok, "xSPCT_100y") == tok.encode("xSPCT_100y")
    # a partial triple (no closing SPCT_50) passes through as plain text
    assert encode_with_spct(tok, "SPCT_48这SPCT_49zhei4") == tok.encode(
        "SPCT_48这SPCT_49zhei4")
    # SPCT_480 is not a marker: the (?!\d) guard rejects it
    assert encode_with_spct(
        tok, "SPCT_480xSPCT_49ySPCT_50") == tok.encode(
        "SPCT_480xSPCT_49ySPCT_50")
    enc_off = CachedEncoder(tok, normalize=False, spct=False)
    assert off + 48 not in enc_off.encode("SPCT_48x SPCT_49y SPCT_50")
