"""Cached-speaker fast path (VERDICT r3 #1): property-controlled requests
reuse 32 cached speaker tokens keyed by (properties, seed) and run the
short zero-shot chain, skipping the 32-step global stage.

No reference analog — this is the framework's own serving mode (OFF by
default), built on the same trade the reference's voice library makes
(lightweight_tts_pipeline.rs:747-787: enrolled global tokens + zero-shot
inference). Deviations documented in engine.generate_speaker_tokens and
docs/PARITY.md.
"""

import asyncio
import dataclasses

import numpy as np
import pytest

from rwkv_tts_tpu.config import TtsArgs

from test_server import tiny_pipeline


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    return tiny_pipeline(tmp_path_factory.mktemp("raf"))


def test_speaker_tokens_deterministic_and_in_range(pipe):
    a = TtsArgs(text="x", gender="male", seed=5)
    t1 = pipe.engine.generate_speaker_tokens(a, 5)
    t2 = pipe.engine.generate_speaker_tokens(a, 5)
    assert t1 == t2
    assert len(t1) == 32
    assert all(0 <= t < 4096 for t in t1)
    # a different stage seed gives a different speaker
    t3 = pipe.engine.generate_speaker_tokens(a, 6)
    assert t3 != t1


def test_cache_keying(pipe):
    base = TtsArgs(text="hello", seed=11, cached_speaker=True)
    g1 = pipe.get_cached_speaker(base)
    g2 = pipe.get_cached_speaker(dataclasses.replace(base, text="other"))
    assert g1 == g2                      # text does NOT key the speaker
    g3 = pipe.get_cached_speaker(dataclasses.replace(base, seed=12))
    assert g3 != g1                      # seed does
    g4 = pipe.get_cached_speaker(dataclasses.replace(base, gender="male"))
    assert g4 != g1                      # properties do
    # cache actually caches: the engine is not called again for a hit
    calls = []
    orig = pipe.engine.generate_speaker_tokens
    pipe.engine.generate_speaker_tokens = (
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    try:
        assert pipe.get_cached_speaker(base) == g1
        assert not calls
    finally:
        pipe.engine.generate_speaker_tokens = orig


def test_seed_none_is_stable_default_voice(pipe):
    """seed=None caches ONE server-lifetime speaker (operator default
    voice semantics), not a fresh speaker per request."""
    a = TtsArgs(text="a", seed=None, cached_speaker=True, emotion="HAPPY")
    assert pipe.get_cached_speaker(a) == pipe.get_cached_speaker(
        dataclasses.replace(a, text="b"))


def test_resolve_voice_cached_rung(pipe):
    r = pipe.resolve_voice(TtsArgs(text="hi", seed=3, cached_speaker=True))
    assert r.zero_shot is True
    assert len(r.ref_global_tokens) == 32
    assert r.seed == 3                   # user seed KEPT (unlike cloning)
    # OFF by default: a plain request is untouched
    r0 = pipe.resolve_voice(TtsArgs(text="hi", seed=3))
    assert r0.zero_shot is False and not r0.ref_global_tokens
    # server default ON, explicit False opts out
    pipe.cached_speaker_default = True
    try:
        r1 = pipe.resolve_voice(TtsArgs(text="hi", seed=3))
        assert r1.zero_shot is True and len(r1.ref_global_tokens) == 32
        r2 = pipe.resolve_voice(
            TtsArgs(text="hi", seed=3, cached_speaker=False))
        assert r2.zero_shot is False
    finally:
        pipe.cached_speaker_default = False


def test_voice_id_outranks_cached_speaker(pipe, tmp_path):
    feat = pipe.voice_store.save(
        name="v", prompt_text="p", global_tokens=[1] * 32,
        semantic_tokens=[2, 3], audio_duration=1.0, sample_rate=16000)
    try:
        r = pipe.resolve_voice(TtsArgs(
            text="hi", voice_id=feat.id, cached_speaker=True, seed=9))
        assert r.ref_global_tokens == [1] * 32   # library voice, not cache
        assert r.seed == 0                       # cloning forces seed 0
    finally:
        pipe.voice_store.delete(feat.id)


def test_synthesize_cached_end_to_end(pipe):
    a = TtsArgs(text="cached fast path", seed=21, cached_speaker=True,
                max_tokens=12)
    r1 = pipe.synthesize(a)
    r2 = pipe.synthesize(a)
    assert np.isfinite(r1.audio).all() and len(r1.audio) > 0
    # determinism through the cache: same request → same tokens/audio
    assert r1.semantic_tokens == r2.semantic_tokens
    assert r1.global_tokens == r2.global_tokens
    np.testing.assert_array_equal(r1.audio, r2.audio)


def test_streaming_cached_speaker(tmp_path):
    """cached_speaker rides /api/tts/stream: resolution happens upstream
    of the continuous engine (off the event loop), the stream runs the
    zero-shot chain, and audio arrives chunked."""
    import base64 as b64

    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer

    from rwkv_tts_tpu.config import BatchConfig
    from rwkv_tts_tpu.server.app import create_app
    import json as _json

    async def go():
        app = create_app(tiny_pipeline(tmp_path),
                         BatchConfig(max_batch_size=4, collect_timeout_ms=5,
                                     inference_timeout_ms=120000))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post(
                "/api/tts/stream",
                json={"text": "cached stream", "seed": 5,
                      "cached_speaker": True, "latency_mode": "ultra"},
                timeout=aiohttp.ClientTimeout(total=900))
            assert r.status == 200
            chunks = []
            async for line in r.content:
                if line.strip():
                    chunks.append(_json.loads(line))
            assert chunks and chunks[-1]["final"]
            pcm = b"".join(b64.b64decode(c.get("audio_base64", ""))
                           for c in chunks)
            assert len(pcm) > 0
            # the speaker cache was populated by the stream's resolution
            pipe = app["pipeline"]
            assert any(k[-1] == 5 for k in pipe._speaker_cache)
        finally:
            await client.close()
    asyncio.run(go())


def test_http_cached_speaker_flag(tmp_path):
    """API accepts cached_speaker; the response synthesizes through the
    zero-shot chain and stays deterministic per (props, seed)."""
    from aiohttp.test_utils import TestClient, TestServer

    from rwkv_tts_tpu.config import BatchConfig
    from rwkv_tts_tpu.server.app import create_app

    async def go():
        app = create_app(tiny_pipeline(tmp_path),
                         BatchConfig(max_batch_size=4, collect_timeout_ms=5,
                                     inference_timeout_ms=120000))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            outs = []
            for _ in range(2):
                r = await client.post("/api/tts", json={
                    "text": "hello", "seed": 7, "cached_speaker": True})
                assert r.status == 200
                j = await r.json()
                assert j["success"] is True
                outs.append(j["audio_base64"])
            assert outs[0] == outs[1]
        finally:
            await client.close()
    asyncio.run(go())
