"""Streaming vocoder: incremental output must match full-sequence decode."""

import jax
import numpy as np
import pytest

from rwkv_tts_tpu.config import BiCodecConfig, EngineConfig, RwkvConfig, TtsArgs
from rwkv_tts_tpu.models import bicodec, rwkv7
from rwkv_tts_tpu.runtime.continuous import ContinuousEngine
from rwkv_tts_tpu.runtime.streaming import StreamingVocoder, stream_synthesize

BC_CFG = BiCodecConfig.tiny(feat_dim=64, semantic_codebook=128)


@pytest.fixture(scope="module")
def bc_params():
    return bicodec.init_params(BC_CFG, jax.random.PRNGKey(1))


def test_incremental_matches_full_decode(bc_params):
    """Chunked vocoding with default (receptive-field) context/lookahead
    must equal the full bucketed decode everywhere, including the
    edge-padded tail."""
    rng = np.random.default_rng(0)
    g = list(rng.integers(0, 4096, 32))
    sem = list(rng.integers(0, 128, 100))
    full = bicodec.detokenize(bc_params, g, sem, BC_CFG, bucket=4)[0]

    sv = StreamingVocoder(bc_params, BC_CFG, g, chunk_tokens=32)
    parts = []
    for i in range(0, 100, 10):
        parts.append(sv.push(sem[i:i + 10]))
    parts.append(sv.push([], flush=True))
    streamed = np.concatenate(parts)

    assert streamed.shape == full.shape == (100 * 320,)
    np.testing.assert_allclose(streamed, full, atol=5e-4)


def test_streaming_end_to_end_with_engine(bc_params):
    cfg = RwkvConfig(
        n_layer=2, n_embd=128, head_size=64, vocab_size=77923,
        padded_vocab_size=78080, decay_lora=32, a_lora=32, v_lora=16,
        gate_lora=32, dtype="float32", param_dtype="float32",
    )
    params = rwkv7.init_params(cfg, jax.random.PRNGKey(0))
    eng = ContinuousEngine(
        params, cfg, EngineConfig(prefill_buckets=(32, 64),
                                  max_semantic_tokens=24, batch_size=2),
        use_pallas=False, block=8, slots=2)
    try:
        args = TtsArgs(text="stream this text", seed=3, max_tokens=24)
        chunks = list(stream_synthesize(eng, bc_params, BC_CFG, args,
                                        chunk_tokens=8))
        assert chunks[-1].final
        audio = np.concatenate([c.audio for c in chunks]) if chunks else None
        # audio length = total semantic tokens × hop
        res = eng.generate(TtsArgs(text="stream this text", seed=3,
                                   max_tokens=24))
        assert audio.shape == (len(res.semantic_tokens) * 320,)
        assert np.all(np.isfinite(audio))
    finally:
        eng.stop()


def test_low_latency_mode_close_to_exact(bc_params):
    """low_latency trims context/lookahead to fixed small windows: first
    audio needs chunk+16 tokens instead of chunk+receptive. Output is no
    longer bit-exact but must stay close (the truncated prenet tail is a
    smooth conditioning term) and correctly sized."""
    import numpy as np
    from rwkv_tts_tpu.models import bicodec
    from rwkv_tts_tpu.runtime.streaming import StreamingVocoder

    rng = np.random.default_rng(1)
    g = list(rng.integers(0, 4096, 32))
    sem = list(rng.integers(0, 128, 100))
    full = bicodec.detokenize(bc_params, g, sem, BC_CFG, bucket=4)[0]

    sv = StreamingVocoder(bc_params, BC_CFG, g, chunk_tokens=32,
                          low_latency=True)
    assert sv.lookahead == 16 and sv.context == 32
    parts = [sv.push(sem[i:i + 10]) for i in range(0, 100, 10)]
    parts.append(sv.push([], flush=True))
    streamed = np.concatenate(parts)
    assert streamed.shape == full.shape
    # close, not exact: bounded deviation, same energy scale
    err = np.abs(streamed - full)
    assert float(err.mean()) < 0.05
    assert np.all(np.isfinite(streamed))


def test_ultra_latency_mode(bc_params):
    """latency_mode='ultra': 16-token first chunk with 16/8 windows — first
    audio needs only 24 real tokens. Output sized exactly, finite, and close
    to the full decode (same argument as the low mode)."""
    rng = np.random.default_rng(2)
    g = list(rng.integers(0, 4096, 32))
    sem = list(rng.integers(0, 128, 100))
    full = bicodec.detokenize(bc_params, g, sem, BC_CFG, bucket=4)[0]

    sv = StreamingVocoder(bc_params, BC_CFG, g, latency_mode="ultra")
    assert (sv.chunk, sv.context, sv.lookahead) == (16, 16, 8)
    # first audio appears as soon as chunk+lookahead=24 tokens exist
    first = sv.push(sem[:24])
    assert first.shape == (16 * 320,)
    parts = [first]
    for i in range(24, 100, 10):
        parts.append(sv.push(sem[i:i + 10]))
    parts.append(sv.push([], flush=True))
    streamed = np.concatenate(parts)
    assert streamed.shape == full.shape
    # random-init codec is worst-case for the truncated prenet tail; bound
    # the deviation relative to the signal scale rather than absolutely
    err = np.abs(streamed - full)
    assert float(err.mean()) < 0.5 * float(np.abs(full).mean() + 1e-9)
    assert np.all(np.isfinite(streamed))

    with pytest.raises(ValueError):
        StreamingVocoder(bc_params, BC_CFG, g, latency_mode="warp")


def test_resolve_globals_trust_order():
    """A short request can retire (result_cb fires, slot popped) before the
    consumer thread builds the vocoder; the finished result's speaker
    tokens must win over the zero-vector fallback, and an unresolvable
    request must raise instead of vocoding in a wrong default voice."""
    import threading
    import types

    from rwkv_tts_tpu.config import TtsArgs
    from rwkv_tts_tpu.runtime.engine import GenerationResult
    from rwkv_tts_tpu.runtime.streaming import _resolve_globals

    eng = types.SimpleNamespace(_lock=threading.Lock(), _live={})
    args = TtsArgs(text="short")
    res = GenerationResult(list(range(32)), [1, 2, 3], 4, 35)
    fired = threading.Event()
    fired.set()

    # retired request, result available → result's speaker tokens
    assert _resolve_globals(eng, args, {"res": res}, fired) == list(range(32))
    # zero-shot fallback: the request carries its own reference tokens
    zs = TtsArgs(text="short", zero_shot=True,
                 ref_global_tokens=[7] * 32)
    assert _resolve_globals(eng, zs, {}, fired) == [7] * 32
    # engine failure → the Exception must not be mistaken for a result
    with pytest.raises(RuntimeError, match="speaker tokens"):
        _resolve_globals(eng, args, {"res": ValueError("boom")}, fired)
    # live slot wins over everything
    live = types.SimpleNamespace(request=args, global_tokens=[9] * 32)
    eng._live[0] = live
    assert _resolve_globals(eng, args, {"res": res}, fired) == [9] * 32

    # the retire TOCTOU window: slot already popped, result not yet
    # stored — the resolver must WAIT for result_cb instead of raising
    eng._live.clear()
    box, pending = {}, threading.Event()

    def _late_result():
        box["res"] = res
        pending.set()
    t = threading.Timer(0.2, _late_result)
    t.start()
    try:
        assert _resolve_globals(eng, args, box, pending) == list(range(32))
    finally:
        t.cancel()


def test_streaming_tp_engine_sample_identical(bc_params):
    """--tp streaming end to end: chunks streamed from a layer-TP
    continuous engine (model axis > 1) must be SAMPLE-identical to the
    non-TP stream — same tokens (tested elsewhere) through the same
    vocoder windows."""
    import jax as _jax
    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rwkv_tts_tpu.parallel import mesh as meshlib

    cfg = RwkvConfig(
        n_layer=2, n_embd=128, head_size=64, vocab_size=77923,
        padded_vocab_size=78080, decay_lora=32, a_lora=32, v_lora=16,
        gate_lora=32, dtype="float32", param_dtype="float32",
    )
    params = rwkv7.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(prefill_buckets=(32, 64), max_semantic_tokens=24,
                        batch_size=4)
    args = TtsArgs(text="tensor parallel stream", seed=7, max_tokens=24)

    def run(mesh):
        eng = ContinuousEngine(params, cfg, ecfg, use_pallas=False,
                               block=8, slots=4, mesh=mesh)
        try:
            chunks = list(stream_synthesize(eng, bc_params, BC_CFG, args,
                                            chunk_tokens=8, timeout=900.0))
        finally:
            eng.stop()
        assert chunks and chunks[-1].final
        return np.concatenate([c.audio for c in chunks])

    plain = run(None)
    tp = run(meshlib.make_mesh(8, model_parallel=2))
    np.testing.assert_array_equal(tp, plain)


def test_flash_latency_mode(bc_params):
    """latency_mode='flash' (the r2-verdict 'ultra+'): 8-token first chunk
    with 16/4 windows — first audio after only 12 real tokens."""
    rng = np.random.default_rng(3)
    g = list(rng.integers(0, 4096, 32))
    sem = list(rng.integers(0, 128, 64))
    full = bicodec.detokenize(bc_params, g, sem, BC_CFG, bucket=4)[0]

    sv = StreamingVocoder(bc_params, BC_CFG, g, latency_mode="flash")
    assert (sv.chunk, sv.context, sv.lookahead) == (8, 16, 4)
    first = sv.push(sem[:12])
    assert first.shape == (8 * 320,)
    parts = [first]
    for i in range(12, 64, 7):
        parts.append(sv.push(sem[i:i + 7]))
    parts.append(sv.push([], flush=True))
    streamed = np.concatenate(parts)
    assert streamed.shape == full.shape
    err = np.abs(streamed - full)
    assert float(err.mean()) < 0.6 * float(np.abs(full).mean() + 1e-9)
    assert np.all(np.isfinite(streamed))
