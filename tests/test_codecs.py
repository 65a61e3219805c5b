"""wav2vec2 + BiCodec shape/contract tests (random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tts_tpu.config import BiCodecConfig, Wav2Vec2Config
from rwkv_tts_tpu.models import bicodec, wav2vec2

W2V_CFG = Wav2Vec2Config(num_layers=4, hidden_size=64, num_heads=4,
                         ffn_size=128, conv_dims=(32, 32, 32, 32, 32, 32, 32))
BC_CFG = BiCodecConfig.tiny(feat_dim=64, semantic_codebook=128)


@pytest.fixture(scope="module")
def w2v_params():
    return wav2vec2.init_params(W2V_CFG, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def bc_params():
    return bicodec.init_params(BC_CFG, jax.random.PRNGKey(1))


def test_wav2vec2_downsample_ratio(w2v_params):
    wav = jax.random.normal(jax.random.PRNGKey(2), (2, 16000))
    feats = wav2vec2.extract_features(w2v_params, wav, W2V_CFG,
                                      output_layers=(2, 3))
    B, T, H = feats.shape
    assert B == 2 and H == W2V_CFG.hidden_size
    # 7 convs with strides 5,2,2,2,2,2,2 → ≈ N/320 frames
    assert abs(T - 16000 // 320) <= 3
    assert bool(jnp.all(jnp.isfinite(feats)))


LEVELS = BC_CFG.fsq_levels      # (4,)*6 → 4096 codes


def test_fsq_roundtrip():
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 32, len(LEVELS))) * 2.0
    codes, quant = bicodec.fsq_quantize(z, LEVELS)
    assert codes.shape == (4, 32)
    assert int(codes.min()) >= 0 and int(codes.max()) < 4096
    deq = bicodec.fsq_dequantize(codes, LEVELS)
    # quantized values are multiples of 1/half_width; dequantize from the
    # index must reproduce them exactly
    np.testing.assert_allclose(np.asarray(deq), np.asarray(quant), atol=1e-6)


def test_fsq_all_codes_reachable():
    codes = jnp.arange(4096)
    vecs = bicodec.fsq_dequantize(codes, LEVELS)
    # invert: normalized code −1 ≤ v ≤ 0.5 maps back through the bounded
    # round; nudge to the cell center to stay off rounding boundaries
    z = jnp.arctanh(jnp.clip(vecs * 0.999, -0.999, 0.999))
    rt, _ = bicodec.fsq_quantize(z, LEVELS)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(codes))


def test_bicodec_encode_contract(bc_params):
    feat = jax.random.normal(jax.random.PRNGKey(4), (2, 50, 64))
    mel = jax.random.normal(jax.random.PRNGKey(5), (2, 128, 301)) * 0.1
    sem, glob = bicodec.encode(bc_params, feat, mel, BC_CFG)
    assert sem.shape == (2, 50)
    assert glob.shape == (2, 32)
    assert int(sem.min()) >= 0 and int(sem.max()) < BC_CFG.semantic_codebook
    assert int(glob.min()) >= 0 and int(glob.max()) < 4096


def test_bicodec_decode_contract(bc_params):
    S = 64
    g = jax.random.randint(jax.random.PRNGKey(6), (2, 32), 0, 4096)
    s = jax.random.randint(jax.random.PRNGKey(7), (2, S), 0, 128)
    wav = bicodec.decode(bc_params, g, s, BC_CFG)
    assert wav.shape == (2, S * 320)
    w = np.asarray(wav)
    assert np.all(np.isfinite(w))
    assert np.max(np.abs(w)) <= 1.0


def test_bicodec_decode_bf16_close_to_f32(bc_params):
    """The serving compute policy (cfg.dtype='bfloat16': bf16 convs/matmuls,
    f32 accumulation + norms + snake + tanh) must track the f32 reference
    closely — the waveform lives in (−1, 1), so absolute error is the
    audible metric."""
    import dataclasses
    S = 64
    # unscaled random init saturates the output tanh (pre-activation ≫ 1),
    # where any rounding flips the rail — not the operating regime of real
    # weights. Halving the weights keeps the decoder linear so the bf16
    # error is actually measurable.
    params = jax.tree_util.tree_map(
        lambda a: (a * 0.5).astype(a.dtype)
        if a.dtype == jnp.float32 else a, bc_params)
    g = jax.random.randint(jax.random.PRNGKey(6), (2, 32), 0, 4096)
    s = jax.random.randint(jax.random.PRNGKey(7), (2, S), 0, 128)
    w32 = np.asarray(bicodec.decode(params, g, s, BC_CFG))
    cfg16 = dataclasses.replace(BC_CFG, dtype="bfloat16")
    w16 = np.asarray(bicodec.decode(params, g, s, cfg16))
    assert w16.dtype == np.float32
    assert np.all(np.isfinite(w16))
    ref = np.max(np.abs(w32))
    err = np.max(np.abs(w16 - w32))
    assert err < 0.05 * ref, (
        f"bf16 vocoder diverged from f32: max err {err} vs signal {ref}")
    # waveforms must be strongly correlated, not merely bounded-close
    c = np.corrcoef(w16.ravel(), w32.ravel())[0, 1]
    assert c > 0.999, f"bf16/f32 waveform correlation {c}"


def test_bicodec_decode_mxu_conv_close_to_native():
    """conv_impl="mxu" (the Pallas bf16 wave-generator conv backend,
    models/bicodec._wavegen_conv) must track the native-conv f32 decode.
    Uses a mid-size decoder so the >=96-channel dispatch threshold is
    actually crossed at three stages (incl. dilations 1/3/9); on CPU the
    kernel runs in interpret mode."""
    import dataclasses
    cfg = BiCodecConfig.tiny(feat_dim=64, semantic_codebook=128,
                             dec_channels=384)
    params = bicodec.init_params(cfg, jax.random.PRNGKey(11))
    params = jax.tree_util.tree_map(
        lambda a: (a * 0.5).astype(a.dtype)
        if a.dtype == jnp.float32 else a, params)
    S = 16
    g = jax.random.randint(jax.random.PRNGKey(12), (1, 32), 0, 4096)
    s = jax.random.randint(jax.random.PRNGKey(13), (1, S), 0, 128)
    ref = np.asarray(bicodec.decode(params, g, s, cfg))
    cfg_mxu = dataclasses.replace(cfg, conv_impl="mxu")
    got = np.asarray(bicodec.decode(params, g, s, cfg_mxu))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) < 0.05 * scale, (
        f"mxu vocoder diverged: max err {np.max(np.abs(got - ref))} "
        f"vs signal {scale}")
    c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert c > 0.999, f"mxu/native waveform correlation {c}"


def test_bicodec_decode_mxu_fused_close_to_native():
    """conv_impl="mxu_fused" (residual units run as two Pallas calls with
    in-kernel snake + residual add, models/bicodec._residual_unit_fused)
    must track the native f32 decode like the plain "mxu" backend does."""
    import dataclasses
    cfg = BiCodecConfig.tiny(feat_dim=64, semantic_codebook=128,
                             dec_channels=384)
    params = bicodec.init_params(cfg, jax.random.PRNGKey(11))
    params = jax.tree_util.tree_map(
        lambda a: (a * 0.5).astype(a.dtype)
        if a.dtype == jnp.float32 else a, params)
    S = 16
    g = jax.random.randint(jax.random.PRNGKey(12), (1, 32), 0, 4096)
    s = jax.random.randint(jax.random.PRNGKey(13), (1, S), 0, 128)
    ref = np.asarray(bicodec.decode(params, g, s, cfg))
    cfg_f = dataclasses.replace(cfg, conv_impl="mxu_fused")
    got = np.asarray(bicodec.decode(params, g, s, cfg_f))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) < 0.05 * scale, (
        f"fused vocoder diverged: max err {np.max(np.abs(got - ref))} "
        f"vs signal {scale}")
    c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert c > 0.999, f"fused/native waveform correlation {c}"


def test_detokenize_wrapper_pads_and_trims(bc_params):
    g = list(range(32))
    s = list(range(50))         # not a multiple of the bucket
    wav = bicodec.detokenize(bc_params, g, s, BC_CFG, bucket=64)
    assert wav.shape == (1, 50 * 320)


def test_global_tokens_change_output(bc_params):
    """The speaker condition must actually influence the waveform."""
    s = jax.random.randint(jax.random.PRNGKey(8), (1, 64), 0, 128)
    g1 = jnp.zeros((1, 32), jnp.int32)
    g2 = jnp.full((1, 32), 4095, jnp.int32)
    w1 = np.asarray(bicodec.decode(bc_params, g1, s, BC_CFG))
    w2 = np.asarray(bicodec.decode(bc_params, g2, s, BC_CFG))
    assert float(np.max(np.abs(w1 - w2))) > 1e-6


def test_detokenize_exponential_buckets(bc_params):
    from rwkv_tts_tpu.models.bicodec import _detok_bucket
    assert _detok_bucket(1, (64, 128)) == 64
    assert _detok_bucket(64, (64, 128)) == 64
    assert _detok_bucket(65, (64, 128)) == 128
    assert _detok_bucket(300, (64, 128)) == 384   # beyond last: round up
    g, s = list(range(32)), list(range(100))
    wav = bicodec.detokenize(bc_params, g, s, BC_CFG)
    assert wav.shape == (1, 100 * 320)


def test_pipeline_warmup_smoke(bc_params):
    import jax
    from rwkv_tts_tpu.config import EngineConfig, RwkvConfig, Wav2Vec2Config
    from rwkv_tts_tpu.models import rwkv7
    from rwkv_tts_tpu.runtime.pipeline import TtsPipeline

    lm_cfg = RwkvConfig(n_layer=2, n_embd=128, head_size=64, vocab_size=1000,
                        padded_vocab_size=1024, decay_lora=16, a_lora=16,
                        v_lora=8, gate_lora=16, dtype="float32",
                        param_dtype="float32")
    pipe = TtsPipeline(
        rwkv7.init_params(lm_cfg, jax.random.PRNGKey(0)), lm_cfg,
        bc_params, BC_CFG, voice_store=None,
        engine_cfg=EngineConfig(prefill_buckets=(16, 32),
                                max_semantic_tokens=8),
        use_pallas=False)
    times = pipe.warmup(detok_buckets=(64,))
    # non-TP serving runs the one-dispatch lm_program per bucket × mode ×
    # batch-ladder width (pow2 ladder ∪ cap — ADVICE r3 #1)
    assert "lm_normal_16_b1" in times and "lm_zs_16_b1" in times \
        and "lm_normal_32_b1" in times and "detokenize_64" in times
    cap = pipe.engine.engine_cfg.batch_size
    assert f"lm_normal_16_b{cap}" in times     # the serving cap width
    # streaming vocode windows for every latency mode (r4)
    assert any(k.startswith("stream_flash_") for k in times)
    assert any(k.startswith("stream_exact_") for k in times)


def test_pipeline_warmup_budget(bc_params):
    """``budget_s`` (r5, VERDICT r4 #8): an exhausted budget skips the
    remaining programs, lists them under "skipped", and never errors —
    the operator's startup-time vs first-traffic-p99 trade."""
    import jax
    from rwkv_tts_tpu.config import EngineConfig, RwkvConfig
    from rwkv_tts_tpu.models import rwkv7
    from rwkv_tts_tpu.runtime.pipeline import TtsPipeline

    lm_cfg = RwkvConfig(n_layer=2, n_embd=128, head_size=64, vocab_size=1000,
                        padded_vocab_size=1024, decay_lora=16, a_lora=16,
                        v_lora=8, gate_lora=16, dtype="float32",
                        param_dtype="float32")
    pipe = TtsPipeline(
        rwkv7.init_params(lm_cfg, jax.random.PRNGKey(0)), lm_cfg,
        bc_params, BC_CFG, voice_store=None,
        engine_cfg=EngineConfig(prefill_buckets=(16, 32),
                                max_semantic_tokens=8),
        use_pallas=False)
    times = pipe.warmup(detok_buckets=(64,), budget_s=0.0)
    skipped = times.get("skipped")
    assert skipped, "a zero budget must skip work"
    # the first ladder entry still warms (the budget is checked BEFORE
    # each step, and step one starts at elapsed ~0)... the clock may
    # already be past 0 at the first check, so only the *structure* is
    # asserted: everything not measured is accounted for in skipped
    measured = [k for k in times if k != "skipped"]
    assert "staged_long_prompt" in skipped or "global_stage" in times
    assert all(not k.startswith("lm_") or k in skipped or k in measured
               for k in skipped + measured)
    # unbounded warmup on the same pipeline completes with nothing skipped
    times2 = pipe.warmup(detok_buckets=(64,))
    assert "skipped" not in times2


def test_warmup_compiles_the_serving_variants(bc_params, monkeypatch):
    """Warmup must call the stage/vocoder programs with the SAME static
    arguments serving uses, or the compile it pays for is wasted and the
    first request stalls on a fresh compile: normal mode passes
    feed_tag1=True (engine.py), zero-shot False; detokenize must bucket
    on the serving DETOKENIZE_BUCKETS ladder, not a fixed shape."""
    import jax
    from rwkv_tts_tpu.config import EngineConfig, RwkvConfig
    from rwkv_tts_tpu.models import rwkv7
    from rwkv_tts_tpu.runtime import engine as eng_mod
    from rwkv_tts_tpu.runtime.pipeline import TtsPipeline

    lm_cfg = RwkvConfig(n_layer=2, n_embd=128, head_size=64, vocab_size=1000,
                        padded_vocab_size=1024, decay_lora=16, a_lora=16,
                        v_lora=8, gate_lora=16, dtype="float32",
                        param_dtype="float32")
    pipe = TtsPipeline(
        rwkv7.init_params(lm_cfg, jax.random.PRNGKey(0)), lm_cfg,
        bc_params, BC_CFG, voice_store=None,
        engine_cfg=EngineConfig(prefill_buckets=(16,),
                                max_semantic_tokens=8),
        use_pallas=False)

    seen = []
    real_lm = eng_mod.lm_program
    monkeypatch.setattr(
        eng_mod, "lm_program",
        lambda *a, **kw: seen.append(
            (a[9], kw.get("use_pallas_fwd"), kw.get("use_pallas_step")))
        or real_lm(*a, **kw))
    real_detok = bicodec.detokenize
    detok_buckets = []
    monkeypatch.setattr(
        bicodec, "detokenize",
        lambda params, g, s, cfg, **kw: detok_buckets.append(
            kw.get("bucket", bicodec.DETOKENIZE_BUCKETS))
        or real_detok(params, g, s, cfg, **kw))

    pipe.warmup(detok_buckets=(64,))
    # both serving modes of the fused program, with the engine's exact
    # pallas statics (a mismatched variant compiles a program serving
    # never runs)
    eng = pipe.engine
    assert (False, eng.use_pallas, eng.use_pallas_step) in seen
    assert (True, eng.use_pallas, eng.use_pallas_step) in seen
    assert all(b == bicodec.DETOKENIZE_BUCKETS for b in detok_buckets)


def test_conv1d_im2col_matches_native():
    """The im2col GEMM formulation (bf16-policy fast path) must equal the
    native conv lowering up to dot-order reassociation — all the wave
    generator's dilation/padding geometries."""
    import jax.numpy as jnp
    import numpy as np
    from rwkv_tts_tpu.models.bicodec import _conv1d, _conv1d_im2col

    rng = np.random.default_rng(0)
    for Ci, O, K, d in [(128, 64, 7, 1), (256, 256, 7, 3), (128, 128, 7, 9),
                        (192, 128, 3, 1)]:
        pad = (K - 1) * d // 2
        x = jnp.asarray(rng.normal(size=(2, Ci, 50)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(O, Ci, K)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))
        want = np.asarray(_conv1d(x, w, b, dilation=d, padding=pad))
        got = np.asarray(_conv1d_im2col(x, w, b, d, pad))
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_resolve_voice_falls_back_on_bad_id(bc_params, w2v_params, tmp_path):
    """Library-level reference parity (lightweight_tts_pipeline.rs:753-767):
    a voice_id that fails to load falls down the chain (direct tokens →
    property tokens) instead of failing the batch. The HTTP layer
    validates ids separately (server test covers the 404)."""
    import jax
    from rwkv_tts_tpu.config import EngineConfig, RwkvConfig, TtsArgs
    from rwkv_tts_tpu.models import rwkv7
    from rwkv_tts_tpu.runtime.pipeline import TtsPipeline
    from rwkv_tts_tpu.runtime.voice_store import VoiceStore

    lm_cfg = RwkvConfig(n_layer=2, n_embd=128, head_size=64, vocab_size=1000,
                        padded_vocab_size=1024, decay_lora=16, a_lora=16,
                        v_lora=8, gate_lora=16, dtype="float32",
                        param_dtype="float32")
    pipe = TtsPipeline(
        rwkv7.init_params(lm_cfg, jax.random.PRNGKey(0)), lm_cfg,
        bc_params, BC_CFG, w2v_params, W2V_CFG,
        voice_store=VoiceStore(str(tmp_path)),
        engine_cfg=EngineConfig(prefill_buckets=(16,), max_semantic_tokens=4),
        use_pallas=False, w2v_output_layers=(2, 3))

    # bad id + direct ref tokens → zero-shot with the direct tokens
    a = pipe.resolve_voice(TtsArgs(text="x", voice_id="missing",
                                   ref_global_tokens=[3] * 32))
    assert a.zero_shot and a.ref_global_tokens == [3] * 32
    # cloning IGNORES the user seed — the reference forces seed 0 whenever
    # ref tokens are present (dynamic_batch_manager.rs:435-441, 489-496)
    a = pipe.resolve_voice(TtsArgs(text="x", seed=777,
                                   ref_global_tokens=[3] * 32))
    assert a.zero_shot and a.seed == 0
    # bad id, nothing else → property-token normal mode
    a = pipe.resolve_voice(TtsArgs(text="x", voice_id="missing"))
    assert not a.zero_shot
    # ref-audio FILE directly in the request — the chain's third rung
    # (lightweight_tts_pipeline.rs:773-781), tokens checksum-cached
    # (参考/C/tts/sparktts.cpp:278-382)
    import numpy as np

    from rwkv_tts_tpu.audio.io import encode_wav_16bit
    wavp = str(tmp_path / "ref_direct.wav")
    tone = (0.3 * np.sin(2 * np.pi * 220 * np.arange(24000) / 16000))
    with open(wavp, "wb") as f:
        f.write(encode_wav_16bit(tone.astype(np.float32), 16000))
    calls = []
    orig = pipe.extract_voice_tokens
    pipe.extract_voice_tokens = lambda p: (calls.append(p) or orig(p))
    a1 = pipe.resolve_voice(TtsArgs(text="x", zero_shot=True,
                                    ref_audio_path=wavp, seed=9))
    assert a1.zero_shot and len(a1.ref_global_tokens) == 32 and a1.seed == 0
    a2 = pipe.resolve_voice(TtsArgs(text="y", zero_shot=True,
                                    ref_audio_path=wavp))
    assert a2.ref_global_tokens == a1.ref_global_tokens
    assert a2.ref_semantic_tokens == a1.ref_semantic_tokens
    assert len(calls) == 1, "second resolve must hit the checksum cache"
    pipe.extract_voice_tokens = orig
    # batch RTF accounting: same value per request, wall over TOTAL audio
    res = pipe.synthesize_batch([TtsArgs(text="one two", seed=1,
                                         max_tokens=4),
                                 TtsArgs(text="three", seed=2,
                                         max_tokens=4)])
    assert res[0].rtf == res[1].rtf > 0
