"""Decode-engine behavior tests with a tiny random-weight model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tts_tpu import constants as C
from rwkv_tts_tpu.config import EngineConfig, RwkvConfig, TtsArgs
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.runtime.engine import TtsEngine

CFG = RwkvConfig(
    n_layer=2, n_embd=128, head_size=64, vocab_size=77923,
    padded_vocab_size=78080, decay_lora=32, a_lora=32, v_lora=16,
    gate_lora=32, dtype="float32", param_dtype="float32",
)
ECFG = EngineConfig(prefill_buckets=(32, 64, 128), max_semantic_tokens=24)


@pytest.fixture(scope="module")
def engine():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    return TtsEngine(params, CFG, ECFG, use_pallas=False)


def test_prompt_assembly_normal(engine):
    args = TtsArgs(text="hi", age="child", gender="male", emotion="HAPPY",
                   pitch="low_pitch", speed="fast")
    prompt, text_ids = engine.build_prompt(args)
    off = C.TTS_SPECIAL_TOKEN_OFFSET
    assert prompt[:6] == [off, off + 13, off + 47, off + 24, off + 6, off + 4]
    assert prompt[6] == C.TTS_TAG_2
    assert prompt[7:7 + len(text_ids)] == text_ids
    assert prompt[-1] == C.TTS_TAG_0


def test_prompt_assembly_zero_shot(engine):
    args = TtsArgs(text="hi", zero_shot=True,
                   ref_global_tokens=[0, 5, 4095, 9999, -3],
                   ref_semantic_tokens=[1, 2, 3])
    prompt, _ = engine.build_prompt(args)
    assert prompt[-1] == C.TTS_TAG_1
    # no property tokens in zero-shot: the voice rides the ref global
    # tokens (lightweight_tts_pipeline.rs:162-169 emits an empty list)
    assert prompt[0] == C.TTS_TAG_2
    # clamped to [0,4095] then offset (zero_shot_inference.rs:47,82-84)
    tail = prompt[-6:-1]
    assert tail == [C.GLOBAL_TOKEN_OFFSET + t for t in [0, 5, 4095, 4095, 0]]
    # ref semantic never prefixed
    assert C.TTS_TAG_1 not in prompt[:-1]


def test_generate_normal_mode(engine):
    res = engine.generate(TtsArgs(text="hello world", seed=42, max_tokens=24))
    assert len(res.global_tokens) == 32
    assert all(0 <= t < C.GLOBAL_VOCAB for t in res.global_tokens)
    assert len(res.semantic_tokens) <= 24
    assert all(0 <= t < C.TTS_EOS_TOKEN + 1 and t != C.TTS_EOS_TOKEN
               for t in res.semantic_tokens)


def test_seed_determinism(engine):
    a = engine.generate(TtsArgs(text="determinism", seed=7, max_tokens=16))
    b = engine.generate(TtsArgs(text="determinism", seed=7, max_tokens=16))
    assert a.global_tokens == b.global_tokens
    assert a.semantic_tokens == b.semantic_tokens
    c = engine.generate(TtsArgs(text="determinism", seed=8, max_tokens=16))
    assert (c.global_tokens != a.global_tokens) or (c.semantic_tokens != a.semantic_tokens)


def test_batch_matches_single(engine):
    """A request's output must not depend on its batch neighbors — the
    per-slot state/RNG isolation contract (dynamic_batch_manager.rs:409-476)."""
    r1 = TtsArgs(text="first request", seed=1, max_tokens=12)
    r2 = TtsArgs(text="a somewhat longer second request here", seed=2, max_tokens=12)
    solo1 = engine.generate(r1)
    solo2 = engine.generate(r2)
    b1, b2 = engine.generate_batch([r1, r2])
    assert b1.global_tokens == solo1.global_tokens
    assert b1.semantic_tokens == solo1.semantic_tokens
    assert b2.global_tokens == solo2.global_tokens
    assert b2.semantic_tokens == solo2.semantic_tokens


def test_zero_shot_uses_ref_globals(engine):
    ref_g = list(range(32))
    res = engine.generate(TtsArgs(
        text="clone me", seed=3, zero_shot=True, max_tokens=24,
        ref_global_tokens=ref_g, ref_semantic_tokens=[5, 6, 7],
    ))
    assert res.global_tokens == ref_g          # returned as-is (zero_shot_inference.rs:121)
    assert len(res.semantic_tokens) <= 24


def test_zero_shot_hard_min_blocks_eos(engine):
    """With a long text, EOS is forbidden for ≥ the hard minimum — so with
    a small cap the output must hit the cap exactly (no early EOS)."""
    text = "word " * 30          # |text tokens| ≈ 30+ → hard_min ≈ 54 > cap
    res = engine.generate(TtsArgs(text=text, seed=5, zero_shot=True,
                                  max_tokens=20, ref_global_tokens=[1] * 32,
                                  ref_semantic_tokens=[1, 2]))
    assert len(res.semantic_tokens) == 20


def test_max_tokens_cap(engine):
    res = engine.generate(TtsArgs(text="cap test", seed=11, max_tokens=5))
    assert len(res.semantic_tokens) <= 5


def test_long_prompt_chunked_prefill(engine):
    """Prompts longer than the largest bucket are consumed in chunks with
    carried state; result must equal what a single wide-bucket pass gives."""
    from rwkv_tts_tpu.config import EngineConfig
    from rwkv_tts_tpu.runtime.engine import TtsEngine

    long_text = "many words " * 40            # prompt ≈ 90+ tokens
    small = TtsEngine(engine.params, CFG,
                      EngineConfig(prefill_buckets=(16, 32),
                                   max_semantic_tokens=8),
                      use_pallas=False)
    wide = TtsEngine(engine.params, CFG,
                     EngineConfig(prefill_buckets=(256,),
                                  max_semantic_tokens=8),
                     use_pallas=False)
    a = small.generate(TtsArgs(text=long_text, seed=4, max_tokens=8))
    b = wide.generate(TtsArgs(text=long_text, seed=4, max_tokens=8))
    assert a.global_tokens == b.global_tokens
    assert a.semantic_tokens == b.semantic_tokens


def test_lm_program_matches_staged_path(engine):
    """The ONE-dispatch lm_program must produce token-identical output to
    the staged prefill→global→semantic path (it's the same programs
    inlined; the engines-stay-token-identical contract, CLAUDE.md)."""
    import numpy as np
    from rwkv_tts_tpu.runtime.engine import lm_program
    from rwkv_tts_tpu.utils.init import raw_threefry_key

    for zero_shot, kwargs in (
            (False, {}),
            (True, {"zero_shot": True,
                    "ref_global_tokens": list(range(32)),
                    "ref_semantic_tokens": [1, 2]})):
        args = TtsArgs(text="fused vs staged parity", seed=99,
                       max_tokens=12, **kwargs)
        res_fused = engine.generate(args)   # single-chunk prompt → fused

        # staged reference: replicate generate_batch's staged branch
        prompt, text_ids = engine.build_prompt(args)
        from rwkv_tts_tpu.runtime.engine import (global_stage,
                                                 semantic_stage, zs_hard_min)
        state = rwkv7.init_state(CFG, 1)
        logits, state = engine.prefill([prompt], state)
        limits = jnp.asarray([12], jnp.int32)
        hard_min = jnp.asarray(
            [zs_hard_min(len(text_ids)) if zero_shot else 0], jnp.int32)
        sem_keys = jnp.asarray(np.stack(
            [raw_threefry_key(99 + C.SEMANTIC_SEED_OFFSET)]))
        glob_keys = jnp.asarray(np.stack(
            [raw_threefry_key(99 + C.GLOBAL_SEED_OFFSET)]))
        if zero_shot:
            sem, sem_lens, _ = semantic_stage(
                engine.params, state, logits, sem_keys, limits, hard_min,
                CFG, ECFG.max_semantic_tokens, True, use_pallas=False)
        else:
            glob, state, logits = global_stage(
                engine.params, state, logits, glob_keys, CFG,
                use_pallas=False)
            sem, sem_lens, _ = semantic_stage(
                engine.params, state, logits, sem_keys, limits, hard_min,
                CFG, ECFG.max_semantic_tokens, False, use_pallas=False,
                feed_tag1=True)
            assert res_fused.global_tokens == [int(t) for t in
                                               np.asarray(glob)[0]]
        n = int(np.asarray(sem_lens)[0])
        assert res_fused.semantic_tokens == [
            int(t) for t in np.asarray(sem)[0, :n]]


def test_pow2_batch_padding_preserves_results(engine):
    """generate_batch pads to pow2 sizes (bounded compile set); padding
    must not change any real request's tokens vs running it alone."""
    reqs = [TtsArgs(text=f"pad test {i}", seed=100 + i, max_tokens=8)
            for i in range(3)]
    batched = engine.generate_batch(reqs)       # pads 3 → 4 internally
    assert len(batched) == 3
    for r, b in zip(reqs, batched):
        single = engine.generate(r)
        assert single.global_tokens == b.global_tokens
        assert single.semantic_tokens == b.semantic_tokens


def test_pow2_padding_respects_batch_cap():
    """Padding must never exceed engine_cfg.batch_size (an operator cap
    chosen against chip memory). With a non-pow2 cap, batches in
    (cap/2, cap] pad TO the cap — the compile set stays bounded at
    {pow2 ladder ≤ cap, cap} (ADVICE r3) — while over-cap batches run
    at their own size."""
    import dataclasses
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    eng = TtsEngine(params, CFG,
                    dataclasses.replace(ECFG, batch_size=3),
                    use_pallas=False)
    seen = []
    orig = eng.prefill

    def spy(prompts, state):
        seen.append(len(prompts))
        return orig(prompts, state)
    eng.prefill = spy
    # force the STAGED path so the spy observes the batch width
    reqs = [TtsArgs(text="cap " * 200, seed=i, max_tokens=4)
            for i in range(3)]
    out = eng.generate_batch(reqs)
    assert len(out) == 3
    assert all(b == 3 for b in seen), seen  # 3 → cap width 3 (no pow2 4)
    # over-half-cap batch (2 of cap 3): pow2 keeps it at 2
    seen.clear()
    out = eng.generate_batch(reqs[:2])
    assert len(out) == 2 and all(b == 2 for b in seen), seen
    # over-cap batch (5 > 3) runs at its own size, never padded up
    seen.clear()
    reqs5 = [TtsArgs(text="cap " * 200, seed=i, max_tokens=4)
             for i in range(5)]
    out = eng.generate_batch(reqs5)
    assert len(out) == 5 and all(b == 5 for b in seen), seen
