"""Sampler parity tests against a NumPy oracle that ports the reference
``sample_logits_with_top_p_k`` (src/rwkv_sampler.rs:55-211) literally."""

import numpy as np
import pytest

from rwkv_tts_tpu.ops.sampling import filtered_probs, sample_logits, sample_token


def oracle_filtered_probs(logits, temperature, top_p, top_k):
    """Literal NumPy port of rwkv_sampler.rs:55-171 (stops before the draw)."""
    logits = np.asarray(logits, np.float32)
    v = logits.shape[-1]
    m = logits.max()
    probs = np.exp(logits - m)
    s = probs.sum()
    if s > 0:
        probs = probs / s
    # top-k (stable descending sort, keep exactly k)
    if 0 < top_k < v:
        order = np.argsort(-probs, kind="stable")
        probs[order[top_k:]] = 0.0
    # top-p with tie redistribution
    if top_p < 1.0:
        order = np.argsort(-probs, kind="stable")
        cum, cutoff_prob, cutoff_found = 0.0, 0.0, False
        for i in order:
            cum += probs[i]
            if cum >= top_p:
                cutoff_prob = probs[i]
                cutoff_found = True
                break
        if cutoff_found:
            probs[probs < cutoff_prob] = 0.0
            if top_p > 0.0:
                cur = probs.sum()
                if cur < top_p:
                    n = int((probs == cutoff_prob).sum())
                    if n > 0:
                        probs[probs == cutoff_prob] = cutoff_prob + (top_p - cur) / n
    # temperature
    if temperature != 1.0 and temperature > 0.0:
        nz = probs > 0
        probs[nz] = probs[nz] ** (1.0 / temperature)
        s = probs.sum()
        if s > 0:
            probs = probs / s
    return probs


@pytest.mark.parametrize("top_k,top_p,temp", [
    (20, 0.95, 1.0),     # global stage preset
    (80, 0.95, 1.0),     # semantic stage preset
    (100, 0.8, 1.0),
    (50, 0.95, 0.7),
    (0, 1.0, 1.0),       # no truncation
    (10, 0.5, 1.3),
])
def test_filtered_probs_matches_oracle(top_k, top_p, temp):
    rng = np.random.default_rng(0)
    for trial in range(5):
        logits = rng.normal(0, 3, size=4096).astype(np.float32)
        ours = np.array(filtered_probs(logits, temp, top_p, top_k))
        ref = oracle_filtered_probs(logits.copy(), temp, top_p, top_k)
        # compare supports and values
        np.testing.assert_array_equal(ours > 0, ref > 0,
                                      err_msg=f"support mismatch trial {trial}")
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-7)


def test_masked_logits_never_sampled():
    import jax
    logits = np.zeros(1024, np.float32)
    logits[100:] = -np.inf       # only ids < 100 allowed
    for seed in range(20):
        tok = int(sample_logits(logits, jax.random.PRNGKey(seed), 1.0, 0.95, 80))
        assert tok < 100


def test_greedy_limit():
    # top_k=1 must be argmax regardless of the draw
    import jax
    rng = np.random.default_rng(1)
    logits = rng.normal(0, 3, size=512).astype(np.float32)
    for seed in range(5):
        tok = int(sample_logits(logits, jax.random.PRNGKey(seed), 1.0, 0.95, 1))
        assert tok == int(np.argmax(logits))


def test_sample_token_inverse_cdf_semantics():
    import jax
    probs = np.array([0.0, 0.5, 0.0, 0.25, 0.25], np.float32)
    counts = np.zeros(5)
    for seed in range(400):
        t = int(sample_token(probs, jax.random.PRNGKey(seed)))
        counts[t] += 1
    assert counts[0] == 0 and counts[2] == 0
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq[[1, 3, 4]], [0.5, 0.25, 0.25], atol=0.08)


def test_deterministic_given_key():
    import jax
    logits = np.random.default_rng(2).normal(0, 2, 8192).astype(np.float32)
    a = int(sample_logits(logits, jax.random.PRNGKey(7), 1.0, 0.95, 80))
    b = int(sample_logits(logits, jax.random.PRNGKey(7), 1.0, 0.95, 80))
    assert a == b


def test_batched_shapes():
    import jax
    logits = np.random.default_rng(3).normal(0, 2, (8, 4096)).astype(np.float32)
    toks = sample_logits(logits, jax.random.PRNGKey(0), 1.0, 0.95, 20)
    assert toks.shape == (8,)
    assert all(0 <= int(t) < 4096 for t in toks)


def test_apply_penalties_semantics():
    import jax.numpy as jnp
    from rwkv_tts_tpu.ops.sampling import apply_penalties
    logits = np.array([2.0, -1.0, 0.5, 3.0], np.float32)
    counts = np.array([2, 1, 0, 0], np.int32)
    out = np.asarray(apply_penalties(jnp.asarray(logits), jnp.asarray(counts),
                                     repetition_penalty=2.0))
    # positive logit with 2 occurrences: /2^2 ; negative: *2^1 ; untouched rest
    np.testing.assert_allclose(out, [0.5, -2.0, 0.5, 3.0])
    out = np.asarray(apply_penalties(jnp.asarray(logits), jnp.asarray(counts),
                                     frequency_penalty=0.5))
    np.testing.assert_allclose(out, [1.0, -1.5, 0.5, 3.0])
    out = np.asarray(apply_penalties(jnp.asarray(logits), jnp.asarray(counts),
                                     presence_penalty=0.25))
    np.testing.assert_allclose(out, [1.75, -1.25, 0.5, 3.0])


def test_sampling_strategies():
    import jax
    from rwkv_tts_tpu.ops.sampling import SamplingStrategy, sample_with_strategy
    logits = np.random.default_rng(0).normal(0, 2, 512).astype(np.float32)
    key = jax.random.PRNGKey(0)
    assert int(sample_with_strategy(logits, key, SamplingStrategy("greedy"))) \
        == int(np.argmax(logits))
    t1 = int(sample_with_strategy(logits, key, SamplingStrategy("top_k", top_k=1)))
    assert t1 == int(np.argmax(logits))
    for kind in ("top_p", "temperature", "mixed"):
        tok = int(sample_with_strategy(logits, key, SamplingStrategy(kind)))
        assert 0 <= tok < 512
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sample_with_strategy(logits, key, SamplingStrategy("bogus"))


def test_voice_fidelity_adjustment_formula():
    """Formula parity with rwkv_sampler.rs:515-543: high fidelity + low
    randomness shrinks temperature/top_p/top_k; zero fidelity is identity."""
    from rwkv_tts_tpu.ops.sampling import (LayeredRandomnessConfig,
                                           apply_voice_fidelity_adjustment)

    # identity when conservative factor is 0
    t, p, k = apply_voice_fidelity_adjustment(1.0, 0.95, 80, 0.0, 0.4)
    assert (t, p, k) == (1.0, 0.95, 80)
    # reference defaults: fidelity .8, semantic randomness .4 → factor .48
    t, p, k = apply_voice_fidelity_adjustment(1.0, 0.95, 80, 0.8, 0.4)
    assert abs(t - (0.5 + 0.5 * 0.52)) < 1e-6
    assert abs(p - 0.95 * (0.7 + 0.3 * 0.52)) < 1e-6
    assert k == int(80 * (0.5 + 0.5 * 0.52))
    # top_k floor is 1; top_k 0 (disabled) passes through
    assert apply_voice_fidelity_adjustment(1.0, 1.0, 1, 1.0, 0.0)[2] == 1
    assert apply_voice_fidelity_adjustment(1.0, 1.0, 0, 1.0, 0.0)[2] == 0
    # defaults mirror rwkv_sampler.rs:265-277
    cfg = LayeredRandomnessConfig()
    assert (cfg.global_seed_offset, cfg.semantic_seed_offset) == (1000, 2000)
    assert cfg.use_independent_seeds
