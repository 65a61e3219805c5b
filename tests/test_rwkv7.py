"""RWKV-7 model invariants: prefill/step equivalence, chunking, shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7

CFG = RwkvConfig(
    n_layer=3, n_embd=128, head_size=64, vocab_size=1000,
    padded_vocab_size=1024, decay_lora=32, a_lora=32, v_lora=16,
    gate_lora=32, dtype="float32", param_dtype="float32",
)


@pytest.fixture(scope="module")
def params():
    return rwkv7.init_params(CFG, jax.random.PRNGKey(0))


def test_forward_shapes(params):
    B, T = 2, 12
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, CFG.vocab_size)
    state = rwkv7.init_state(CFG, B)
    logits, new_state = rwkv7.forward(params, tokens, state, CFG)
    assert logits.shape == (B, CFG.padded_vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))
    assert new_state["wkv"].shape == (CFG.n_layer, B, 2, 64, 64)
    full, _ = rwkv7.forward(params, tokens, state, CFG, last_only=False)
    assert full.shape == (B, T, CFG.padded_vocab_size)
    np.testing.assert_allclose(np.array(full[:, -1]), np.array(logits),
                               rtol=1e-5, atol=1e-5)


def test_prefill_equals_stepwise(params):
    """forward() over a sequence must equal iterated step() — the contract
    that makes chunked prefill + incremental decode interchangeable."""
    B, T = 2, 10
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, CFG.vocab_size)
    state = rwkv7.init_state(CFG, B)
    logits_seq, state_seq = rwkv7.forward(params, tokens, state, CFG)

    state_it = rwkv7.init_state(CFG, B)
    for t in range(T):
        logits_it, state_it = rwkv7.step(params, tokens[:, t], state_it, CFG)

    np.testing.assert_allclose(np.array(logits_it), np.array(logits_seq),
                               rtol=2e-4, atol=2e-4)
    for k in state_seq:
        np.testing.assert_allclose(np.array(state_it[k]), np.array(state_seq[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_chunked_prefill_equals_full(params):
    B, T = 1, 16
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0, CFG.vocab_size)
    state = rwkv7.init_state(CFG, B)
    logits_full, state_full = rwkv7.forward(params, tokens, state, CFG)

    state_c = rwkv7.init_state(CFG, B)
    _, state_c = rwkv7.forward(params, tokens[:, :7], state_c, CFG)
    logits_c, state_c = rwkv7.forward(params, tokens[:, 7:], state_c, CFG)

    np.testing.assert_allclose(np.array(logits_c), np.array(logits_full),
                               rtol=2e-4, atol=2e-4)
    for k in state_full:
        np.testing.assert_allclose(np.array(state_c[k]), np.array(state_full[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_state_isolation_across_batch(params):
    """Each batch slot's state evolves independently (the per-request
    isolation the reference enforces via per-slot GPU states)."""
    tok_a = jnp.array([[5, 7, 9]])
    tok_b = jnp.array([[100, 200, 300]])
    sa = rwkv7.init_state(CFG, 1)
    la, sa = rwkv7.forward(params, tok_a, sa, CFG)

    both = jnp.concatenate([tok_a, tok_b], 0)
    sb = rwkv7.init_state(CFG, 2)
    lb, sb = rwkv7.forward(params, both, sb, CFG)

    np.testing.assert_allclose(np.array(lb[0]), np.array(la[0]),
                               rtol=1e-5, atol=1e-5)
    for k in sa:
        np.testing.assert_allclose(np.array(sb[k][:, 0]), np.array(sa[k][:, 0]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_determinism(params):
    tokens = jnp.array([[1, 2, 3, 4]])
    s = rwkv7.init_state(CFG, 1)
    l1, _ = rwkv7.forward(params, tokens, s, CFG)
    l2, _ = rwkv7.forward(params, tokens, s, CFG)
    np.testing.assert_array_equal(np.array(l1), np.array(l2))


def test_masked_ragged_prefill_equals_individual(params):
    """Right-padded variable-length batched prefill must equal per-request
    unpadded prefill (state and last-token logits)."""
    seqs = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8, 9, 7, 9, 3]]
    B, T = len(seqs), 8
    toks = np.zeros((B, T), np.int64)
    for i, s in enumerate(seqs):
        toks[i, :len(s)] = s
    lengths = jnp.asarray([len(s) for s in seqs], jnp.int32)
    state = rwkv7.init_state(CFG, B)
    logits_b, state_b = rwkv7.forward(params, jnp.asarray(toks), state, CFG,
                                      lengths=lengths)
    for i, s in enumerate(seqs):
        st = rwkv7.init_state(CFG, 1)
        logit_i, st = rwkv7.forward(params, jnp.asarray([s]), st, CFG)
        np.testing.assert_allclose(np.array(logits_b[i]), np.array(logit_i[0]),
                                   rtol=2e-4, atol=2e-4)
        for k in st:
            np.testing.assert_allclose(np.array(state_b[k][:, i]),
                                       np.array(st[k][:, 0]),
                                       rtol=2e-4, atol=2e-4, err_msg=k)


def test_zero_length_slot_untouched(params):
    toks = jnp.array([[1, 2, 3], [7, 7, 7]])
    lengths = jnp.asarray([3, 0], jnp.int32)
    state = rwkv7.init_state(CFG, 2)
    _, new_state = rwkv7.forward(params, toks, state, CFG, lengths=lengths)
    for k in state:
        np.testing.assert_array_equal(np.array(new_state[k][:, 1]),
                                      np.array(state[k][:, 1]), err_msg=k)


def test_bf16_state_dtype_runs():
    """Opt-in bf16 WKV state: runs, keeps dtype through steps, stays close
    to the f32 path over a short horizon."""
    import dataclasses
    cfg16 = dataclasses.replace(CFG, state_dtype="bfloat16")
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    toks = jnp.array([[5, 9, 250, 3, 77]])
    s32 = rwkv7.init_state(CFG, 1)
    s16 = rwkv7.init_state(cfg16, 1)
    assert s16["wkv"].dtype == jnp.bfloat16
    l32, s32 = rwkv7.forward(params, toks, s32, CFG)
    l16, s16 = rwkv7.forward(params, toks, s16, cfg16)
    assert s16["wkv"].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(l16), np.asarray(l32),
                               rtol=0.1, atol=0.25)
    l16b, s16 = rwkv7.step(params, jnp.array([4]), s16, cfg16)
    assert s16["wkv"].dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(l16b)))


def test_fused_projections_match_unfused():
    """fuse_params folds the 7 per-token projections into 2 matmuls +
    a block-diagonal LoRA stage; outputs must match the unfused path to
    fp32-reassociation tolerance on both forward (prefill) and step
    (decode), and the fused tree must quantize."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkv_tts_tpu.config import RwkvConfig
    from rwkv_tts_tpu.models import rwkv7

    cfg = RwkvConfig(n_layer=3, n_embd=128, head_size=64, vocab_size=512,
                     padded_vocab_size=512, decay_lora=16, a_lora=24,
                     v_lora=8, gate_lora=32, dtype="float32",
                     param_dtype="float32")
    params = rwkv7.init_params(cfg, jax.random.PRNGKey(0))
    fused = rwkv7.fuse_params(params, cfg)
    assert "zrkv" in fused["blocks"] and "w_r" not in fused["blocks"]

    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 512)
    st0 = rwkv7.init_state(cfg, 2)
    want_lg, want_st = rwkv7.forward(params, tokens, st0, cfg)
    got_lg, got_st = rwkv7.forward(fused, tokens, st0, cfg)
    np.testing.assert_allclose(np.asarray(got_lg), np.asarray(want_lg),
                               rtol=2e-4, atol=2e-4)
    for k in want_st:
        np.testing.assert_allclose(np.asarray(got_st[k]),
                                   np.asarray(want_st[k]),
                                   rtol=2e-4, atol=2e-4)

    tok = jnp.asarray([3, 5], jnp.int32)
    want_lg2, _ = rwkv7.step(params, tok, want_st, cfg)
    got_lg2, _ = rwkv7.step(fused, tok, got_st, cfg)
    np.testing.assert_allclose(np.asarray(got_lg2), np.asarray(want_lg2),
                               rtol=2e-4, atol=2e-4)

    # quantized fused tree runs end to end
    from rwkv_tts_tpu.ops.quant import quantize_rwkv_params
    qf = quantize_rwkv_params(fused)
    assert isinstance(qf["blocks"]["zrkv"], dict)      # quantized leaf
    lg_q, _ = rwkv7.step(qf, tok, got_st, cfg)
    assert lg_q.shape == want_lg2.shape
    assert bool(jnp.all(jnp.isfinite(lg_q)))


def test_step_fused_serving_path_matches_unfused(monkeypatch):
    """The serving decode step (bt-active batch + fused projections) must
    produce the same logits/state through the fused soup kernel as through
    the unfused XLA chain. Kernel runs in interpret mode on CPU."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkv_tts_tpu.config import RwkvConfig
    from rwkv_tts_tpu.models import rwkv7
    from rwkv_tts_tpu.ops import wkv7 as wkv7mod

    cfg = RwkvConfig(n_layer=2, n_embd=64, head_size=16, vocab_size=512,
                     padded_vocab_size=512, decay_lora=16, a_lora=16,
                     v_lora=16, gate_lora=16, dtype="float32",
                     param_dtype="float32")
    B = 64                                    # >= BT_MIN_BATCH
    params = rwkv7.fuse_params(
        rwkv7.init_params(cfg, jax.random.PRNGKey(0)), cfg)
    tok = jnp.asarray(np.arange(B) % 500, jnp.int32)
    state = rwkv7.init_state(cfg, B)

    # warm the state so v_first/group-norm paths see non-trivial values
    _, state = rwkv7.step(params, tok, state, cfg, use_pallas=False)

    want_logits, want_state = rwkv7.step(params, tok, state, cfg,
                                         use_pallas=False)

    monkeypatch.setattr(rwkv7, "STEP_FUSED", True)   # default off (PERF.md)
    monkeypatch.setattr(
        wkv7mod, "wkv7_step_fused_bt_pallas",
        functools.partial(wkv7mod.wkv7_step_fused_bt_pallas,
                          interpret=True))
    st_bt = rwkv7.state_to_bt(state)
    got_logits, got_state = rwkv7.step(params, tok, st_bt, cfg,
                                       use_pallas=True)
    got_state = rwkv7.state_from_bt(got_state)

    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_state["wkv"]),
                               np.asarray(want_state["wkv"]),
                               rtol=2e-3, atol=2e-3)


def test_bt_fold_factor():
    """bt_fold: largest pow-2 divisor of H with g·B <= 128 — so the folded
    lane dim is always as full as the head count allows."""
    assert rwkv7.bt_fold(32, 128) == 1
    assert rwkv7.bt_fold(32, 64) == 2
    assert rwkv7.bt_fold(32, 32) == 4
    assert rwkv7.bt_fold(32, 16) == 8
    assert rwkv7.bt_fold(32, 8) == 16
    assert rwkv7.bt_fold(32, 1) == 32      # capped by H
    assert rwkv7.bt_fold(32, 24) == 4      # non-pow2 batch: 4*24=96 <= 128
    assert rwkv7.bt_fold(2, 2) == 2
    assert rwkv7.bt_fold(32, 256) == 1     # B past the lane width: no fold


def test_state_bt_fold_round_trip():
    """state_to_bt(g)/state_from_bt(g) invert for every fold, and g=1
    equals the historical pure batch-in-lanes moveaxis layout."""
    rng = np.random.default_rng(5)
    L, B, H, N = 3, 8, 4, 8
    state = {
        "att_x": jnp.asarray(rng.normal(size=(L, B, 16)), jnp.float32),
        "ffn_x": jnp.asarray(rng.normal(size=(L, B, 16)), jnp.float32),
        "wkv": jnp.asarray(rng.normal(size=(L, B, H, N, N)), jnp.float32),
    }
    legacy = np.moveaxis(np.asarray(state["wkv"]), 1, -1)
    np.testing.assert_array_equal(
        np.asarray(rwkv7.state_to_bt(state, 1)["wkv"]), legacy)
    for g in (1, 2, 4):
        folded = rwkv7.state_to_bt(state, g)
        assert folded["wkv"].shape == (L, H // g, N, N, g * B)
        back = rwkv7.state_from_bt(folded, g)
        np.testing.assert_array_equal(np.asarray(back["wkv"]),
                                      np.asarray(state["wkv"]))
        # att_x/ffn_x ride along untouched
        np.testing.assert_array_equal(np.asarray(folded["att_x"]),
                                      np.asarray(state["att_x"]))
    # lanes really hold (head-in-group, batch): folded[l, h0, i, j, h1*B+b]
    # == state[l, b, h0*g + h1, i, j]
    g = 2
    f = np.asarray(rwkv7.state_to_bt(state, g)["wkv"])
    s = np.asarray(state["wkv"])
    for h1 in range(g):
        for b in (0, 3, B - 1):
            np.testing.assert_array_equal(
                f[:, 1, :, :, h1 * B + b], s[:, b, g + h1])
