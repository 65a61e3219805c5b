"""Tensor-parallel decode step (parallel/tp.py) on the virtual CPU mesh:
layer weights sharded over the model axis must reproduce the unsharded
step's logits/state/tokens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.parallel import mesh as meshlib
from rwkv_tts_tpu.parallel import tp

CFG = RwkvConfig(
    n_layer=2, n_embd=256, head_size=64, vocab_size=1000,
    padded_vocab_size=1024, decay_lora=32, a_lora=32, v_lora=16,
    gate_lora=32, dtype="float32", param_dtype="float32",
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    B = 8
    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (4, B), 0, 1000))
    return params, tokens


def _reference(params, tokens):
    state = rwkv7.init_state(CFG, tokens.shape[1])
    outs = []
    for t in tokens:
        logits, state = rwkv7.step(params, jnp.asarray(t), state, CFG)
        outs.append(np.asarray(logits))
    return outs, state


@pytest.mark.parametrize("mp", [2, 4])
def test_step_tp_matches_unsharded(setup, mp):
    params, tokens = setup
    want, want_state = _reference(params, tokens)

    m = meshlib.make_mesh(8, model_parallel=mp)
    sp = tp.shard_params_tp(m, params)
    state = tp.shard_state_tp(m, rwkv7.init_state(CFG, tokens.shape[1]))
    for i, t in enumerate(tokens):
        logits, state = tp.step_tp(sp, jnp.asarray(t), state, CFG, m)
        got = np.asarray(logits)
        # psum partial-sum order reorders the f32 contraction — closeness
        # plus token agreement is the bar (same as the CPU-vs-TPU class)
        np.testing.assert_allclose(got, want[i], rtol=1e-2, atol=1e-3,
                                   err_msg=f"step {i}")
        np.testing.assert_array_equal(got.argmax(-1), want[i].argmax(-1))
    for k in ("att_x", "ffn_x", "wkv"):
        np.testing.assert_allclose(
            np.asarray(state[k]), np.asarray(want_state[k]),
            rtol=1e-2, atol=1e-3, err_msg=k)


def test_step_tp_head_slice(setup):
    params, tokens = setup
    m = meshlib.make_mesh(8, model_parallel=2)
    sp = tp.shard_params_tp(m, params)
    state = tp.shard_state_tp(m, rwkv7.init_state(CFG, tokens.shape[1]))
    logits, _ = tp.step_tp(sp, jnp.asarray(tokens[0]), state, CFG, m,
                           head_slice=512)
    assert logits.shape == (tokens.shape[1], 512)
    full, _ = tp.step_tp(sp, jnp.asarray(tokens[0]), state, CFG, m)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full)[:, :512], rtol=1e-5)


def test_tp_full_generation_token_identical(setup):
    """The first-chunk path end-to-end under TP: masked variable-length
    prefill (forward_tp) → 32-token global stage → semantic stage with
    TAG_1 folded in, through the production stages via their step_fn hook.
    Token streams must match the unsharded engine stages."""
    from rwkv_tts_tpu.runtime.engine import global_stage, semantic_stage

    params, _ = setup
    B, T = 8, 16
    tokens = jax.random.randint(jax.random.PRNGKey(7), (B, T), 0, 1000)
    lengths = jnp.asarray([16, 9, 12, 16, 5, 7, 16, 11], jnp.int32)
    keys = jnp.asarray(np.stack(
        [np.array([0, s], np.uint32) for s in range(B)]))
    limits = jnp.full((B,), 10, jnp.int32)
    hard_min = jnp.zeros((B,), jnp.int32)

    def run(prefill, stage_params, step_fn=None, **put):
        state = rwkv7.init_state(CFG, B)
        if "state" in put:
            state = put["state"](state)
        logits, state = prefill(state)
        glob, state, lg = global_stage(stage_params, state, logits, keys,
                                       CFG, step_fn=step_fn)
        sem, lens, _ = semantic_stage(stage_params, state, lg, keys, limits,
                                      hard_min, CFG, 10, False,
                                      feed_tag1=True, step_fn=step_fn)
        return np.asarray(glob), np.asarray(sem), np.asarray(lens)

    want = run(lambda st: rwkv7.forward(params, tokens, st, CFG,
                                        lengths=lengths), params)

    m = meshlib.make_mesh(8, model_parallel=2)
    sp = tp.shard_params_tp(m, params)
    stok = jax.device_put(tokens, meshlib.batch_sharding(m, 2))
    slen = jax.device_put(lengths, meshlib.batch_sharding(m, 1))
    step_fn = tp.make_step_fn(CFG, m)
    got = run(lambda st: tp.forward_tp(sp, stok, st, CFG, m, lengths=slen),
              sp, step_fn=step_fn,
              state=lambda st: tp.shard_state_tp(m, st))

    for a, b, name in zip(got, want, ("global", "semantic", "lens")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_tts_engine_tp_mesh_token_identical(setup):
    """TtsEngine(tp_mesh=...) — the serving-level wiring — must produce
    the same tokens as the plain engine for both modes."""
    from rwkv_tts_tpu.config import EngineConfig, TtsArgs
    from rwkv_tts_tpu.runtime.engine import TtsEngine

    params, _ = setup
    ecfg = EngineConfig(prefill_buckets=(32, 64), max_semantic_tokens=16)
    reqs = [
        TtsArgs(text="tensor parallel serving", seed=5, max_tokens=16),
        TtsArgs(text="two", seed=6, max_tokens=16, gender="male"),
        TtsArgs(text="three voices", seed=7, max_tokens=16),
        TtsArgs(text="four", seed=8, max_tokens=16, pitch="high_pitch"),
    ]
    zs = [TtsArgs(text="cloned speech", seed=9, max_tokens=16,
                  zero_shot=True, ref_global_tokens=list(range(32)))] * 4

    base = TtsEngine(params, CFG, ecfg, use_pallas=False)
    m = meshlib.make_mesh(8, model_parallel=2)
    tpe = TtsEngine(params, CFG, ecfg, tp_mesh=m)

    # uneven batches pad to the data axis and trim (server sends B=1)
    for batch in (reqs, zs, reqs[:1], reqs[:3]):
        want = base.generate_batch(batch)
        got = tpe.generate_batch(batch)
        assert len(got) == len(batch)
        for w, g in zip(want, got):
            assert w.global_tokens == g.global_tokens
            assert w.semantic_tokens == g.semantic_tokens


def test_tp_speaker_enrollment_token_identical(setup):
    """generate_speaker_tokens under a dp>1 mesh pads the B=1 enrollment
    prompt to the data-axis width (r4 advisor medium: an unpadded batch
    of 1 cannot shard dim-0 over dp>1, so a cached-speaker cache miss
    crashed under --tp serving) and must stay token-identical to the
    plain engine."""
    from rwkv_tts_tpu.config import EngineConfig, TtsArgs
    from rwkv_tts_tpu.runtime.engine import TtsEngine

    params, _ = setup
    ecfg = EngineConfig(prefill_buckets=(32, 64), max_semantic_tokens=16)
    base = TtsEngine(params, CFG, ecfg, use_pallas=False)
    m = meshlib.make_mesh(8, model_parallel=2)   # data axis = 4
    tpe = TtsEngine(params, CFG, ecfg, tp_mesh=m)

    args = TtsArgs(text="", gender="male", pitch="high_pitch")
    want = base.generate_speaker_tokens(args, seed=3)
    got = tpe.generate_speaker_tokens(args, seed=3)
    assert len(want) == 32
    assert got == want


def test_step_tp_int8_matches_unsharded_int8(setup):
    """The int8 serving layout shards too: q like its float tensor,
    per-out-channel scales per orientation. Row-parallel activation
    quantization uses the local row absmax (vs global unsharded), so the
    bar is closeness + argmax agreement."""
    from rwkv_tts_tpu.ops.quant import quantize_rwkv_params

    params, tokens = setup
    qp = quantize_rwkv_params(params, kind="int8")
    want, _ = _reference(qp, tokens[:1])
    f32_want, _ = _reference(params, tokens[:1])
    # the quality envelope the user accepted by choosing int8:
    noise_floor = np.abs(want[0] - f32_want[0]).max()

    m = meshlib.make_mesh(8, model_parallel=2)
    sp = tp.shard_params_tp(m, qp)
    state = tp.shard_state_tp(m, rwkv7.init_state(CFG, tokens.shape[1]))
    logits, _ = tp.step_tp(sp, jnp.asarray(tokens[0]), state, CFG, m)
    got = np.asarray(logits)
    # sharded-int8 re-grids the row-parallel activation quantization, so
    # it deviates from unsharded int8 — but must stay WELL inside the
    # int8-vs-f32 envelope (measured ~7x inside; gate at half)
    dev = np.abs(got - want[0]).max()
    assert dev < 0.5 * noise_floor, (dev, noise_floor)
    # random tiny-model logits are near-flat; trained-model margins are
    # far larger than this deviation
    assert (got.argmax(-1) == want[0].argmax(-1)).mean() >= 0.75


def test_tp_weight_bytes_per_device_shrink(setup):
    """The point of the module: each model-shard holds ~1/tp of the layer
    weights (the decode step's weight stream)."""
    params, _ = setup
    m = meshlib.make_mesh(8, model_parallel=4)
    sp = tp.shard_params_tp(m, params)

    def shard_bytes(x):
        db = x.sharding.shard_shape(x.shape)
        return int(np.prod(db)) * x.dtype.itemsize

    big = ("w_r", "w_k", "w_v", "w_o", "ffn_k", "ffn_v")
    for name in big:
        x = sp["blocks"][name]
        assert shard_bytes(x) * 4 == x.nbytes, name
    assert shard_bytes(sp["head"]) * 4 == sp["head"].nbytes
