"""Multi-device sharded decode on the 8-device virtual CPU mesh.

Validates the §2.4 scale-out story end-to-end (not just compile): batch/state
sharded over the ``data`` axis and vocab-dim weights over ``model``, with
results identical to the unsharded program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tts_tpu.config import RwkvConfig
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.parallel import mesh as meshlib
from rwkv_tts_tpu.runtime.engine import global_stage, semantic_stage

CFG = RwkvConfig(
    n_layer=2, n_embd=128, head_size=64, vocab_size=77923,
    padded_vocab_size=78080, decay_lora=32, a_lora=32, v_lora=16,
    gate_lora=32, dtype="float32", param_dtype="float32",
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(0))
    B, T = 8, 16
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 70000)
    lengths = jnp.asarray([16, 9, 12, 16, 5, 7, 16, 11], jnp.int32)
    keys = jnp.asarray(np.stack(
        [np.array([0, s], np.uint32) for s in range(B)]))
    return params, tokens, lengths, keys


def _run(params, tokens, lengths, keys):
    state = rwkv7.init_state(CFG, tokens.shape[0])
    if hasattr(params, "keys"):
        pass
    logits, state = rwkv7.forward(params, tokens, state, CFG, lengths=lengths)
    glob, state, logits = global_stage(params, state, logits, keys, CFG)
    limits = jnp.full((tokens.shape[0],), 12, jnp.int32)
    hard_min = jnp.zeros_like(limits)
    sem, sem_lens, _ = semantic_stage(params, state, logits, keys, limits,
                                      hard_min, CFG, 12, False)
    return np.asarray(glob), np.asarray(sem), np.asarray(sem_lens)


def test_data_parallel_matches_unsharded(setup):
    params, tokens, lengths, keys = setup
    want = _run(params, tokens, lengths, keys)

    m = meshlib.make_mesh(8, model_parallel=1)
    sp = meshlib.shard_params(m, params)
    st = jax.device_put(tokens, meshlib.batch_sharding(m, 2))
    sl = jax.device_put(lengths, meshlib.batch_sharding(m, 1))
    sk = jax.device_put(keys, meshlib.batch_sharding(m, 2))
    got = _run(sp, st, sl, sk)

    for a, b, name in zip(got, want, ("global", "semantic", "lens")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_tensor_parallel_matches_unsharded(setup):
    params, tokens, lengths, keys = setup
    want = _run(params, tokens, lengths, keys)

    m = meshlib.make_mesh(8, model_parallel=2)   # data=4 × model=2
    sp = meshlib.shard_params(m, params)
    st = jax.device_put(tokens, meshlib.batch_sharding(m, 2))
    sl = jax.device_put(lengths, meshlib.batch_sharding(m, 1))
    sk = jax.device_put(keys, meshlib.batch_sharding(m, 2))
    got = _run(sp, st, sl, sk)

    # float reductions across shards can reorder; token equality is the bar
    for a, b, name in zip(got, want, ("global", "semantic", "lens")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_sharded_continuous_token_identical(setup):
    """Continuous decode with state/slots sharded over the data axis (and
    the vocab head over model) must produce token streams bit-identical to
    the single-device static engine — the r1 'multi-device serving'
    stretch: admission scatter + per-slot stage machine under sharding."""
    from rwkv_tts_tpu.config import EngineConfig, TtsArgs
    from rwkv_tts_tpu.runtime.continuous import ContinuousEngine
    from rwkv_tts_tpu.runtime.engine import TtsEngine

    params, _, _, _ = setup
    ecfg = EngineConfig(prefill_buckets=(32, 64), max_semantic_tokens=20,
                        batch_size=4)
    reqs = [
        TtsArgs(text="sharded continuous one", seed=11, max_tokens=20),
        TtsArgs(text="two", seed=22, max_tokens=20, gender="male"),
        TtsArgs(text="cloned three", seed=33, max_tokens=20, zero_shot=True,
                ref_global_tokens=list(range(32))),
    ]

    static = TtsEngine(params, CFG, ecfg, use_pallas=False)
    want = [static.generate(r) for r in reqs]

    m = meshlib.make_mesh(8, model_parallel=2)      # dp=4 × tp=2
    eng = ContinuousEngine(params, CFG, ecfg, use_pallas=False, block=8,
                           slots=4, mesh=m)
    try:
        got = [eng.generate(r, timeout=900.0) for r in reqs]
    finally:
        eng.stop()

    for w, g, r in zip(want, got, reqs):
        assert g.global_tokens == w.global_tokens, r.text
        assert g.semantic_tokens == w.semantic_tokens, r.text
