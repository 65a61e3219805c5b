"""Golden-token regression fixtures.

The reference ships no golden outputs (SURVEY.md §4: its only fixture is a
captured error response); we create our own. A tiny fixed-seed model's token
outputs for fixed requests are recorded in ``goldens.json`` — any behavioral
drift in the tokenizer, prompt assembly, model math, sampler or engines
changes these sequences and fails here.

Regenerate intentionally with:  REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
"""

import json
import os

import jax
import pytest

from rwkv_tts_tpu.config import EngineConfig, RwkvConfig, TtsArgs
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.runtime.engine import TtsEngine

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")

CFG = RwkvConfig(
    n_layer=2, n_embd=128, head_size=64, vocab_size=77923,
    padded_vocab_size=78080, decay_lora=32, a_lora=32, v_lora=16,
    gate_lora=32, dtype="float32", param_dtype="float32",
)
ECFG = EngineConfig(prefill_buckets=(64, 128), max_semantic_tokens=16)

REQUESTS = {
    "normal_seed42": TtsArgs(text="golden fixture text", seed=42, max_tokens=16),
    "normal_chinese": TtsArgs(text="你好世界", seed=7, max_tokens=16,
                              gender="male", emotion="HAPPY", speed="fast"),
    "zero_shot": TtsArgs(text="clone fixture", seed=3, zero_shot=True,
                         max_tokens=16, ref_global_tokens=list(range(32)),
                         ref_semantic_tokens=[1, 2, 3]),
    # long enough that the 12-step EOS window fills and the acceptance /
    # masked-resample branches of the gate are exercised
    # (zero_shot_inference.rs:219-309)
    "zero_shot_window": TtsArgs(text="w", seed=11, zero_shot=True,
                                max_tokens=48,
                                ref_global_tokens=[5] * 32),
}


@pytest.fixture(scope="module")
def engine():
    params = rwkv7.init_params(CFG, jax.random.PRNGKey(1234))
    return TtsEngine(params, CFG, ECFG, use_pallas=False)


def compute(engine):
    out = {}
    for name, req in REQUESTS.items():
        res = engine.generate(req)
        out[name] = {"global": res.global_tokens,
                     "semantic": res.semantic_tokens}
    return out


def test_golden_tokens(engine):
    got = compute(engine)
    if os.environ.get("REGEN_GOLDENS") == "1":
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1)
        pytest.skip("goldens regenerated")
    # a missing fixture file is a FAILURE, not an excuse to regenerate:
    # otherwise a fresh checkout silently loses the regression gate
    assert os.path.exists(GOLDEN_PATH), (
        "goldens.json missing — restore it from git, or regenerate "
        "intentionally with REGEN_GOLDENS=1"
    )
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    assert set(got) == set(want)
    for name in want:
        assert got[name]["global"] == want[name]["global"], name
        assert got[name]["semantic"] == want[name]["semantic"], name


PARITY_GOLDEN_PATH = os.path.join(os.path.dirname(__file__),
                                  "goldens_parity.json")

PARITY_REQUESTS = {
    "normal_seed42": TtsArgs(text="golden fixture text", seed=42,
                             max_tokens=10),
    "cloning_seed0": TtsArgs(text="clone fixture", seed=0, zero_shot=True,
                             max_tokens=10,
                             ref_global_tokens=list(range(32)),
                             ref_semantic_tokens=[1, 2, 3]),
}


def test_parity_engine_golden_tokens(engine):
    """Pinned draw sequences of the reference-RNG parity engine
    (runtime/parity.py) — the true-A/B switch must not drift: any change
    to the StdRng bitstream, the Rust-order sampler, or the loop quirks
    changes these tokens. Regenerate ONLY for intentional behavior
    changes (REGEN_GOLDENS=1)."""
    from rwkv_tts_tpu.runtime.parity import ReferenceRngEngine

    pe = ReferenceRngEngine(engine)
    got = {}
    for name, req in PARITY_REQUESTS.items():
        res = pe.generate(req)
        got[name] = {"global": res.global_tokens,
                     "semantic": res.semantic_tokens}
    if os.environ.get("REGEN_GOLDENS") == "1":
        with open(PARITY_GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1)
        pytest.skip("parity goldens regenerated")
    assert os.path.exists(PARITY_GOLDEN_PATH), (
        "goldens_parity.json missing — restore from git or regenerate "
        "intentionally with REGEN_GOLDENS=1")
    with open(PARITY_GOLDEN_PATH) as f:
        want = json.load(f)
    assert set(got) == set(want)
    for name in want:
        assert got[name]["global"] == want[name]["global"], name
        assert got[name]["semantic"] == want[name]["semantic"], name
