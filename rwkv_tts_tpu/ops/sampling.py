"""On-device token sampling: softmax → top-k → top-p → temperature → multinomial.

Behavioral port of the reference sampler ``sample_logits_with_top_p_k``
(``src/rwkv_sampler.rs:55-211``), which itself mirrors the Python
``sample_logits``.  The whole pipeline runs inside the jitted decode step —
the autoregressive loop never leaves the chip, which removes the reference's
per-token GPU→CPU logits roundtrip + host-side sort (its hottest path,
SURVEY.md §3.5).

Order of operations (must match the reference exactly):
  1. softmax over the (masked) logits;
  2. top-k: zero all probabilities outside the k largest;
  3. top-p: find the smallest prefix of the descending-sorted probabilities
     with cumulative mass ≥ top_p; zero everything strictly below the cutoff
     probability; if the surviving mass is below top_p, redistribute the
     deficit evenly across entries equal to the cutoff (tie redistribution,
     rwkv_sampler.rs:136-151);
  4. temperature: p ← p^(1/T), renormalized (no-op at T=1);
  5. multinomial draw by inverse CDF **in original index order**.

Two deliberate deviations, both documented:
  * The reference does not renormalize before its inverse-CDF draw, so with
    probability ≈ 1-top_p the uniform falls past the total mass and the code
    returns the *last* surviving index (rwkv_sampler.rs:184-189) — a bias the
    Python original does not have (torch.multinomial renormalizes). We follow
    the Python/torch semantics and renormalize.
  * Exact floating-point ties at the k-th probability keep all tied entries
    (the reference's stable sort keeps the lowest-index ones). Measure-zero
    for real logits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["filtered_probs", "sample_token", "sample_logits"]


@functools.partial(jax.jit, static_argnames=("top_k",))
def filtered_probs(
    logits: jax.Array,
    temperature: jax.Array | float,
    top_p: jax.Array | float,
    top_k: int,
) -> jax.Array:
    """Return the post-filter (pre-draw) probability vector.

    logits: [..., V] float; masked entries should already be -inf.
    top_k is static (compiled in); temperature/top_p may be traced.
    """
    v = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    k = top_k if 0 < top_k < v else v
    # Sorted descending top-k values; doubles as the sorted prefix for top-p
    # (after top-k zeroing, at most k nonzero probabilities survive, so the
    # top-p cutoff always lies inside this prefix).  approx_max_k at
    # recall_target=1.0 is guaranteed exact (XLA PartialReduce sizes its
    # bins for full recall) and runs ~27% faster than the sort-based
    # lax.top_k on TPU at [128, 8320]; only the values are consumed, so
    # tie ORDER differences between the two lowerings cannot change the
    # output (tied values are equal by definition).
    vals = jax.lax.approx_max_k(probs, k, recall_target=1.0)[0]
    if k < v:
        kth = vals[..., -1:]
        probs = jnp.where(probs >= kth, probs, 0.0)

    # --- top-p with tie redistribution (applied when top_p < 1) -----------
    csum = jnp.cumsum(vals, axis=-1)
    reached = csum >= top_p
    # If the cumulative never reaches top_p the reference applies no cutoff.
    has_cutoff = reached[..., -1:]
    first = jnp.argmax(reached, axis=-1)
    cutoff = jnp.take_along_axis(vals, first[..., None], axis=-1)

    kept = jnp.where(probs >= cutoff, probs, 0.0)
    total = jnp.sum(kept, axis=-1, keepdims=True)
    at_cut = kept == cutoff
    n_cut = jnp.sum(at_cut, axis=-1, keepdims=True)
    deficit = jnp.where((total < top_p) & (n_cut > 0),
                        (top_p - total) / jnp.maximum(n_cut, 1), 0.0)
    kept = jnp.where(at_cut & (deficit > 0), cutoff + deficit, kept)

    apply_p = has_cutoff & (jnp.asarray(top_p) < 1.0)
    probs = jnp.where(apply_p, kept, probs)

    # --- temperature as probability exponent ------------------------------
    t = jnp.asarray(temperature, jnp.float32)
    inv_t = jnp.where(t > 0, 1.0 / jnp.maximum(t, 1e-8), 1.0)
    powed = jnp.where(probs > 0, jnp.power(probs, inv_t), 0.0)
    s = jnp.sum(powed, axis=-1, keepdims=True)
    powed = jnp.where(s > 0, powed / s, powed)
    probs = jnp.where(jnp.abs(t - 1.0) > 1e-6, powed, probs)
    return probs


def sample_token(probs: jax.Array, key: jax.Array) -> jax.Array:
    """Multinomial draw by inverse CDF in index order. probs: [..., V].

    The draw is scaled into (0, cdf_max]: the f32 cumsum can top out
    ~1e-7 below 1, and an unscaled u landing in that gap would walk past
    the support and clamp onto the LAST index — which in the masked
    semantic domain is a zero-probability >EOS id (torch.multinomial,
    the parity target, can never emit a zero-probability category). The
    lower bound likewise keeps u off exactly 0, where a zero-probability
    index 0 would be returned."""
    total = jnp.sum(probs, axis=-1, keepdims=True)
    norm = probs / jnp.maximum(total, 1e-30)
    c = jnp.cumsum(norm, axis=-1)
    u = jax.random.uniform(key, probs.shape[:-1] + (1,), dtype=jnp.float32)
    u = jnp.maximum(u, 1e-12) * c[..., -1:]
    idx = jnp.sum((c < u).astype(jnp.int32), axis=-1)
    return jnp.minimum(idx, probs.shape[-1] - 1)


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample_logits(
    logits: jax.Array,
    key: jax.Array,
    temperature: jax.Array | float,
    top_p: jax.Array | float,
    top_k: int,
) -> jax.Array:
    """Full sampler: logits [..., V] → token ids [...]."""
    return sample_token(filtered_probs(logits, temperature, top_p, top_k), key)


# --------------------------------------------------------------------------
# Strategy sampler + penalties (parity with the reference's strategy-enum
# sampler, src/sampler_manager.rs:16-42 strategies, :229-292 penalties).
# On-device: token occurrence counts ride along the decode loop as a [V]
# vector instead of a host-side HashMap.
# --------------------------------------------------------------------------

import dataclasses as _dataclasses
from typing import Optional as _Optional


@_dataclasses.dataclass(frozen=True)
class SamplingStrategy:
    """greedy | top_k | top_p | temperature | mixed
    (sampler_manager.rs:16-42; default Mixed{1.0, k=50, p=0.9})."""

    kind: str = "mixed"
    temperature: float = 1.0
    top_k: _Optional[int] = 50
    top_p: _Optional[float] = 0.9


def apply_penalties(logits: jax.Array, token_counts: jax.Array,
                    repetition_penalty: float = 1.0,
                    frequency_penalty: float = 0.0,
                    presence_penalty: float = 0.0) -> jax.Array:
    """Repetition / frequency / presence penalties over occurrence counts.

    Matches the reference semantics (sampler_manager.rs:245-292): repetition
    divides positive logits by penalty once per occurrence (i.e. penalty^count),
    frequency subtracts penalty·count, presence subtracts once if seen.
    token_counts: [..., V] int — counts of each id in the generated prefix.
    """
    logits = logits.astype(jnp.float32)
    counts = token_counts.astype(jnp.float32)
    if repetition_penalty != 1.0:
        factor = jnp.power(jnp.float32(repetition_penalty), counts)
        logits = jnp.where(logits > 0, logits / factor, logits * factor)
    if frequency_penalty != 0.0:
        logits = logits - frequency_penalty * counts
    if presence_penalty != 0.0:
        logits = logits - presence_penalty * (counts > 0)
    return logits


def sample_with_strategy(logits: jax.Array, key: jax.Array,
                         strategy: SamplingStrategy) -> jax.Array:
    """Dispatch over the strategy enum. Greedy ignores the key."""
    kind = strategy.kind
    if kind == "greedy":
        return jnp.argmax(logits, axis=-1)
    if kind == "top_k":
        return sample_logits(
            logits, key, 1.0, 1.0,
            int(strategy.top_k) if strategy.top_k is not None else 0)
    if kind == "top_p":
        # `is not None`, not `or`: an explicit top_p=0.0 means cutoff at
        # the max probability (near-greedy, as in the reference) — the
        # falsy-zero `or 1.0` silently disabled nucleus filtering instead
        return sample_logits(
            logits, key, 1.0,
            float(strategy.top_p) if strategy.top_p is not None else 1.0, 0)
    if kind == "temperature":
        # the strategy sampler scales LOGITS by 1/T (unlike the TTS
        # sampler's probability exponent)
        t = max(float(strategy.temperature), 1e-6)
        return sample_token(jax.nn.softmax(logits.astype(jnp.float32) / t,
                                           axis=-1), key)
    if kind == "mixed":
        t = max(float(strategy.temperature), 1e-6)
        scaled = logits.astype(jnp.float32) / t
        return sample_logits(
            scaled, key, 1.0,
            float(strategy.top_p) if strategy.top_p is not None else 1.0,
            int(strategy.top_k) if strategy.top_k is not None else 0,
        )
    raise ValueError(f"unknown sampling strategy: {kind}")


# --------------------------------------------------------------------------
# Voice-fidelity / layered-randomness parameter shaping (off the live path,
# as in the reference)
# --------------------------------------------------------------------------

@_dataclasses.dataclass(frozen=True)
class LayeredRandomnessConfig:
    """Per-stage randomness controls (rwkv_sampler.rs:252-277).

    Only the seed offsets act on the reference's live path (its stage loops
    pin temperature/top_p/top_k to fixed values and never call the fidelity
    adjustment — normal_mode_inference.rs:113-133 "简化采样"); the engine
    here applies the same offsets via constants.GLOBAL_SEED_OFFSET /
    SEMANTIC_SEED_OFFSET. The strength fields feed
    :func:`apply_voice_fidelity_adjustment` for callers that opt in.
    """

    global_randomness: float = 0.1
    semantic_randomness: float = 0.4
    use_independent_seeds: bool = True
    global_seed_offset: int = 1000
    semantic_seed_offset: int = 2000


def apply_voice_fidelity_adjustment(temperature: float, top_p: float,
                                    top_k: int, voice_fidelity: float,
                                    stage_randomness: float):
    """Conservative-sampling shaping from voice fidelity
    (rwkv_sampler.rs:515-543, formula-exact).

    High fidelity + low stage randomness → lower temperature, tighter
    top_p, smaller top_k. Returns (temperature, top_p, top_k).
    """
    conservative = voice_fidelity * (1.0 - stage_randomness)
    t = temperature * (0.5 + 0.5 * (1.0 - conservative))
    p = top_p * (0.7 + 0.3 * (1.0 - conservative))
    k = top_k
    if k > 0:
        k = max(1, int(k * (0.5 + 0.5 * (1.0 - conservative))))
    return t, p, k
