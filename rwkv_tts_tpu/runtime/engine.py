"""TTS decode engine: prefill → global stage → semantic stage, on-device.

This is the TPU-first replacement for the reference's inference drivers
(``src/normal_mode_inference.rs``, ``src/zero_shot_inference.rs``): where the
reference pays one GPU→CPU logits roundtrip plus a host-side 77k-entry sort
*per generated token* (SURVEY.md §3.5), here each stage is a single jitted
``lax.scan``/``lax.while_loop`` whose carry is the batched recurrent state —
tokens, sampling, EOS gating and per-slot bookkeeping never leave the chip.

Stage semantics (parity contracts, cited where they bind):
  * prompt assembly      props + TAG_2 + text + TAG_0            (normal_mode_inference.rs:37-41)
                         … + (ref_global+8196)* + TAG_1          (zero_shot_inference.rs:75-85;
                         ref semantic deliberately NOT prefilled — cross-lingual design :86-91)
  * global stage         exactly 32 tokens from logits[0:4096), t=1.0/p=.95/k=20,
                         fed back +8196                          (normal_mode_inference.rs:219-287)
  * semantic stage       ≤ min(max_tokens, 2048) from logits[0:8193), tags masked,
                         t=1.0/p=.95/k=80, stop at EOS 8192      (normal_mode_inference.rs:316-391)
  * zero-shot gating     EOS forbidden before hard_min ≈ 1.8×|text|, and accepted
                         only if ≥70% of the last 12 draws were non-EOS, else
                         resampled with EOS masked               (zero_shot_inference.rs:127-149,219-309)
  * stage RNG streams    seed+1000 (global), seed+2000 (semantic) (rwkv_sampler.rs:265-275)
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import EngineConfig, RwkvConfig, TtsArgs
from ..models import rwkv7
from ..ops.sampling import filtered_probs, sample_token
from ..tokenizer import load_tokenizer
from ..utils.init import raw_threefry_key
from ..tokenizer.properties import convert_standard_properties_to_tokens


# --------------------------------------------------------------------------
# jitted stage programs
# --------------------------------------------------------------------------

# Both sampling domains are PREFIXES of the unified vocab (semantic ids in
# [0, 8192], global ids in [0, 4096)), so the sampler never needs the full
# 78k logits row: slice first, sample over the small domain, and the sampled
# index IS the raw token id. This cuts the per-token top-k/cumsum work ~10×
# — it dominated the decode loop at large batch.
SEMANTIC_SLICE = 8320          # 65 × 128 ≥ 8193, lane-aligned


def _mask_semantic(logits):
    """Semantic-domain mask over a sliced row: ids > EOS and the three tags
    → -inf (normal_mode_inference.rs:332-350). Handles toy vocabs smaller
    than the slice (tests) by clamping the slice width."""
    width = min(SEMANTIC_SLICE, logits.shape[-1])
    s = logits[..., :width]
    ids = jnp.arange(width)
    bad = (ids > C.TTS_EOS_TOKEN) | (ids == C.TTS_TAG_0) |           (ids == C.TTS_TAG_1) | (ids == C.TTS_TAG_2)
    return jnp.where(bad[None, :], -jnp.inf, s)


def _mask_global(logits):
    """Global-domain slice: only ids < 4096 are sampleable
    (normal_mode_inference.rs:236-244)."""
    return logits[..., :min(C.GLOBAL_VOCAB, logits.shape[-1])]


def _fold_keys(base_keys, i):
    return jax.vmap(lambda kb: jax.random.fold_in(kb, i))(base_keys)


def _sample_batch(logits, keys, temperature, top_p, top_k):
    probs = filtered_probs(logits, temperature, top_p, top_k)
    return jax.vmap(sample_token)(probs, keys)



def zs_hard_min(text_len: int) -> int:
    """Zero-shot hard minimum before EOS is allowed: clamp(1.8×|text|,
    max(8, |text|/4)…64 lower bound, ≤ 0.9×2048)
    (zero_shot_inference.rs:127-149). ONE definition shared by the static
    and continuous engines — it feeds the device-side EOS gate, so the two
    must stay bit-identical (CLAUDE.md parity contract)."""
    min_len = min(max(text_len // 4, C.ZS_MIN_LEN_LO), C.ZS_MIN_LEN_HI)
    est = int(np.ceil(text_len * C.ZS_HARD_MIN_FACTOR))
    upper = int(C.MAX_SEMANTIC_TOKENS * C.ZS_UPPER_FRAC)
    return min(upper, max(min_len, est))


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas", "step_fn"))
def global_stage(params, state, first_logits, base_keys, cfg: RwkvConfig,
                 use_pallas: bool = False, step_fn=None):
    """Generate exactly 32 global (speaker) tokens.

    carry: (state, logits, i); emits raw global ids [B, 32]; each sampled id
    is fed back +GLOBAL_TOKEN_OFFSET. Returns (tokens, state, logits_after)
    where logits_after corresponds to the model having consumed the last
    global token (ready for TAG_1).

    ``step_fn`` (static, optional): replaces the decode step with a custom
    ``(params, token, state, head_slice) -> (logits, state)`` — the hook
    the tensor-parallel serving path uses (parallel/tp.make_step_fn);
    ``use_pallas``/bt layout wrapping are bypassed then (the TP step owns
    its own layout). Must be a stable object (cached) or every call
    recompiles.
    """
    gk = C.GLOBAL_SAMPLING

    hs = min(SEMANTIC_SLICE, cfg.padded_vocab_size)

    def _step(params, tok, state):
        if step_fn is not None:
            return step_fn(params, tok, state, hs)
        return rwkv7.step(params, tok, state, cfg, head_slice=hs,
                          use_pallas=use_pallas)

    def body(carry, i):
        state, logits = carry
        keys = _fold_keys(base_keys, i)
        tok = _sample_batch(_mask_global(logits), keys,
                            gk["temperature"], gk["top_p"], gk["top_k"])
        logits, state = _step(params, tok + C.GLOBAL_TOKEN_OFFSET, state)
        return (state, logits), tok

    bt = step_fn is None and rwkv7.wkv_bt_active(use_pallas,
                                                 first_logits.shape[0])
    g = rwkv7.bt_fold(cfg.n_head, first_logits.shape[0]) if bt else 1
    if bt:
        state = rwkv7.state_to_bt(state, g)
    (state, logits), toks = jax.lax.scan(
        body, (state, first_logits[..., :hs]),
        jnp.arange(C.GLOBAL_TOKENS_SIZE)
    )
    if bt:
        state = rwkv7.state_from_bt(state, g)
    return jnp.moveaxis(toks, 0, 1), state, logits


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps", "zero_shot",
                                             "use_pallas", "feed_tag1",
                                             "step_fn"))
def semantic_stage(params, state, first_logits, base_keys, limits, hard_min,
                   cfg: RwkvConfig, max_steps: int, zero_shot: bool,
                   use_pallas: bool = False, feed_tag1: bool = False,
                   step_fn=None):
    """Generate semantic tokens until per-slot EOS / per-slot limit.

    limits:   [B] int32 — per-request cap (min(max_tokens, 2048))
    hard_min: [B] int32 — EOS forbidden before this step (0 in normal mode)
    feed_tag1: consume the TAG_1 separator as step −1 INSIDE this program
    (normal mode; ``first_logits`` is then ignored) — one device dispatch
    instead of a standalone step between the stages.
    step_fn: custom decode step hook, see :func:`global_stage`.

    Returns (tokens [B, max_steps], lengths [B], state).
    """
    B = first_logits.shape[0]
    sk = C.SEMANTIC_SAMPLING
    _hs = min(SEMANTIC_SLICE, cfg.padded_vocab_size)

    def _step(params, tok, state):
        if step_fn is not None:
            return step_fn(params, tok, state, _hs)
        return rwkv7.step(params, tok, state, cfg, head_slice=_hs,
                          use_pallas=use_pallas)

    buf0 = jnp.zeros((B, max_steps), jnp.int32)
    win0 = jnp.zeros((B, C.ZS_EOS_WINDOW), jnp.bool_)   # rolling non-EOS window
    nwin0 = jnp.zeros((B,), jnp.int32)                   # entries in window
    done0 = jnp.zeros((B,), jnp.bool_)
    len0 = jnp.zeros((B,), jnp.int32)

    def cond(carry):
        _, _, _, done, _, _, _, i = carry
        return (i < max_steps) & (~jnp.all(done))

    def body(carry):
        state, logits, buf, done, lens, win, nwin, i = carry
        keys = _fold_keys(base_keys, i)
        masked = _mask_semantic(logits)
        forbid_eos = i < hard_min
        masked = jnp.where(
            forbid_eos[:, None] & (jnp.arange(masked.shape[-1]) == C.TTS_EOS_TOKEN)[None, :],
            -jnp.inf, masked,
        )
        tok = _sample_batch(masked, keys, sk["temperature"], sk["top_p"], sk["top_k"])

        if zero_shot:
            # EOS-window gate: accept EOS only if the window is full and
            # ≥70% of it is non-EOS; otherwise resample with EOS masked
            # (zero_shot_inference.rs:219-309).
            ratio = win.sum(axis=1) / jnp.maximum(nwin, 1)
            allow_eos = (nwin >= C.ZS_EOS_WINDOW) & (ratio >= C.ZS_EOS_RATIO_THRESHOLD)
            need_resample = (tok == C.TTS_EOS_TOKEN) & (~allow_eos)

            def _resample():
                # gated like the continuous engine (continuous.py
                # decode_block): the second full sampler pass over
                # [B, 8320] only runs on steps where some slot actually
                # drew a premature EOS — numerically exact, the keys are
                # deterministic folds and a skipped pass contributed
                # nothing to the emitted stream
                no_eos = jnp.where(
                    (jnp.arange(masked.shape[-1]) == C.TTS_EOS_TOKEN)[None, :],
                    -jnp.inf, masked,
                )
                keys2 = _fold_keys(base_keys, i + (1 << 20))
                return _sample_batch(no_eos, keys2, sk["temperature"],
                                     sk["top_p"], sk["top_k"])

            tok2 = jax.lax.cond(jnp.any(need_resample), _resample,
                                lambda: tok)
            tok = jnp.where(need_resample, tok2, tok)
            # window tracks non-EOS of emitted (post-resample) tokens
            win = jnp.concatenate(
                [win[:, 1:], (tok != C.TTS_EOS_TOKEN)[:, None]], axis=1
            )
            nwin = jnp.minimum(nwin + 1, C.ZS_EOS_WINDOW)

        is_eos = tok == C.TTS_EOS_TOKEN
        active = (~done) & (i < limits)
        emit = active & (~is_eos)
        buf = buf.at[:, i].set(jnp.where(emit, tok, 0))
        lens = lens + emit.astype(jnp.int32)
        done = done | (active & is_eos) | (i + 1 >= limits)

        # feed the raw token back (semantic domain uses raw ids,
        # normal_mode_inference.rs:389-390); done slots feed a harmless 0
        feed = jnp.where(emit, tok, 0)
        logits, state = _step(params, feed, state)
        return (state, logits, buf, done, lens, win, nwin, i + 1)

    bt = step_fn is None and rwkv7.wkv_bt_active(use_pallas, B)
    g = rwkv7.bt_fold(cfg.n_head, B) if bt else 1
    if bt:
        state = rwkv7.state_to_bt(state, g)
    if feed_tag1:
        tag1 = jnp.full((B,), C.TTS_TAG_1, jnp.int32)
        first_logits, state = _step(params, tag1, state)
    carry = (state, first_logits[..., :_hs], buf0, done0, len0, win0, nwin0,
             jnp.int32(0))
    state, logits, buf, done, lens, win, nwin, i = jax.lax.while_loop(cond, body, carry)
    if bt:
        state = rwkv7.state_from_bt(state, g)
    return buf, lens, state


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_steps", "zero_shot", "use_pallas_fwd", "use_pallas_step"))
def lm_program(params, tokens, lengths, glob_keys, sem_keys, limits,
               hard_min, cfg: RwkvConfig, max_steps: int, zero_shot: bool,
               use_pallas_fwd: bool = False, use_pallas_step: bool = False):
    """ONE-dispatch LM path: prefill + (global stage +) TAG_1-folded
    semantic stage composed into a single compiled program.

    Numerically it is the staged path verbatim (the stage functions are
    inlined, not rewritten; fused-vs-staged token equality is tested),
    but the host dispatches once instead of three times — measured
    13 ms off the batch-8 normal-mode first chunk on the real chip
    (tools/profile_first_chunk.py, docs/PERF.md r3). Single prefill
    chunk only; the engine falls back to the staged path for prompts
    longer than the largest bucket (chunked prefill) and for TP meshes
    (their prefill is forward_tp).

    Returns (glob [B, 32] — zeros for zero-shot, sem, sem_lens).
    """
    B = tokens.shape[0]
    state = rwkv7.init_state(cfg, B)
    logits, state = rwkv7.forward(params, tokens, state, cfg,
                                  use_pallas=use_pallas_fwd,
                                  lengths=lengths)
    if zero_shot:
        glob = jnp.zeros((B, C.GLOBAL_TOKENS_SIZE), jnp.int32)
        sem, lens, _ = semantic_stage(
            params, state, logits, sem_keys, limits, hard_min, cfg,
            max_steps, True, use_pallas=use_pallas_step)
        return glob, sem, lens
    glob, state, logits = global_stage(params, state, logits, glob_keys,
                                       cfg, use_pallas=use_pallas_step)
    sem, lens, _ = semantic_stage(
        params, state, logits, sem_keys, limits, hard_min, cfg, max_steps,
        False, use_pallas=use_pallas_step, feed_tag1=True)
    return glob, sem, lens


# --------------------------------------------------------------------------
# host-side engine
# --------------------------------------------------------------------------

@dataclasses.dataclass
class GenerationResult:
    global_tokens: List[int]
    semantic_tokens: List[int]
    prefill_tokens: int
    decode_steps: int


class TtsEngine:
    """Owns the LM params + compiled stage programs; stateless across calls.

    The analog of SharedRwkvRuntime + the two inference drivers: one model,
    per-request independent state slots, deterministic per-request seeds.
    """

    def __init__(self, params, cfg: RwkvConfig, engine_cfg: EngineConfig = EngineConfig(),
                 tokenizer=None, use_pallas: Optional[bool] = None,
                 tp_mesh=None):
        """``tp_mesh``: optional (data, model) Mesh with model axis > 1 —
        enables LAYER-weight tensor parallelism (parallel/tp.py): params
        are head-sharded on construction, prefill runs forward_tp, and
        the stages drive the sharded step through their step_fn hook.
        Each chip then streams 1/tp of the decode-step weights — the path
        below the single-chip first-chunk floor (docs/PERF.md). Takes the
        RAW (unfused) layout, plain or int8-quantized — int8 composes
        (specs shard the {"q","s"} leaves; TP=4 + int8 ≈ 1/8 of the bf16
        single-chip stream). The fused zrkv layout and the 4-bit packed
        layouts are NOT shardable here. Pallas is forced off (the TP
        latency target is small batch, where the jnp chain wins anyway).
        """
        self._step_fn = None
        self.tp_mesh = tp_mesh
        if tp_mesh is not None:
            from ..parallel import mesh as meshlib
            from ..parallel import tp as tplib
            if tp_mesh.shape[meshlib.MODEL_AXIS] <= 1:
                raise ValueError("tp_mesh needs a model axis > 1; use "
                                 "ContinuousEngine(mesh=...) for pure dp")
            mp = tp_mesh.shape[meshlib.MODEL_AXIS]
            if cfg.n_head % mp:
                raise ValueError(
                    f"tensor parallelism {mp} must divide the model's head "
                    f"count {cfg.n_head} (n_embd {cfg.n_embd} / head_size "
                    f"{cfg.head_size}) — lower --tp or use data parallelism")
            if isinstance(params.get("blocks"), (tuple, list)):
                raise ValueError(
                    "tp_mesh does not compose with partial --quant-layers "
                    "(segmented blocks); quantize all layers or none")
            if "zrkv" in params.get("blocks", {}):
                raise ValueError("tp_mesh takes the RAW layout; fused "
                                 "(zrkv) params cannot be head-sharded")
            params = tplib.shard_params_tp(tp_mesh, params)
            self._step_fn = tplib.make_step_fn(cfg, tp_mesh)
            use_pallas = False
        self.params = params
        self.cfg = cfg
        self.engine_cfg = engine_cfg
        self.tokenizer = tokenizer or load_tokenizer()
        # Text→ids LRU cache on the live path (the reference built one in
        # src/feature_extractor.rs:35-56 but left it off the live path).
        # normalize=False: the live prompt contract is the raw text
        # (process_text is the identity, lightweight_tts_pipeline.rs:149-151).
        from ..tokenizer.rwkv_tokenizer import CachedEncoder
        self.encoder = CachedEncoder(self.tokenizer, normalize=False)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # Decode loop runs the batch-in-lanes Pallas WKV kernel
        # (ops/wkv7.wkv7_single_bt_pallas): measured 4.1× the XLA-fused jnp
        # state update at the flagship decode shape (the earlier
        # [B, H, N, N]-layout kernel was ~6% SLOWER in-context — layout,
        # not Pallas, was the problem). Stage programs transpose the state
        # once at entry/exit (state_to_bt / state_from_bt).
        self.use_pallas_step = use_pallas

    # -- prompt assembly ----------------------------------------------------

    def build_prompt(self, args: TtsArgs) -> Tuple[List[int], List[int]]:
        """Returns (prompt_ids, text_ids). Zero-shot prompts embed the
        reference global tokens; ref semantic tokens are intentionally NOT
        prefilled (cross-lingual cloning, zero_shot_inference.rs:86-91),
        and property tokens are NOT emitted — the voice is carried by the
        ref global tokens (lightweight_tts_pipeline.rs:162-169 returns an
        empty property list for zero-shot / pre-extracted voices)."""
        text_ids = self.encoder.encode(args.text)
        props = [] if args.zero_shot else convert_standard_properties_to_tokens(
            args.age, args.gender, args.emotion, args.pitch, args.speed
        )
        prompt = list(props) + [C.TTS_TAG_2] + text_ids + [C.TTS_TAG_0]
        if args.zero_shot:
            ref_global = [min(max(int(t), 0), C.GLOBAL_VOCAB - 1)
                          for t in (args.ref_global_tokens or [])]
            prompt += [t + C.GLOBAL_TOKEN_OFFSET for t in ref_global]
            prompt += [C.TTS_TAG_1]
        return prompt, text_ids

    def _bucket(self, n: int) -> int:
        for b in self.engine_cfg.prefill_buckets:
            if n <= b:
                return b
        return self.engine_cfg.prefill_buckets[-1]

    def prefill(self, prompts, state):
        """Chunked masked prefill of variable-length prompts.

        Prompts longer than the largest bucket are consumed in bucket-sized
        chunks with the recurrent state carried across calls — the
        token_chunk_size mechanism of the reference
        (RnnInput::new(batches, chunk), normal_mode_inference.rs:63; O(1)
        memory in sequence length by construction).
        """
        cfg = self.cfg
        B = len(prompts)
        max_bucket = self.engine_cfg.prefill_buckets[-1]
        remaining = [list(p) for p in prompts]
        logits = None
        while True:
            chunk = [r[:max_bucket] for r in remaining]
            remaining = [r[max_bucket:] for r in remaining]
            lengths = np.array([len(c) for c in chunk], np.int32)
            T = self._bucket(int(max(lengths.max(), 1)))
            tok_mat = np.zeros((B, T), np.int32)
            for i, c in enumerate(chunk):
                tok_mat[i, : len(c)] = c
            if self.tp_mesh is not None:
                from ..parallel import mesh as meshlib
                from ..parallel import tp as tplib
                # device_put the host arrays STRAIGHT to the mesh sharding
                # (asarray-first would hop via device 0 — a needless extra
                # transfer on a remote-tunnel TPU)
                new_logits, state = tplib.forward_tp(
                    self.params,
                    jax.device_put(tok_mat,
                                   meshlib.batch_sharding(self.tp_mesh, 2)),
                    state, cfg, self.tp_mesh,
                    lengths=jax.device_put(
                        lengths, meshlib.batch_sharding(self.tp_mesh, 1)),
                )
            else:
                new_logits, state = rwkv7.forward(
                    self.params, jnp.asarray(tok_mat), state, cfg,
                    use_pallas=self.use_pallas, lengths=jnp.asarray(lengths),
                )
            # keep each slot's logits from the chunk containing its last
            # real token (zero-length chunks leave state AND logits alone)
            if logits is None:
                logits = new_logits
            else:
                logits = jnp.where((lengths > 0)[:, None], new_logits, logits)
            if not any(remaining):
                break
        return logits, state

    # -- batched generation ---------------------------------------------------

    def generate_batch(self, requests: Sequence[TtsArgs]) -> List[GenerationResult]:
        """All requests must share a mode (zero_shot or not); the pipeline
        groups mixed batches upstream."""
        if not requests:
            return []
        # pow2 batch buckets: the decode step is weight-pipe bound and
        # ~flat in batch (docs/PERF.md), so padding a 5-request batch to
        # 8 costs almost nothing on-device while bounding the compiled
        # program set to log2(max_batch) variants — without this, every
        # distinct collect-window size compiles a fresh multi-minute
        # program through the tunnel (the r3 soak's early p99 spikes)
        B0 = len(requests)
        Bp = 1 << (B0 - 1).bit_length()
        # never pad BEYOND the operator's engine batch cap (a cap of 12
        # chosen against chip memory must not silently run 16-wide) —
        # with a non-pow2 cap, batches in (cap/2, cap] pad to the cap
        # itself so the compile set stays bounded (pow2 ladder + cap);
        # only batches already above the cap run at their own size
        if Bp > self.engine_cfg.batch_size:
            Bp = self.engine_cfg.batch_size if B0 <= self.engine_cfg.batch_size else B0
        if Bp != B0:
            reqs = list(requests)
            out = self.generate_batch(reqs + [reqs[-1]] * (Bp - B0))
            return out[:B0]
        if self.tp_mesh is not None:
            # the data axis shards the batch; pad to a multiple of dp by
            # repeating the last request (same trick as continuous-engine
            # admission bursts) and trim the duplicate results
            from ..parallel import mesh as meshlib
            dp = self.tp_mesh.shape[meshlib.DATA_AXIS]
            pad = (-len(requests)) % dp
            if pad:
                reqs = list(requests)
                out = self.generate_batch(reqs + [reqs[-1]] * pad)
                return out[: len(reqs)]
        zero_shot = requests[0].zero_shot
        assert all(r.zero_shot == zero_shot for r in requests)
        B = len(requests)
        cfg, ecfg = self.cfg, self.engine_cfg

        prompts, texts = zip(*(self.build_prompt(r) for r in requests))
        prompt_lens = [len(p) for p in prompts]

        seeds = [r.seed if r.seed is not None else
                 int.from_bytes(os.urandom(4), "little") for r in requests]

        limits = jnp.asarray(
            [min(r.max_tokens, C.MAX_SEMANTIC_TOKENS) for r in requests], jnp.int32
        )
        if zero_shot:
            hard_min = jnp.asarray([zs_hard_min(len(t)) for t in texts],
                                   jnp.int32)
        else:
            hard_min = jnp.zeros((B,), jnp.int32)
        sem_keys = jnp.asarray(np.stack(
            [raw_threefry_key(s + C.SEMANTIC_SEED_OFFSET) for s in seeds]))
        glob_keys = jnp.asarray(np.stack(
            [raw_threefry_key(s + C.GLOBAL_SEED_OFFSET) for s in seeds]))

        max_bucket = ecfg.prefill_buckets[-1]
        if self._step_fn is None and max(prompt_lens) <= max_bucket:
            # ONE-dispatch path: prefill + stages in a single program
            # (lm_program — saves the inter-stage dispatch glue)
            T = self._bucket(max(prompt_lens))
            tok_mat = np.zeros((B, T), np.int32)
            for i, p in enumerate(prompts):
                tok_mat[i, : len(p)] = p
            glob, sem, sem_lens = lm_program(
                self.params, jnp.asarray(tok_mat),
                jnp.asarray(np.array(prompt_lens, np.int32)),
                glob_keys, sem_keys, limits, hard_min, cfg,
                ecfg.max_semantic_tokens, zero_shot,
                use_pallas_fwd=self.use_pallas,
                use_pallas_step=self.use_pallas_step)
        else:
            # staged path: chunked prefill (long prompts) or TP mesh
            state = rwkv7.init_state(cfg, B)
            if self.tp_mesh is not None:
                from ..parallel import tp as tplib
                state = tplib.shard_state_tp(self.tp_mesh, state)
            logits, state = self.prefill(prompts, state)
            if zero_shot:
                glob = None
                sem, sem_lens, state = semantic_stage(
                    self.params, state, logits, sem_keys, limits, hard_min,
                    cfg, ecfg.max_semantic_tokens, True,
                    use_pallas=self.use_pallas_step, step_fn=self._step_fn,
                )
            else:
                # normal mode: global stage, then TAG_1 (consumed INSIDE
                # the semantic-stage program, feed_tag1), then semantic
                glob, state, logits = global_stage(
                    self.params, state, logits, glob_keys, cfg,
                    use_pallas=self.use_pallas_step, step_fn=self._step_fn)
                sem, sem_lens, state = semantic_stage(
                    self.params, state, logits, sem_keys, limits, hard_min,
                    cfg, ecfg.max_semantic_tokens, False,
                    use_pallas=self.use_pallas_step, feed_tag1=True,
                    step_fn=self._step_fn,
                )

        sem_np, len_np = np.asarray(sem), np.asarray(sem_lens)
        if zero_shot:
            ref_globals = [list(r.ref_global_tokens or []) for r in requests]
            out = []
            for i, r in enumerate(requests):
                toks = [int(t) for t in sem_np[i, : len_np[i]]]
                g = [min(max(int(t), 0), C.GLOBAL_VOCAB - 1)
                     for t in ref_globals[i]]
                out.append(GenerationResult(g, toks, prompt_lens[i],
                                            len(toks)))
            return out
        glob_np = np.asarray(glob)
        out = []
        for i in range(B):
            toks = [int(t) for t in sem_np[i, : len_np[i]]]
            out.append(GenerationResult(
                [int(t) for t in glob_np[i]], toks, prompt_lens[i],
                C.GLOBAL_TOKENS_SIZE + len(toks),
            ))
        return out

    def generate(self, args: TtsArgs) -> GenerationResult:
        return self.generate_batch([args])[0]

    def generate_speaker_tokens(self, args: TtsArgs, seed: int) -> List[int]:
        """32 speaker (global) tokens for a property set, from a TEXT-FREE
        prompt — the cached-speaker fast path's enrollment step.

        Prompt = props + TAG_2 + TAG_0 (the normal-mode assembly,
        normal_mode_inference.rs:37-41, with the text span empty), then
        the exact 32-token global stage (t=1.0/p=.95/k=20, logits[0:4096),
        feedback +8196 — normal_mode_inference.rs:219-287) at the
        reference's stage seed (seed + 1000, rwkv_sampler.rs:265-275).

        Documented deviation from the reference: its global tokens
        condition on the request text; these condition on the properties
        only, so one speaker identity can serve MANY texts through the
        zero-shot chain (that is what makes it cacheable — the same
        trade the reference's own voice library makes,
        lightweight_tts_pipeline.rs:747-787)."""
        props = convert_standard_properties_to_tokens(
            args.age, args.gender, args.emotion, args.pitch, args.speed)
        prompt = list(props) + [C.TTS_TAG_2, C.TTS_TAG_0]
        # under TP the data axis shards dim-0 of the batch: a B=1 prefill
        # cannot shard over dp>1, so pad the enrollment prompt to the
        # data-axis width (same trick as generate_batch's dp padding) and
        # keep row 0 of the result
        B = 1
        if self.tp_mesh is not None:
            from ..parallel import mesh as meshlib
            from ..parallel import tp as tplib
            B = self.tp_mesh.shape[meshlib.DATA_AXIS]
        state = rwkv7.init_state(self.cfg, B)
        if self.tp_mesh is not None:
            state = tplib.shard_state_tp(self.tp_mesh, state)
        logits, state = self.prefill([prompt] * B, state)
        glob_keys = jnp.asarray(np.stack(
            [raw_threefry_key(seed + C.GLOBAL_SEED_OFFSET)] * B))
        glob, _, _ = global_stage(
            self.params, state, logits, glob_keys, self.cfg,
            use_pallas=self.use_pallas_step, step_fn=self._step_fn)
        return [int(t) for t in np.asarray(glob)[0]]
