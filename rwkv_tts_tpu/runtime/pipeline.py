"""End-to-end TTS pipeline: text → tokens → waveform, plus voice enrollment.

The analog of ``LightweightTtsPipeline`` (src/lightweight_tts_pipeline.rs):
voice-token resolution priority chain (voice_id → direct tokens → ref audio →
property tokens, :747-787), batch synthesis, audio decode and save, and the
enrollment path (extract → store). Per-request stage timing feeds the RTF
instrumentation the reference reports in every response
(bin/server.rs:631-676).
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import os
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from .. import constants as C
from ..audio import io as audio_io
from ..audio.frontend import load_and_process, zero_mean_unit_variance
from ..config import (
    BiCodecConfig,
    EngineConfig,
    RwkvConfig,
    TtsArgs,
    Wav2Vec2Config,
)
from ..models import bicodec, rwkv7, wav2vec2
from ..models.codec_loader import load_codecs
from ..utils.rtf import StageTimer
from .engine import GenerationResult, TtsEngine
from .voice_store import VoiceStore

log = logging.getLogger(__name__)


@dataclasses.dataclass
class SynthesisResult:
    audio: np.ndarray            # f32 waveform @16 kHz
    sample_rate: int
    global_tokens: List[int]
    semantic_tokens: List[int]
    timings_ms: Dict[str, float]
    rtf: float


class TtsPipeline:
    """Owns all three models + the voice store.

    Construction takes parameter pytrees so tests can inject small
    random-weight models; ``from_checkpoints`` wires the real files.
    """

    def __init__(self, lm_params, lm_cfg: RwkvConfig,
                 bicodec_params, bicodec_cfg: BiCodecConfig,
                 w2v_params=None, w2v_cfg: Optional[Wav2Vec2Config] = None,
                 voice_store: Optional[VoiceStore] = None,
                 engine_cfg: EngineConfig = EngineConfig(),
                 tokenizer=None, use_pallas: Optional[bool] = None,
                 w2v_output_layers=wav2vec2.OUTPUT_LAYERS, tp_mesh=None,
                 cached_speaker_default: bool = False):
        self.engine = TtsEngine(lm_params, lm_cfg, engine_cfg,
                                tokenizer=tokenizer, use_pallas=use_pallas,
                                tp_mesh=tp_mesh)
        self.bicodec_params = bicodec_params
        self.bicodec_cfg = bicodec_cfg
        self.w2v_params = w2v_params
        self.w2v_cfg = w2v_cfg
        self.w2v_output_layers = w2v_output_layers
        self.voice_store = voice_store
        # ref-audio token cache (see extract_voice_tokens_cached)
        self._extract_cache = collections.OrderedDict()
        self._extract_cache_cap = 64
        self._extract_cache_lock = threading.Lock()
        # cached-speaker fast path (VERDICT r3 #1): per-(props, seed)
        # speaker tokens; OFF by default (opt-in flag/server default)
        self.cached_speaker_default = cached_speaker_default
        self._speaker_cache: Dict[tuple, List[int]] = {}
        self._speaker_cache_lock = threading.Lock()

    @classmethod
    def from_checkpoints(cls, model_path: str, raf_dir: str = "assets/raf",
                         dtype: str = "bfloat16", quant_type: str = "none",
                         quant_layers: int = -1, vocab_path: str = None,
                         codec_dir: Optional[str] = None,
                         allow_random_codec: bool = False, **kw):
        """Load the full serving stack from disk.

        LM: ``model_path`` (webrwkv.safetensors layout). Codec + wav2vec2:
        resolved from ``codec_dir`` (default: the LM's directory) via
        ``load_codecs`` — torch-style state dicts import into the native
        JAX modules; the ONNX exports run through the transpiler
        (models/onnx_graph.py) and serve as ground truth. A missing codec
        RAISES unless ``allow_random_codec=True`` (a random codec turns
        every utterance into noise — the r1 silent fallback is gone)."""
        import os

        from ..models.convert import load_rwkv7
        from ..tokenizer import load_tokenizer
        if os.path.isdir(model_path):
            # directory parity (shared_runtime.rs:85-97): prefer the int8
            # export, then the standard name
            for cand in ("rwkvtts-Int8_22.safetensors",
                         "webrwkv.safetensors"):
                p = os.path.join(model_path, cand)
                if os.path.exists(p):
                    model_path = p
                    break
            else:
                raise FileNotFoundError(
                    f"No supported model file found in directory: "
                    f"{model_path} (looked for rwkvtts-Int8_22.safetensors, "
                    f"webrwkv.safetensors)")
        lm_params, lm_cfg = load_rwkv7(model_path, dtype=dtype)
        tp_mesh = kw.get("tp_mesh")
        fuse = kw.pop("fuse", False)
        if tp_mesh is not None:
            # layer tensor parallelism (parallel/tp.py) shards the RAW
            # unfused layout; fusion is a single-device decode optimization
            # superseded by the 1/tp weight stream. int8 composes (the
            # sharded-leaf specs cover it); the 4-bit layouts do not.
            if quant_type in ("int4", "nf4", "sf4"):
                log.warning("tp_mesh: %s layout is not TP-shardable — "
                            "serving int8 instead", quant_type)
                quant_type = "int8"
            log.info("tp_mesh set: raw %s layout, weights shard 1/%d "
                     "per chip", quant_type,
                     tp_mesh.shape.get("model", 1))
        elif fuse:
            # OPT-IN projection fusion (7 projections → 2 matmuls,
            # rwkv7.fuse_params). No longer the default: fusion doubles
            # the r/k/v + LoRA-A weight bytes ([2C, 3C] zrkv), and with
            # int8 weights the extra ~0.78 GB/step of HBM traffic costs
            # more than the launch savings at every batch — measured r4
            # on the real chip (tools/profile_fused_ab.py): batch 128
            # 8.07 raw vs 8.66 fused ms/step, batch 8 3.48 vs 4.17. The
            # raw layout is also bit-closer to the CPU goldens/parity
            # path (no f32 reassociation from the stacked [2C] dots).
            lm_params = rwkv7.fuse_params(lm_params, lm_cfg)
        if vocab_path:
            kw.setdefault("tokenizer", load_tokenizer(vocab_path))
        if quant_type in ("int8", "int4", "nf4", "sf4"):
            from ..ops.quant import quantize_rwkv_params
            if quant_type == "sf4":
                # web-rwkv's SF4 is an internal float4 format; NF4 covers
                # the same 4-bit memory/quality point (flag parity:
                # bin/server.rs:1203-1233). For a 4-bit point that is also
                # FAST at decode, prefer --quant-type int4 (linear codes +
                # group scales, Pallas dequant-GEMM — no codebook gather).
                quant_type = "nf4"
            lm_params = quantize_rwkv_params(lm_params,
                                             quant_layers=quant_layers,
                                             kind=quant_type)
        codec_dir = codec_dir or (os.path.dirname(model_path) or ".")
        bc_params, bc_cfg, w2v_params, w2v_cfg, w2v_layers = load_codecs(
            codec_dir, allow_random=allow_random_codec)
        kw.setdefault("w2v_output_layers", w2v_layers)
        # ``codec_dtype`` selects the BiCodec compute policy (see
        # models/bicodec.decode). Default stays f32: bf16 convs measured
        # no faster on v5e (XLA's 1-D conv lowering doesn't exploit the
        # bf16 MXU rate here — docs/PERF.md "measured and rejected").
        codec_dtype = kw.pop("codec_dtype", None)
        if codec_dtype is not None:
            bc_cfg = dataclasses.replace(bc_cfg, dtype=codec_dtype)
            # one-time cast: decode()'s in-graph fallback would otherwise
            # convert the whole weight tree every call (per streaming chunk)
            bc_params = bicodec.prepare_params(bc_params, bc_cfg)
        # ``codec_conv_impl`` selects the wave-generator conv backend
        # ("native" | "mxu" — models/bicodec._wavegen_conv).
        codec_conv_impl = kw.pop("codec_conv_impl", None)
        if codec_conv_impl is not None:
            bc_cfg = dataclasses.replace(bc_cfg, conv_impl=codec_conv_impl)
        return cls(lm_params, lm_cfg, bc_params, bc_cfg, w2v_params, w2v_cfg,
                   voice_store=VoiceStore(raf_dir), **kw)

    # ------------------------------------------------------------------
    # voice-token resolution (priority chain, lightweight_tts_pipeline.rs:747-787)
    # ------------------------------------------------------------------

    def resolve_voice(self, args: TtsArgs) -> TtsArgs:
        if args.voice_id and self.voice_store is not None:
            try:
                g, s, prompt = self.voice_store.get_voice_tokens(
                    args.voice_id)
            except Exception as e:  # noqa: BLE001 — fall down the chain
                # reference parity: a failed voice-id lookup falls back to
                # direct tokens → property tokens rather than failing the
                # request (lightweight_tts_pipeline.rs:753-767); it would
                # otherwise abort the whole batch
                log.warning("voice_id %r failed to load (%s) — falling "
                            "back down the voice chain", args.voice_id, e)
            else:
                return dataclasses.replace(
                    args, zero_shot=True, ref_global_tokens=g,
                    ref_semantic_tokens=s,
                    prompt_text=args.prompt_text or prompt,
                    # cloning IGNORES any user seed — the reference forces
                    # StdRng::seed_from_u64(0) whenever ref tokens are
                    # present (dynamic_batch_manager.rs:435-441, 489-496)
                    seed=0,
                )
        elif args.voice_id:
            log.warning("voice_id %r ignored: no voice store configured",
                        args.voice_id)
        if args.ref_global_tokens:
            # direct ref tokens are also "cloning" for the reference's
            # forced-deterministic-seed rule (dynamic_batch_manager.rs:487)
            return dataclasses.replace(args, zero_shot=True, seed=0)
        if args.ref_audio_path:
            # ref-audio FILE directly in the synthesis request — the chain's
            # third rung (lightweight_tts_pipeline.rs:773-781
            # process_reference_audio); activates on presence alone, like
            # the direct-token rung. Tokens come from the checksum cache
            # when the same file was extracted before. A failed extraction
            # falls down the chain (per-request degradation, not a
            # batch-wide failure — same contract as the voice_id rung).
            try:
                g, s, _dur = self.extract_voice_tokens_cached(
                    args.ref_audio_path)
            except Exception as e:  # noqa: BLE001 — fall down the chain
                log.warning("ref_audio_path %r failed to extract (%s) — "
                            "falling back down the voice chain",
                            args.ref_audio_path, e)
            else:
                return dataclasses.replace(
                    args, zero_shot=True, ref_global_tokens=g,
                    ref_semantic_tokens=s, seed=0)
        # cached-speaker fast path (opt-in; no reference analog): a
        # property-controlled request reuses 32 cached speaker tokens and
        # runs the SHORT zero-shot chain (prefill embeds the speaker →
        # semantic decode only), skipping the 32-step global stage — the
        # same trade the reference's own voice library makes for enrolled
        # voices (lightweight_tts_pipeline.rs:747-787). Deviations,
        # documented in engine.generate_speaker_tokens and docs/PARITY.md:
        # speaker tokens condition on the properties only (not the
        # text), and the user seed is KEPT for the semantic stage (unlike
        # cloning's forced seed 0) so different seeds still vary the
        # delivery.
        use_cached = (args.cached_speaker if args.cached_speaker is not None
                      else self.cached_speaker_default)
        if use_cached:
            g = self.get_cached_speaker(args)
            return dataclasses.replace(
                args, zero_shot=True, ref_global_tokens=g,
                ref_semantic_tokens=[])
        return dataclasses.replace(args, zero_shot=False)

    def get_cached_speaker(self, args: TtsArgs) -> List[int]:
        """Speaker tokens for (properties, seed), generated once and
        cached. ``seed=None`` is its own cache key: a stable
        server-lifetime "default voice" drawn once from OS entropy (the
        operator-enrolled-default semantics of the reference's raf
        library)."""
        key = (args.age, args.gender, args.emotion, args.pitch,
               args.speed, args.seed)
        with self._speaker_cache_lock:
            hit = self._speaker_cache.get(key)
        if hit is not None:
            return list(hit)
        seed = (int(args.seed) if args.seed is not None
                else int.from_bytes(os.urandom(4), "little"))
        toks = self.engine.generate_speaker_tokens(args, seed)
        with self._speaker_cache_lock:
            # a concurrent miss may have raced us; first writer wins so
            # every request with this key sees ONE speaker identity
            hit = self._speaker_cache.setdefault(key, toks)
        return list(hit)

    # ------------------------------------------------------------------
    # synthesis
    # ------------------------------------------------------------------

    def synthesize(self, args: TtsArgs) -> SynthesisResult:
        return self.synthesize_batch([args])[0]

    def vocode(self, g: GenerationResult) -> np.ndarray:
        """One request's semantic tokens → f32 waveform @16 kHz (bucketed
        BiCodec detokenize; empty generation → 1 s of silence,
        lightweight_tts_pipeline.rs:828-830)."""
        if g.semantic_tokens:
            return bicodec.detokenize(
                self.bicodec_params, g.global_tokens or [0] * 32,
                g.semantic_tokens, self.bicodec_cfg,
            )[0]
        return np.zeros(C.SAMPLE_RATE, np.float32)

    def assemble_result(self, g: GenerationResult, wav: np.ndarray,
                        timings_ms: Dict[str, float]) -> SynthesisResult:
        """Package one continuous-engine generation the way
        ``synthesize_batch`` packages a static batch (same RTF accounting:
        serving wall per second of audio that wall produced —
        bin/server.rs:631-676)."""
        total_s = sum(timings_ms.values()) / 1000.0
        audio_s = len(wav) / C.SAMPLE_RATE
        return SynthesisResult(
            audio=wav, sample_rate=C.SAMPLE_RATE,
            global_tokens=g.global_tokens,
            semantic_tokens=g.semantic_tokens,
            timings_ms=dict(timings_ms),
            rtf=(total_s / audio_s) if audio_s > 0 else 0.0,
        )

    def synthesize_batch(self, requests: Sequence[TtsArgs]
                         ) -> List[SynthesisResult]:
        timer = StageTimer()
        resolved = [self.resolve_voice(a) for a in requests]

        with timer.stage("generate"):
            # group by mode, preserve order
            order = list(range(len(resolved)))
            normal = [i for i in order if not resolved[i].zero_shot]
            zshot = [i for i in order if resolved[i].zero_shot]
            gens: List[Optional[GenerationResult]] = [None] * len(resolved)
            if normal:
                for i, g in zip(normal, self.engine.generate_batch(
                        [resolved[i] for i in normal])):
                    gens[i] = g
            if zshot:
                for i, g in zip(zshot, self.engine.generate_batch(
                        [resolved[i] for i in zshot])):
                    gens[i] = g

        with timer.stage("detokenize"):
            audios = [self.vocode(g) for g in gens]

        total_s = timer.total_seconds()
        # RTF = serving wall per second of audio PRODUCED by that wall: the
        # batch runs as one device program, so the wall divides over the
        # batch's total audio (dividing it by each request's own duration
        # would overstate RTF ~B× vs the reference's per-request accounting,
        # bin/server.rs:631-676)
        total_audio_s = sum(len(w) for w in audios) / C.SAMPLE_RATE
        batch_rtf = (total_s / total_audio_s) if total_audio_s > 0 else 0.0
        out = []
        for g, wav in zip(gens, audios):
            out.append(SynthesisResult(
                audio=wav, sample_rate=C.SAMPLE_RATE,
                global_tokens=g.global_tokens,
                semantic_tokens=g.semantic_tokens,
                timings_ms=timer.as_ms(),
                rtf=batch_rtf,
            ))
        return out

    # ------------------------------------------------------------------
    # enrollment (voice cloning extraction)
    # ------------------------------------------------------------------

    def extract_voice_tokens(self, audio_path: str):
        """ref audio file → (global_tokens, semantic_tokens, duration_s).
        Chain parity: bin/server.rs:195-276 + ref_audio_utilities.rs:1047-1257."""
        if self.w2v_params is None:
            raise RuntimeError("wav2vec2 weights not loaded")
        pa = load_and_process(audio_path)
        z = zero_mean_unit_variance(pa.wav)
        if isinstance(self.w2v_params, wav2vec2.OnnxWav2Vec2):
            feat = self.w2v_params.extract(z[None, :])
        else:
            feat = wav2vec2.extract_features(
                self.w2v_params, z[None, :], self.w2v_cfg,
                output_layers=self.w2v_output_layers,
            )
        if isinstance(self.bicodec_params, bicodec.OnnxBiCodec):
            sem, glob = self.bicodec_params.encode(feat, pa.ref_mel[None])
        else:
            sem, glob = bicodec.encode(
                self.bicodec_params, feat, pa.ref_mel[None], self.bicodec_cfg
            )
        sem = [int(x) for x in np.asarray(sem[0])]
        glob = [int(x) for x in np.asarray(glob[0])]
        return glob, sem, pa.duration

    def extract_voice_tokens_cached(self, audio_path: str):
        """:func:`extract_voice_tokens` behind a file-checksum cache, so a
        ref-audio file reused across requests tokenizes once. The C++
        sibling persists the same thing per checksum
        (参考/C/tts/sparktts.cpp:278-382); here it is an in-memory LRU
        (the durable equivalent is voice ENROLLMENT — the .raf store)."""
        import hashlib

        with open(audio_path, "rb") as f:
            key = hashlib.sha256(f.read()).hexdigest()
        with self._extract_cache_lock:
            if key in self._extract_cache:
                self._extract_cache.move_to_end(key)
                return self._extract_cache[key]
        out = self.extract_voice_tokens(audio_path)
        with self._extract_cache_lock:
            self._extract_cache[key] = out
            while len(self._extract_cache) > self._extract_cache_cap:
                self._extract_cache.popitem(last=False)
        return out

    def enroll_voice(self, audio_path: str, name: str, prompt_text: str = ""):
        if self.voice_store is None:
            raise RuntimeError("no voice store configured")
        glob, sem, dur = self.extract_voice_tokens(audio_path)
        return self.voice_store.save(
            name=name, prompt_text=prompt_text, global_tokens=glob,
            semantic_tokens=sem, audio_duration=dur,
            sample_rate=C.SAMPLE_RATE,
        )

    # ------------------------------------------------------------------
    # saving
    # ------------------------------------------------------------------

    @staticmethod
    def save_audio(result: SynthesisResult, path: str) -> None:
        if path.lower().endswith(".mp3"):
            blob = audio_io.encode_mp3(result.audio, result.sample_rate)
        else:
            blob = audio_io.encode_wav_16bit(result.audio, result.sample_rate)
        with open(path, "wb") as f:
            f.write(blob)


# ---------------------------------------------------------------------------
# warmup: precompile the serving-path programs before traffic arrives
# ---------------------------------------------------------------------------

def _warmup_pipeline(self, prefill_buckets=None, detok_buckets=(64, 256, 1024),
                     zero_shot_too: bool = True,
                     batch_ladder=None,
                     budget_s: Optional[float] = None) -> Dict[str, float]:
    """Compile the hot programs up front (first-request latency otherwise
    pays for prefill-bucket + stage + vocoder compiles). Returns per-program
    wall seconds. The reference has no analog — its wgpu pipelines compile
    lazily per shape too, it just never addressed it.

    ``batch_ladder``: lm_program batch widths to warm. generate_batch pads
    to pow2 buckets capped at engine_cfg.batch_size (over-half-cap batches
    run at the cap), so the DEFAULT ladder is every width serving can hit:
    {1, 2, 4, …} ∪ {cap}. Warming batch=1 only (the r3 behavior) left
    batches of 2/4/8 to cold-compile on first traffic — the soak's early
    p99 spikes (ADVICE r3 #1). The persistent compile cache makes this a
    once-per-config cost.

    ``budget_s``: optional wall-clock cap (VERDICT r4 #8 — the full set
    has grown to ~40 programs). Once exceeded, remaining steps are
    SKIPPED and listed under the returned ``"skipped"`` key: the
    operator trades startup time for first-traffic p99 (a skipped shape
    cold-compiles on the first request that hits it, served from the
    persistent cache on every later start). Steps warm in serving-
    criticality order — the lm_program ladder first, then the staged
    long-prompt chain, speaker cache, vocoder buckets, streaming
    windows. Measured cold/warm startup walls are in docs/DEPLOY.md."""
    import jax.numpy as jnp

    from .engine import global_stage, lm_program, semantic_stage

    eng = self.engine
    cfg, ecfg = eng.cfg, eng.engine_cfg
    out: Dict[str, float] = {}
    t_warm0 = time.perf_counter()
    skipped: List[str] = []

    def over(label: str) -> bool:
        if budget_s is not None and \
                time.perf_counter() - t_warm0 > budget_s:
            skipped.append(label)
            return True
        return False
    modes = (False, True) if zero_shot_too else (False,)
    buckets = prefill_buckets or ecfg.prefill_buckets[:2]
    if batch_ladder is None:
        batch_ladder = []
        b = 1
        while b < ecfg.batch_size:
            batch_ladder.append(b)
            b *= 2
        batch_ladder.append(ecfg.batch_size)   # covers non-pow2 caps too
    if eng.tp_mesh is None:
        # serving runs the ONE-dispatch lm_program (generate_batch's fused
        # path) — warm exactly that, per prefill bucket × mode × batch
        # width. Warming the staged programs here would compile variants
        # short-prompt serving never executes and leave the fused path
        # cold.
        for B in batch_ladder:
            keys = jnp.zeros((B, 2), jnp.uint32)
            limits = jnp.ones((B,), jnp.int32)
            hard_min = jnp.zeros((B,), jnp.int32)
            for T in buckets:
                for zs in modes:
                    label = f"lm_{'zs' if zs else 'normal'}_{T}_b{B}"
                    if over(label):
                        continue
                    t0 = time.perf_counter()
                    _, sem, _ = lm_program(
                        eng.params, jnp.zeros((B, T), jnp.int32),
                        jnp.full((B,), T, jnp.int32), keys, keys, limits,
                        hard_min, cfg, ecfg.max_semantic_tokens, zs,
                        use_pallas_fwd=eng.use_pallas,
                        use_pallas_step=eng.use_pallas_step)
                    sem.block_until_ready()
                    out[label] = round(time.perf_counter() - t0, 2)
        B = 1
        keys = jnp.zeros((B, 2), jnp.uint32)
        limits = jnp.ones((B,), jnp.int32)
        # prompts LONGER than the largest bucket serve through the STAGED
        # branch (chunked prefill → global_stage → semantic_stage) — warm
        # those too or the first long-prompt request pays the cold
        # multi-minute tunnel compiles (r3 review finding). One chained
        # budget guard: the stages feed each other.
        if not over("staged_long_prompt"):
            Tmax = ecfg.prefill_buckets[-1]
            t0 = time.perf_counter()
            st = rwkv7.init_state(cfg, B)
            lg, st = rwkv7.forward(
                eng.params, jnp.zeros((B, Tmax), jnp.int32), st, cfg,
                use_pallas=eng.use_pallas,
                lengths=jnp.full((B,), Tmax, jnp.int32))
            lg.block_until_ready()
            out[f"prefill_{Tmax}"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            _, st2, lg2 = global_stage(eng.params, st, lg, keys, cfg,
                                       use_pallas=eng.use_pallas_step)
            lg2.block_until_ready()
            out["global_stage"] = round(time.perf_counter() - t0, 2)
            for zs in modes:
                t0 = time.perf_counter()
                sem, _, _ = semantic_stage(
                    eng.params, st2, lg2, keys, limits,
                    jnp.zeros((B,), jnp.int32), cfg,
                    ecfg.max_semantic_tokens,
                    zs, use_pallas=eng.use_pallas_step, feed_tag1=not zs)
                sem.block_until_ready()
                out[f"semantic_{'zs' if zs else 'normal'}"] = \
                    round(time.perf_counter() - t0, 2)
        if self.cached_speaker_default and not over("speaker_cache"):
            # cached-speaker serving: warm the enrollment programs (short
            # prefill bucket + B=1 global stage) through the real path —
            # also pre-populates the default-properties entries. API
            # requests that omit seed resolve under the seed=None key (a
            # distinct server-lifetime "default voice"), so warm BOTH keys
            # or the first no-seed request pays full enrollment (r4
            # advisor finding).
            t0 = time.perf_counter()
            self.get_cached_speaker(TtsArgs(text="", seed=0))
            self.get_cached_speaker(TtsArgs(text="", seed=None))
            out["speaker_cache"] = round(time.perf_counter() - t0, 2)
    else:
        # under TP a B=1 request pads to the data-axis width and runs
        # forward_tp + the STAGED programs with the step_fn hook — warm
        # those serving shapes exactly (feed_tag1 must match too)
        from ..parallel import mesh as meshlib
        from ..parallel import tp as tplib
        B = eng.tp_mesh.shape[meshlib.DATA_AXIS]
        ran_prefill = False
        for T in buckets:
            if over(f"prefill_{T}"):
                continue
            t0 = time.perf_counter()
            st = tplib.shard_state_tp(eng.tp_mesh, rwkv7.init_state(cfg, B))
            lg, st = tplib.forward_tp(
                eng.params, jnp.zeros((B, T), jnp.int32), st, cfg,
                eng.tp_mesh, lengths=jnp.full((B,), T, jnp.int32))
            lg.block_until_ready()
            out[f"prefill_{T}"] = round(time.perf_counter() - t0, 2)
            ran_prefill = True
        if ran_prefill and not over("tp_stages"):
            keys = jnp.zeros((B, 2), jnp.uint32)
            limits = jnp.ones((B,), jnp.int32)
            t0 = time.perf_counter()
            _, st2, lg2 = global_stage(eng.params, st, lg, keys, cfg,
                                       use_pallas=eng.use_pallas_step,
                                       step_fn=eng._step_fn)
            lg2.block_until_ready()
            out["global_stage"] = round(time.perf_counter() - t0, 2)
            for zs in modes:
                t0 = time.perf_counter()
                sem, lens, _ = semantic_stage(
                    eng.params, st2, lg2, keys, limits,
                    jnp.zeros((B,), jnp.int32), cfg,
                    ecfg.max_semantic_tokens,
                    zs, use_pallas=eng.use_pallas_step,
                    feed_tag1=not zs, step_fn=eng._step_fn)
                sem.block_until_ready()
                out[f"semantic_{'zs' if zs else 'normal'}"] = \
                    round(time.perf_counter() - t0, 2)
        elif not ran_prefill:
            skipped.append("tp_stages")
        if self.cached_speaker_default and not over("speaker_cache"):
            # enrollment under TP pads the prompt to the data-axis width
            # (engine.generate_speaker_tokens); warm it through the real
            # path here too — the non-TP branch alone left a TP server's
            # first cache miss cold AND crashed pre-r5 (B=1 prefill can't
            # shard over dp>1)
            t0 = time.perf_counter()
            self.get_cached_speaker(TtsArgs(text="", seed=0))
            self.get_cached_speaker(TtsArgs(text="", seed=None))
            out["speaker_cache"] = round(time.perf_counter() - t0, 2)
    for S in detok_buckets:
        if over(f"detokenize_{S}"):
            continue
        t0 = time.perf_counter()
        # default bucket ladder, same as serving: detokenize pads to
        # S + receptive_latents and buckets on DETOKENIZE_BUCKETS, so a
        # fixed bucket=(S,) here would compile shapes serving never uses.
        bicodec.detokenize(self.bicodec_params, [0] * 32, [0] * S,
                           self.bicodec_cfg)
        out[f"detokenize_{S}"] = round(time.perf_counter() - t0, 2)
    # streaming vocode windows: each latency mode compiles exactly two
    # [1, W] decode shapes (interior window + flush) that BYPASS the
    # detokenize bucket ladder — leaving them cold puts a multi-second
    # tunnel compile inside the first stream of each mode (the r4 probe
    # measured a 12 s first-flash-stream outlier)
    from .streaming import StreamingVocoder
    for mode in ("exact", "low", "ultra", "flash"):
        sv = StreamingVocoder(self.bicodec_params, self.bicodec_cfg,
                              [0] * 32, latency_mode=mode)
        for W in sorted({sv.window_bucket, sv.flush_bucket}):
            if over(f"stream_{mode}_{W}"):
                continue
            t0 = time.perf_counter()
            g = jnp.zeros((1, 32), jnp.int32)
            s = jnp.zeros((1, W), jnp.int32)
            if isinstance(self.bicodec_params, bicodec.OnnxBiCodec):
                self.bicodec_params.decode(g, s)
            else:
                bicodec.decode(self.bicodec_params, g, s, self.bicodec_cfg)
            out[f"stream_{mode}_{W}"] = round(time.perf_counter() - t0, 2)
    if skipped:
        out["skipped"] = skipped
        log.warning("warmup budget %.1fs exhausted: %d programs left cold "
                    "(%s…) — they compile on first hit, then persist in "
                    "the compile cache", budget_s or 0.0, len(skipped),
                    ", ".join(skipped[:4]))
    return out


TtsPipeline.warmup = _warmup_pipeline
