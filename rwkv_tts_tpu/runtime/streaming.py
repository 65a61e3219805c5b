"""Streaming synthesis: incremental BiCodec vocoding over a growing semantic
prefix.

The reference never solved this — its streaming module is a simulation that
sleeps and emits random logits (src/streaming_inference.rs:332-377,
SURVEY.md "north star"). Here:

  * the continuous engine delivers semantic tokens in blocks as they decode;
  * every ``chunk_tokens`` new tokens we vocode a window of
    ``context + new + lookahead`` latents and emit only the new samples —
    context and lookahead default to the decoder's receptive field
    (models/bicodec.receptive_latents), so emitted audio is bit-identical
    to a full bucketed decode at those offsets (tested);
  * windows are padded to a fixed bucket so XLA compiles one program.

First-audio latency therefore ≈ prefill + chunk_tokens/50 s of decode + one
vocoder window — independent of utterance length.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import BiCodecConfig
from ..models import bicodec


@dataclasses.dataclass
class StreamChunk:
    seq: int
    audio: np.ndarray        # f32 samples @16 kHz (possibly empty)
    final: bool


class StreamingVocoder:
    """Incremental tokens→audio for one utterance."""

    # (context, lookahead, max first-chunk) per latency mode; "exact" uses
    # the decoder's receptive field for both (bit-identical windows).
    # "flash" (the r2-verdict "ultra+") emits the first sound after only
    # chunk+lookahead = 12 semantic steps — 160 ms of audio per chunk;
    # further down the same conditioning-tail-truncation dial as "ultra"
    # (the wave generator's own receptive field is already wider than
    # ultra's lookahead; quality degrades gracefully, latency does not).
    LATENCY_PRESETS = {"low": (32, 16, 32), "ultra": (16, 8, 16),
                       "flash": (16, 4, 8)}

    def __init__(self, params, cfg: BiCodecConfig, global_tokens: List[int],
                 chunk_tokens: int = 32, context_tokens: Optional[int] = None,
                 lookahead_tokens: Optional[int] = None,
                 low_latency: bool = False, latency_mode: Optional[str] = None):
        self.params = params
        self.cfg = cfg
        self.global_tokens = [min(max(int(t), 0), C.GLOBAL_VOCAB - 1)
                              for t in (global_tokens or [0] * 32)]
        # default context/lookahead = the decoder's receptive field, so
        # emitted samples are bit-identical to a full bucketed decode.
        # ``latency_mode`` trades that exactness for time-to-first-audio:
        # first audio needs chunk+lookahead REAL tokens, and the full
        # receptive field is large (prenet ConvNeXt stacks), so exact mode
        # waits ~2 s of tokens before the first chunk. The short windows
        # still cover the wave generator's own receptive field; what they
        # truncate is the prenet's long smooth conditioning tail —
        # audible-artifact-free in practice, but not bit-exact. "ultra"
        # additionally shrinks the first chunk to 16 tokens (320 ms of
        # audio): first sound needs only 24 decode steps past TAG_1.
        if latency_mode is None:
            latency_mode = "low" if low_latency else "exact"
        if latency_mode not in ("exact",) and latency_mode not in self.LATENCY_PRESETS:
            raise ValueError(f"unknown latency_mode {latency_mode!r}")
        self.receptive = bicodec.receptive_latents(cfg)
        if latency_mode in self.LATENCY_PRESETS:
            ctx_d, la_d, ck_d = self.LATENCY_PRESETS[latency_mode]
            chunk_tokens = min(chunk_tokens, ck_d)
            context_tokens = (context_tokens if context_tokens is not None
                              else min(ctx_d, self.receptive))
            lookahead_tokens = (lookahead_tokens
                                if lookahead_tokens is not None
                                else min(la_d, self.receptive))
        self.chunk = chunk_tokens
        self.context = (context_tokens if context_tokens is not None
                        else self.receptive)
        # the vocoder's convs are centered (SAME), so output near a chunk's
        # right edge depends on future latents; hold back `lookahead` tokens
        # until their right context exists
        self.lookahead = (lookahead_tokens if lookahead_tokens is not None
                          else self.receptive)
        self.window_bucket = self.context + chunk_tokens + self.lookahead
        # flush windows carry up to chunk+lookahead-1 residual tokens PLUS
        # the receptive-field edge padding — always pad them to this one
        # fixed multiple of the bucket so streaming compiles exactly two
        # vocoder shapes (interior + flush), never a per-remainder ladder
        worst_flush = (self.context + self.chunk + self.lookahead - 1
                       + self.receptive)
        self.flush_bucket = (-(-worst_flush // self.window_bucket)
                             * self.window_bucket)
        self._tokens: List[int] = []
        self._emitted = 0        # tokens already vocoded+emitted

    def push(self, new_tokens: List[int], flush: bool = False
             ) -> np.ndarray:
        """Add tokens; returns newly available audio samples (may be empty).
        ``flush`` forces vocoding of any remainder (end of stream)."""
        self._tokens.extend(int(t) for t in new_tokens)
        out = []
        while len(self._tokens) - self._emitted >= self.chunk + self.lookahead:
            out.append(self._vocode_next(self.chunk, flush=False))
        if flush and len(self._tokens) > self._emitted:
            out.append(self._vocode_next(len(self._tokens) - self._emitted,
                                         flush=True))
        if not out:
            return np.zeros(0, np.float32)
        return np.concatenate(out)

    def _vocode_next(self, n_emit: int, flush: bool) -> np.ndarray:
        end = self._emitted + n_emit + (0 if flush else self.lookahead)
        start = max(0, self._emitted - self.context)
        ctx = self._emitted - start
        window = self._tokens[start:end]
        if flush:
            # final chunk: EDGE-pad by ≥ the receptive field — the exact
            # padding detokenize() applies past the end of the utterance —
            # so the tail samples match the full bucketed decode. One fixed
            # shape (see flush_bucket); extra edge padding is trimmed.
            padded = self.flush_bucket
        else:
            # interior chunk: real lookahead covers the emitted region's
            # right receptive field; bucket filler beyond it is inaudible
            padded = self.window_bucket
        sem = np.asarray(window + [window[-1]] * (padded - len(window)),
                         np.int32)[None]
        g = np.asarray(self.global_tokens, np.int32)[None]
        if isinstance(self.params, bicodec.OnnxBiCodec):
            wav = self.params.decode(jnp.asarray(g), jnp.asarray(sem))
        else:
            wav = bicodec.decode(self.params, jnp.asarray(g),
                                 jnp.asarray(sem), self.cfg)
        hop = C.LATENT_HOP_LENGTH
        audio = np.asarray(wav[0, ctx * hop: (ctx + n_emit) * hop], np.float32)
        self._emitted += n_emit
        return audio


def stream_synthesize(continuous_engine, bicodec_params, bicodec_cfg,
                      args, chunk_tokens: int = 32,
                      timeout: float = 600.0,
                      low_latency: bool = False,
                      latency_mode: Optional[str] = None
                      ) -> Iterator[StreamChunk]:
    """Generator yielding audio chunks for one request.

    For normal-mode requests the speaker (global) tokens only exist once the
    global stage finishes, so vocoding starts at the first semantic chunk
    (≈ 32 global steps after prefill). Zero-shot requests vocode from the
    first block.
    """
    q: "queue.Queue" = queue.Queue()
    done = threading.Event()
    box = {}

    def chunk_cb(req, toks):
        q.put(list(toks))

    def result_cb(res):
        box["res"] = res
        done.set()
        q.put(None)

    continuous_engine.submit(args, result_cb, chunk_cb=chunk_cb)

    vocoder: Optional[StreamingVocoder] = None
    seq = 0
    import time as _time
    deadline = _time.monotonic() + timeout
    while True:
        try:
            item = q.get(timeout=max(0.0, deadline - _time.monotonic()))
        except queue.Empty:
            raise TimeoutError("streaming synthesis timed out")
        if item is None:
            res = box["res"]
            if isinstance(res, Exception):
                # the decode loop failed this request (continuous._run):
                # surface it — a flushed partial chunk marked final would
                # report truncated audio as a clean completion
                raise res
            if vocoder is None:
                vocoder = StreamingVocoder(bicodec_params, bicodec_cfg,
                                           res.global_tokens, chunk_tokens,
                                           low_latency=low_latency,
                                           latency_mode=latency_mode)
            audio = vocoder.push([], flush=True)
            yield StreamChunk(seq=seq, audio=audio, final=True)
            return
        if vocoder is None:
            # global tokens are final once semantic tokens start arriving
            live_globals = _resolve_globals(continuous_engine, args, box,
                                            done)
            vocoder = StreamingVocoder(bicodec_params, bicodec_cfg,
                                       live_globals, chunk_tokens,
                                       low_latency=low_latency,
                                       latency_mode=latency_mode)
        audio = vocoder.push(item)
        if audio.size:
            yield StreamChunk(seq=seq, audio=audio, final=False)
            seq += 1


def _resolve_globals(engine, args, box, done) -> List[int]:
    """Speaker tokens for the vocoder, in trust order: the live slot, the
    finished result, the request's own reference tokens. A short request
    can retire (result_cb + slot pop happen in the same block iteration as
    its chunk_cb) before the consumer thread builds the vocoder — falling
    back to zeros there would silently vocode the WHOLE utterance in a
    wrong default voice."""
    with engine._lock:
        for live in engine._live.values():
            if live.request is args:
                return list(live.global_tokens)
    res = box.get("res")
    if res is None and done.wait(timeout=10.0):
        # close the retire window: the engine pops the slot from _live
        # BEFORE result_cb stores the result — a consumer waking on the
        # first chunk in that gap would find neither (TOCTOU). result_cb
        # fires within the same block iteration, so the wait is ~instant.
        res = box.get("res")
    if res is not None and not isinstance(res, Exception):
        return list(res.global_tokens)
    if args.ref_global_tokens:
        return list(args.ref_global_tokens)
    raise RuntimeError(
        "streaming: request is no longer live and no result is available "
        "to resolve its speaker tokens")
