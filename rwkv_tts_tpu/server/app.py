"""HTTP serving layer: REST API + embedded Web UI.

Route and payload parity with the reference server (bin/server.rs:1445-1451):

  POST /api/tts                  {text, temperature?, top_p?, speed (number
                                  or class string), voice_id?, seed?, age?,
                                  gender?, emotion?, pitch?, prompt_text?}
                                  → {success, message, audio_base64,
                                     duration_ms, rtf}
  POST /api/tts/stream           same body as /api/tts; responds with
                                  chunked JSON lines {seq, audio_base64
                                  (raw s16le PCM), final} as audio becomes
                                  available (true streaming — the
                                  reference's streaming module is a stub)
  POST /api/voice-clone/extract  multipart {voice_name, prompt_text,
                                  audio_file} → {success, message, voice_id}
  GET  /api/voice-clone/list     → {success, voices: [...]}
  POST /api/voice-clone/delete   {voice_id} → {success, message}
  GET  /{*path}                  embedded static UI
  GET  /metrics                  Prometheus text (new — the reference has
                                  stats structs but no endpoint, SURVEY.md §5)

Run: ``python -m rwkv_tts_tpu.server.app --port 3000 [--model-path …]``.
Without a checkpoint on disk it serves with random weights (dev mode) so the
whole stack stays drivable end-to-end.
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import json
import logging
import os
import tempfile
import time
import uuid

# Platform override BEFORE any package import (package modules keep
# module-level device constants, so the backend initializes at import
# time). The plain JAX_PLATFORMS env var is not enough on hosts whose
# sitecustomize re-pins it (this repo's TPU-tunnel environment does);
# jax.config wins over the env var, so RWKV_TTS_PLATFORM=cpu reliably
# gets a CPU server for dev/CI.
if os.environ.get("RWKV_TTS_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["RWKV_TTS_PLATFORM"])

from aiohttp import web

from .. import constants as C
from ..config import BatchConfig, BiCodecConfig, EngineConfig, RwkvConfig, TtsArgs, Wav2Vec2Config
from ..runtime.batching import DynamicBatcher, InferenceTimeout
from ..runtime.pipeline import TtsPipeline
from ..runtime.voice_store import VoiceStore
from ..audio.io import encode_wav_16bit

log = logging.getLogger("rwkv_tts_tpu.server")

STATIC_DIR = os.path.join(os.path.dirname(__file__), "static")

_ALLOWED_SPEEDS = {"very_slow", "slow", "medium", "fast", "very_fast"}


def coerce_speed(value) -> str:
    """Accept a class string or a number (server thresholds differ from the
    property classifier — bin/server.rs:528-554: ≤3.4 / ≤4.0 / ≤4.5 / ≤4.8)."""
    if value is None:
        return "medium"
    if isinstance(value, str):
        return value if value in _ALLOWED_SPEEDS else "medium"
    try:
        x = float(value)
    except (TypeError, ValueError):
        return "medium"
    if x <= 3.4:
        return "very_slow"
    if x <= 4.0:
        return "slow"
    if x <= 4.5:
        return "medium"
    if x <= 4.8:
        return "fast"
    return "very_fast"


def build_tts_args(payload: dict) -> TtsArgs:
    return TtsArgs(
        text=str(payload.get("text", "")),
        temperature=float(payload.get("temperature") or 1.0),
        top_p=float(payload.get("top_p") or 0.95),
        top_k=100,                         # hardcoded like the reference (:556-584)
        max_tokens=8000,
        seed=(int(payload["seed"]) if payload.get("seed") is not None else None),
        voice_id=payload.get("voice_id") or None,
        prompt_text=str(payload.get("prompt_text") or ""),
        age=str(payload.get("age") or "youth-adult"),
        gender=str(payload.get("gender") or "female"),
        emotion=str(payload.get("emotion") or "NEUTRAL"),
        pitch=str(payload.get("pitch") or "medium_pitch"),
        speed=coerce_speed(payload.get("speed")),
        # cached-speaker fast path: absent → follow the server default
        # (--cached-speaker); explicit true/false overrides per request
        cached_speaker=(bool(payload["cached_speaker"])
                        if payload.get("cached_speaker") is not None
                        else None),
    )


# --------------------------------------------------------------------------
# handlers
# --------------------------------------------------------------------------

def _validate_voice(app, args: TtsArgs) -> None:
    """HTTP-layer voice_id validation, like the reference server
    (bin/server.rs:498-500 errors the request): the PIPELINE falls back
    down the voice chain on a bad id (library parity), so without this
    check an HTTP typo would silently synthesize the default voice."""
    if args.voice_id:
        store = app["voice_store"]
        if store is None:
            raise FileNotFoundError(f"voice not found: {args.voice_id}")
        store.load(args.voice_id)      # raises FileNotFoundError on miss


async def handle_tts(request: web.Request) -> web.Response:
    app = request.app
    try:
        payload = await request.json()
    except Exception:
        return _err("invalid JSON body", status=400)
    text = str(payload.get("text", "")).strip()
    if not text:
        return _err("text is required", status=400)
    try:
        args = build_tts_args(payload)
    except (TypeError, ValueError) as e:
        return _err(f"invalid parameter: {e}", status=400)
    t0 = time.perf_counter()
    try:
        _validate_voice(app, args)
        cont = app["runtime"].get("continuous")
        use_cont = (app.get("tts_engine_mode", "continuous") == "continuous"
                    # graceful degradation: a crashed decode loop fast-
                    # fails submits, but the static engine still works —
                    # keep serving (healthz reports degraded/503 so the
                    # orchestrator recycles the process meanwhile)
                    and not (cont is not None and cont._crashed is not None))
        if use_cont:
            result = await _tts_via_continuous(app, args)
        else:
            result = await app["batcher"].submit(args)
    except InferenceTimeout as e:
        return _err(str(e), status=504)
    except FileNotFoundError as e:
        return _err(str(e), status=404)
    except Exception as e:  # noqa: BLE001
        log.exception("tts failed")
        return _err(f"synthesis failed: {e}", status=500)
    wav = encode_wav_16bit(result.audio, result.sample_rate)
    dur_ms = int((time.perf_counter() - t0) * 1000)
    app["metrics"]["tts_requests"] += 1
    app["metrics"]["tts_audio_seconds"] += len(result.audio) / result.sample_rate
    app["hist_latency"].observe(dur_ms / 1000.0)
    app["hist_rtf"].observe(result.rtf)
    return web.json_response({
        "success": True,
        "message": "ok",
        "audio_base64": base64.b64encode(wav).decode(),
        "duration_ms": dur_ms,
        "rtf": result.rtf,
        "timings_ms": result.timings_ms,
    })


async def _tts_via_continuous(app, args: TtsArgs):
    """Serve one non-streaming /api/tts request through the continuous
    slot engine (round 5, VERDICT r4 #2: unify serving on continuous).

    The previous default put every /api/tts batch through the static
    ``lm_program`` — an unpreemptible up-to-~1 s device program that
    blocked every live stream's next decode block while it ran (the
    measured mixed-load p99 head-of-line tail, docs/PERF.md r4). Here the
    request occupies one slot of the SAME decode-block loop the streams
    ride, so a long request batch and a stream interleave at block
    granularity instead. The reference's batch manager serializes
    requests on the device either way (dynamic_batch_manager.rs:419-421);
    the engines here are token-identical by test
    (tests/test_continuous.py), so routing is a serving-path choice, not
    a numerics change. The static path stays for offline/batch use
    (``--tts-engine static``, ``TtsPipeline.synthesize_batch``)."""
    loop = asyncio.get_running_loop()
    pipe: TtsPipeline = app["pipeline"]
    # resolve OFF the event loop (cached-speaker enrollment / ref-audio
    # featurization can run device programs — same as the stream path)
    resolved = await loop.run_in_executor(None, pipe.resolve_voice, args)
    cont = await _get_continuous_async(app)
    fut: asyncio.Future = loop.create_future()

    def _cb(res):
        def settle():
            if fut.done():
                return
            if isinstance(res, Exception):
                fut.set_exception(res)
            else:
                fut.set_result(res)
        try:
            loop.call_soon_threadsafe(settle)
        except RuntimeError:
            pass   # loop closed: server teardown mid-request

    t_gen = time.perf_counter()
    cont.submit(resolved, _cb)
    timeout_s = app["batch_cfg"].inference_timeout_ms / 1000.0
    try:
        gen = await asyncio.wait_for(fut, timeout=timeout_s)
    except asyncio.TimeoutError:
        # retire the slot (live) or drop from the admission queue
        # (pending) — never keep decoding for a caller that gave up
        cont.cancel(resolved)
        raise InferenceTimeout(
            f"inference exceeded {app['batch_cfg'].inference_timeout_ms:.0f}"
            " ms") from None
    except asyncio.CancelledError:
        cont.cancel(resolved)   # client disconnected
        raise
    gen_ms = (time.perf_counter() - t_gen) * 1000.0
    t_voc = time.perf_counter()
    wav = await loop.run_in_executor(None, pipe.vocode, gen)
    detok_ms = (time.perf_counter() - t_voc) * 1000.0
    return pipe.assemble_result(
        gen, wav, {"generate": round(gen_ms, 1),
                   "detokenize": round(detok_ms, 1)})


async def _get_continuous_async(app):
    """Build the continuous engine off the event loop (device allocations
    through a remote TPU tunnel take seconds; building inline would stall
    every other request on the single loop), guarded against concurrent
    first requests."""
    rt = app["runtime"]
    if rt.get("continuous") is not None:
        return rt["continuous"]
    async with rt["lock"]:
        if rt.get("continuous") is None:
            loop = asyncio.get_running_loop()
            await loop.run_in_executor(None, _get_continuous, app)
    return rt["continuous"]


def _get_continuous(app):
    """Build (or return) the continuous slot engine sharing the pipeline's
    LM. Synchronous — HTTP paths use _get_continuous_async. Lives in the
    mutable app["runtime"] holder (aiohttp deprecates app-state writes
    after startup)."""
    if app["runtime"].get("continuous") is None:
        from ..runtime.continuous import ContinuousEngine
        pipe: TtsPipeline = app["pipeline"]
        eng = pipe.engine
        # since r5 this engine also serves non-streaming /api/tts, so it
        # must offer at least the request concurrency the DynamicBatcher
        # was configured for (in production both knobs come from
        # --batch-size; a smaller engine cap would otherwise throttle
        # the burst throughput the batcher used to deliver)
        slots = max(eng.engine_cfg.batch_size,
                    app["batch_cfg"].max_batch_size)
        if eng.tp_mesh is not None:
            # keep --tp on the streaming path: the continuous engine runs
            # the sharded step/prefill over the same mesh (params already
            # sharded; slots must tile the data axis)
            from ..parallel import mesh as meshlib
            dp = eng.tp_mesh.shape[meshlib.DATA_AXIS]
            slots = max(slots, dp) - (max(slots, dp) % dp) or dp
        app["runtime"]["continuous"] = ContinuousEngine(
            eng.params, eng.cfg, eng.engine_cfg, tokenizer=eng.tokenizer,
            use_pallas=eng.use_pallas,
            # --stream-block: decode-block size gates streaming first-chunk
            # granularity (flash mode needs only 12 tokens; the default
            # block 16 would hold its first chunk one block anyway, but a
            # block of 8 lets flash emit a block earlier at a small
            # dispatch-frequency cost)
            block=app.get("stream_block", 16),
            slots=slots, mesh=eng.tp_mesh)
    return app["runtime"]["continuous"]


async def handle_tts_stream(request: web.Request) -> web.StreamResponse:
    """Chunked streaming synthesis over the continuous batcher."""
    import numpy as np
    from ..runtime.streaming import stream_synthesize

    app = request.app
    try:
        payload = await request.json()
    except Exception:
        return _err("invalid JSON body", status=400)
    text = str(payload.get("text", "")).strip()
    if not text:
        return _err("text is required", status=400)
    try:
        args = build_tts_args(payload)
        _validate_voice(app, args)
        # resolve OFF the event loop: the cached-speaker rung can run a
        # device program on a cache miss (32-token speaker enrollment),
        # and the ref-audio rung can extract features — blocking work
        # that would stall every concurrent request if run inline here
        args = await asyncio.get_running_loop().run_in_executor(
            None, app["pipeline"].resolve_voice, args)
    except (TypeError, ValueError) as e:
        return _err(f"invalid parameter: {e}", status=400)
    except FileNotFoundError as e:
        return _err(str(e), status=404)
    latency_mode = payload.get("latency_mode")
    if latency_mode is not None and latency_mode not in (
            "exact", "low", "ultra", "flash"):
        return _err("latency_mode must be exact|low|ultra|flash", status=400)
    cont = await _get_continuous_async(app)
    pipe: TtsPipeline = app["pipeline"]

    resp = web.StreamResponse(headers={
        "Content-Type": "application/x-ndjson",
        "Cache-Control": "no-cache",
    })
    await resp.prepare(request)
    loop = asyncio.get_running_loop()
    aq: asyncio.Queue = asyncio.Queue()

    import threading
    abandoned = threading.Event()

    def _post(item) -> bool:
        """Hand an item to the consumer; False once the stream is dead.

        The producer thread can outlive the event loop (server shutdown
        mid-stream): ``call_soon_threadsafe`` then raises RuntimeError
        ("Event loop is closed") as an unhandled daemon-thread exception.
        Treat a closed loop like an abandoned stream instead.
        """
        if abandoned.is_set():
            return False
        try:
            loop.call_soon_threadsafe(aq.put_nowait, item)
            return True
        except RuntimeError:
            abandoned.set()
            return False

    def producer():
        try:
            for chunk in stream_synthesize(
                    cont, pipe.bicodec_params, pipe.bicodec_cfg, args,
                    low_latency=bool(payload.get("low_latency", False)),
                    latency_mode=latency_mode):
                if not _post(chunk):
                    break
        except Exception as e:  # noqa: BLE001
            _post(e)
        if abandoned.is_set():
            # nobody is reading: retire the slot so the engine stops
            # generating for a dead stream (same starvation guard as the
            # consumer's disconnect path)
            try:
                cont.cancel(args)
            except Exception:  # noqa: BLE001 — engine may be stopping too
                pass
        _post(None)

    streams = app["runtime"].setdefault("streams", set())
    streams.add(abandoned)
    threading.Thread(target=producer, daemon=True).start()
    t0 = time.perf_counter()
    first_chunk_ms = None
    try:
        while True:
            item = await aq.get()
            if item is None:
                break
            if isinstance(item, Exception):
                # retire the slot too: a producer-side error (vocoder
                # failure, stream timeout) can leave the engine still
                # generating for nobody — same starvation the disconnect
                # path below guards against
                cont.cancel(args)
                await resp.write(json.dumps(
                    {"error": str(item), "final": True}).encode() + b"\n")
                break
            pcm = np.clip(item.audio, -1.0, 1.0)
            pcm16 = (pcm * 32767.0).astype("<i2").tobytes()
            if first_chunk_ms is None and len(pcm16):
                first_chunk_ms = (time.perf_counter() - t0) * 1000.0
                app["hist_first_chunk"].observe(first_chunk_ms / 1000.0)
            await resp.write(json.dumps({
                "seq": item.seq,
                "audio_base64": base64.b64encode(pcm16).decode(),
                "sample_rate": C.SAMPLE_RATE,
                "final": item.final,
                "first_chunk_ms": round(first_chunk_ms, 1)
                if item.final and first_chunk_ms else None,
            }).encode() + b"\n")
            if item.final:
                break
    except asyncio.CancelledError:
        # client went away: retire the slot and stop the producer — the
        # request would otherwise keep decoding/vocoding for nobody and
        # starve live requests of slots
        cont.cancel(args)
        raise
    except (ConnectionResetError, ConnectionError):
        # same cleanup, but return instead of re-raising: a reset mid-
        # write is ordinary client-abort traffic (the soak drives it on
        # purpose), and re-raising makes aiohttp log a full traceback
        # per abort ("Error handling request") — log noise, not signal
        cont.cancel(args)
        log.info("stream client disconnected mid-write")
        return resp
    finally:
        streams.discard(abandoned)
        try:
            await resp.write_eof()
        except (ConnectionResetError, ConnectionError):
            pass
    app["metrics"]["tts_stream_requests"] =         app["metrics"].get("tts_stream_requests", 0) + 1
    return resp


async def handle_voice_extract(request: web.Request) -> web.Response:
    app = request.app
    reader = await request.multipart()
    voice_name, prompt_text, tmp_path = "", "", None
    suffix = ".wav"
    try:
        async for part in reader:
            if part.name == "voice_name":
                voice_name = (await part.text()).strip()
            elif part.name == "prompt_text":
                prompt_text = (await part.text()).strip()
            elif part.name == "audio_file":
                fn = (part.filename or "").lower()
                if fn.endswith(".mp3"):
                    suffix = ".mp3"
                fd, tmp_path = tempfile.mkstemp(
                    prefix=f"voice_{uuid.uuid4().hex[:8]}_", suffix=suffix)
                with os.fdopen(fd, "wb") as f:
                    while True:
                        chunk = await part.read_chunk(1 << 20)
                        if not chunk:
                            break
                        f.write(chunk)
        if not voice_name:
            return _err("voice_name is required", status=400)
        if tmp_path is None:
            return _err("audio_file is required", status=400)
        loop = asyncio.get_running_loop()
        feat = await loop.run_in_executor(
            None, app["pipeline"].enroll_voice, tmp_path, voice_name, prompt_text)
        app["metrics"]["voices_extracted"] += 1
        return web.json_response({
            "success": True, "message": "voice extracted",
            "voice_id": feat.id,
        })
    except Exception as e:  # noqa: BLE001
        log.exception("voice extract failed")
        return _err(f"voice extraction failed: {e}", status=500)
    finally:
        if tmp_path and os.path.exists(tmp_path):
            os.remove(tmp_path)


async def handle_voice_list(request: web.Request) -> web.Response:
    store: VoiceStore = request.app["voice_store"]
    if store is None:  # store-less pipeline: an empty library, not a 500
        return web.json_response({"success": True, "voices": []})
    return web.json_response({"success": True, "voices": store.list()})


async def handle_voice_delete(request: web.Request) -> web.Response:
    store: VoiceStore = request.app["voice_store"]
    try:
        payload = await request.json()
        vid = payload["voice_id"]
    except Exception:
        return _err("voice_id is required", status=400)
    if store is None:
        return _err(f"voice not found: {vid}", status=404)
    ok = store.delete(vid)
    return web.json_response({
        "success": ok,
        "message": "deleted" if ok else f"voice not found: {vid}",
    }, status=200 if ok else 404)


async def handle_trace(request: web.Request) -> web.Response:
    """On-demand device profiling: POST /debug/trace {"seconds": 3} captures
    a jax.profiler trace (TensorBoard format) and returns its directory.
    (The reference has only hand-rolled stopwatch logging — SURVEY.md §5
    notes "no sampling profiler"; this closes that gap.)"""
    import jax

    try:
        payload = await request.json()
    except Exception:
        payload = {}
    seconds = float(payload.get("seconds", 3.0))
    seconds = min(max(seconds, 0.5), 60.0)
    out_dir = payload.get("dir") or os.path.join(
        tempfile.gettempdir(), f"rwkv_tts_trace_{int(time.time())}")
    loop = asyncio.get_running_loop()

    def capture():
        jax.profiler.start_trace(out_dir)
        time.sleep(seconds)
        jax.profiler.stop_trace()

    await loop.run_in_executor(None, capture)
    return web.json_response({"success": True, "trace_dir": out_dir,
                              "seconds": seconds})


async def handle_healthz(request: web.Request) -> web.Response:
    app = request.app
    cont = app["runtime"].get("continuous")
    # a crashed decode loop bricks /api/tts/stream (and the continuous
    # /api/tts default falls back to the static engine) — report
    # degraded (503) so orchestrators recycle the process
    crashed = cont is not None and cont._crashed is not None
    body = {
        "status": "degraded" if crashed else "ok",
        "uptime_s": round(time.monotonic() - app["t_start"], 1),
        "tts_engine": app.get("tts_engine_mode", "continuous"),
        "model": {
            "n_layer": app["pipeline"].engine.cfg.n_layer,
            "n_embd": app["pipeline"].engine.cfg.n_embd,
            "vocab": app["pipeline"].engine.cfg.vocab_size,
        },
    }
    if crashed:
        body["continuous_error"] = str(cont._crashed)
    return web.json_response(body, status=503 if crashed else 200)


async def handle_metrics(request: web.Request) -> web.Response:
    m = dict(request.app["metrics"])
    m.update({f"batcher_{k}": v for k, v in request.app["batcher"].stats.items()})
    cont = request.app["runtime"].get("continuous")
    if cont is not None:
        with cont._lock:
            m["continuous_live_slots"] = len(cont._live)
        m["continuous_slots"] = cont.B
        m["continuous_blocks"] = cont._block_seq
        m["continuous_crashed"] = int(cont._crashed is not None)
        m.update({f"continuous_loop_{k}": round(v, 4)
                  if isinstance(v, float) else v
                  for k, v in cont.stats.items()})
    store = request.app["voice_store"]
    if store is not None:   # a pipeline without a voice store is supported
        m.update({f"voice_cache_{k}": v for k, v in store.stats().items()})
    lines = [f"rwkv_tts_{k} {v}" for k, v in sorted(m.items())]
    lines += request.app["hist_latency"].render()
    lines += request.app["hist_rtf"].render()
    lines += request.app["hist_first_chunk"].render()
    if cont is not None:
        # per-request serving-stage breakdown (queue wait, first emit) —
        # owned by the continuous engine so attribution works without an
        # HTTP layer too (VERDICT r3 #2)
        for h in cont.hist.values():
            lines += h.render()
    return web.Response(text="\n".join(lines) + "\n",
                        content_type="text/plain")


async def handle_index(request: web.Request) -> web.Response:
    return web.FileResponse(os.path.join(STATIC_DIR, "index.html"))


def _err(msg: str, status: int = 500) -> web.Response:
    return web.json_response({"success": False, "error": msg,
                              "message": msg}, status=status)


# --------------------------------------------------------------------------
# middlewares (CORS + request logging, bin/server.rs:988-1026)
# --------------------------------------------------------------------------

@web.middleware
async def cors_middleware(request, handler):
    if request.method == "OPTIONS":
        resp = web.Response()
    else:
        try:
            resp = await handler(request)
        except web.HTTPException as e:
            # 404/405/... are raised, not returned — without the headers
            # the browser reports an opaque CORS failure instead of the
            # actual error payload
            _cors(e)
            raise
    _cors(resp)
    return resp


def _cors(resp):
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
    resp.headers["Access-Control-Allow-Headers"] = "Content-Type"


@web.middleware
async def logging_middleware(request, handler):
    t0 = time.perf_counter()
    resp = await handler(request)
    log.info("%s %s -> %s (%.1f ms)", request.method, request.path,
             resp.status, (time.perf_counter() - t0) * 1000)
    return resp


# --------------------------------------------------------------------------
# app factory
# --------------------------------------------------------------------------

def create_app(pipeline: TtsPipeline, batch_cfg: BatchConfig = BatchConfig(),
               stream_block: int = 16,
               tts_engine: str = "continuous") -> web.Application:
    """``tts_engine``: which engine serves non-streaming /api/tts —
    ``"continuous"`` (default since r5: slot engine shared with streams,
    no static-batch head-of-line blocking) or ``"static"`` (the
    DynamicBatcher → lm_program path, still the offline/batch tool)."""
    if tts_engine not in ("continuous", "static"):
        raise ValueError(f"tts_engine must be continuous|static, "
                         f"got {tts_engine!r}")
    app = web.Application(middlewares=[cors_middleware, logging_middleware],
                          client_max_size=100 * 1024 * 1024)
    app["pipeline"] = pipeline
    app["stream_block"] = int(stream_block)
    app["tts_engine_mode"] = tts_engine
    app["batch_cfg"] = batch_cfg
    app["voice_store"] = pipeline.voice_store
    app["batcher"] = DynamicBatcher(pipeline, batch_cfg)
    from ..utils.metrics import (
        LATENCY_BUCKETS, RTF_BUCKETS, Histogram,
    )
    app["hist_latency"] = Histogram(
        "rwkv_tts_request_seconds", LATENCY_BUCKETS,
        "End-to-end /api/tts wall time")
    app["hist_rtf"] = Histogram(
        "rwkv_tts_rtf", RTF_BUCKETS,
        "Per-request real-time factor (synthesis wall / audio seconds)")
    from ..utils.metrics import STAGE_BUCKETS
    app["hist_first_chunk"] = Histogram(
        "rwkv_tts_stage_first_chunk_seconds", STAGE_BUCKETS,
        "Stream request start to first audio chunk written (incl. vocode)")
    app["metrics"] = {"tts_requests": 0, "tts_audio_seconds": 0.0,
                      "voices_extracted": 0}
    app["t_start"] = time.monotonic()
    # late-built runtime objects live in this mutable holder (aiohttp
    # deprecates writing app state after startup)
    app["runtime"] = {"continuous": None, "lock": asyncio.Lock()}

    app.router.add_post("/api/tts", handle_tts)
    app.router.add_post("/api/tts/stream", handle_tts_stream)
    app.router.add_post("/api/voice-clone/extract", handle_voice_extract)
    app.router.add_get("/api/voice-clone/list", handle_voice_list)
    app.router.add_post("/api/voice-clone/delete", handle_voice_delete)
    app.router.add_get("/healthz", handle_healthz)
    app.router.add_get("/metrics", handle_metrics)
    app.router.add_post("/debug/trace", handle_trace)
    app.router.add_get("/", handle_index)
    app.router.add_static("/", STATIC_DIR, show_index=False)

    async def on_cleanup(app):
        # mark in-flight stream producers abandoned BEFORE stopping the
        # engines: their threads must not touch the (soon-closed) event
        # loop once the app is tearing down (see handle_tts_stream._post)
        for ev in list(app["runtime"].get("streams", ())):
            ev.set()
        await app["batcher"].close()
        if app["runtime"].get("continuous") is not None:
            app["runtime"]["continuous"].stop()
    app.on_cleanup.append(on_cleanup)
    return app


def build_dev_pipeline(raf_dir: str = "assets/raf",
                       engine_cfg: EngineConfig = EngineConfig(),
                       tp_mesh=None) -> TtsPipeline:
    """Random-weight pipeline for environments without checkpoints."""
    import jax
    from ..models import bicodec, rwkv7, wav2vec2
    # small dims: dev mode exists to exercise the full serving path, and
    # startup transfer bandwidth through a remote TPU tunnel is limited
    lm_cfg = RwkvConfig(n_layer=2, n_embd=256, head_size=64, dtype="float32",
                        param_dtype="float32")
    # feat_dim must equal the wav2vec2 hidden size — the codec's encoder
    # consumes those features at enrollment (a mismatch breaks
    # /api/voice-clone/extract in dev mode while synthesis still works)
    w2v_cfg = Wav2Vec2Config(num_layers=2, hidden_size=256, num_heads=4,
                             ffn_size=512, conv_dims=(64,) * 7)
    bc_cfg = BiCodecConfig.tiny(feat_dim=w2v_cfg.hidden_size)
    key = jax.random.PRNGKey(0)
    return TtsPipeline(
        rwkv7.init_params(lm_cfg, key), lm_cfg,
        bicodec.init_params(bc_cfg, key), bc_cfg,
        wav2vec2.init_params(w2v_cfg, key), w2v_cfg,
        voice_store=VoiceStore(raf_dir),
        engine_cfg=engine_cfg,
        w2v_output_layers=(1, 2),
        tp_mesh=tp_mesh,
    )


def build_pipeline_from_args(args) -> TtsPipeline:
    """Startup model resolution (parity: bin/server.rs:1306-1351): verify /
    auto-download the model files unless --no-download, then load the
    checkpoint, honoring --token-chunk-size via the prefill-bucket ladder."""
    if not args.no_download:
        from ..utils.download import ensure_models
        model_dir = os.path.dirname(args.model_path) or "assets/model"
        ensure_models(model_dir)
    else:
        log.info("--no-download: skipping model verification/auto-download")

    engine_cfg = EngineConfig().with_token_chunk(args.token_chunk_size)
    tp_mesh = None
    if getattr(args, "tp", 1) > 1:
        # layer tensor parallelism over the local slice (parallel/tp.py):
        # each chip streams 1/tp of the decode-step weights — the path
        # below the single-chip first-chunk latency floor (docs/PERF.md)
        import jax
        from ..parallel import mesh as meshlib
        n = len(jax.devices())
        if n % args.tp:
            raise SystemExit(
                f"--tp {args.tp} does not divide the {n} visible devices")
        tp_mesh = meshlib.make_mesh(n, model_parallel=args.tp)
        log.info("tensor parallelism: mesh (data=%d, model=%d)",
                 n // args.tp, args.tp)
    cached_default = bool(getattr(args, "cached_speaker", False))
    if os.path.exists(args.model_path):
        pipeline = TtsPipeline.from_checkpoints(
            args.model_path, raf_dir=args.raf_dir,
            quant_type=args.quant_type,
            quant_layers=args.quant_layers,
            vocab_path=args.vocab_path, engine_cfg=engine_cfg,
            allow_random_codec=getattr(args, "allow_random_codec", False),
            tp_mesh=tp_mesh, cached_speaker_default=cached_default)
        log.info("loaded checkpoint %s", args.model_path)
    else:
        log.warning("checkpoint %s not found — serving with random weights "
                    "(dev mode)", args.model_path)
        pipeline = build_dev_pipeline(args.raf_dir, engine_cfg=engine_cfg,
                                      tp_mesh=tp_mesh)
        pipeline.cached_speaker_default = cached_default
    return pipeline


def main(argv=None):
    # persistent compile cache: first compiles of the engine programs
    # through the axon tunnel cost minutes; server restarts hit the cache.
    # CPU runs get a per-host-CPU cache dir (cross-machine XLA:CPU AOT
    # artifacts can SIGILL — utils/compile_cache).
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()

    p = argparse.ArgumentParser("rwkvtts_server (TPU)")
    p.add_argument("--port", type=int, default=3000)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--model-path", default="assets/model/webrwkv.safetensors")
    p.add_argument("--vocab-path", default=None)
    p.add_argument("--raf-dir", default="assets/raf")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--batch-timeout", type=float, default=20.0,
                   help="collect window, ms")
    p.add_argument("--inference-timeout", type=float, default=120000.0)
    p.add_argument("--quant-type", choices=["none", "int8", "int4", "nf4", "sf4"], default="none")
    p.add_argument("--quant-layers", type=int, default=-1,
                   help="quantize the first N blocks only, matching the "
                        "reference (shared_runtime.rs:156-176); 0 disables "
                        "quantization, -1 (default) quantizes every block")
    p.add_argument("--token-chunk-size", type=int, default=256)
    p.add_argument("--stream-block", type=int, default=16,
                   help="continuous-engine decode-block size; streaming "
                        "chunks are delivered per block, so 8 pairs with "
                        "latency_mode=flash (12-token first sound) at a "
                        "small dispatch-frequency cost")
    p.add_argument("--no-download", action="store_true",
                   help="skip the HF model auto-download check")
    p.add_argument("--allow-random-codec", action="store_true",
                   help="serve with random codec weights when the real "
                        "BiCodec/wav2vec2 files are missing (dev only — "
                        "output is noise, not speech)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree over the visible devices "
                        "(layer weights shard 1/tp per chip; lowers "
                        "first-chunk latency on a multi-chip slice)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile serving programs before accepting traffic")
    p.add_argument("--warmup-budget", type=float, default=None,
                   metavar="SECONDS",
                   help="wall-clock cap for --warmup (default: unbounded). "
                        "Programs left cold are logged and compile on "
                        "first hit instead — trade startup time for "
                        "first-traffic p99. Measured cold/warm startup "
                        "walls: docs/DEPLOY.md")
    p.add_argument("--tts-engine", choices=["continuous", "static"],
                   default="continuous",
                   help="engine behind non-streaming /api/tts: "
                        "'continuous' (default) shares the slot-based "
                        "decode-block loop with /api/tts/stream so no "
                        "request batch can monopolize the chip; 'static' "
                        "restores the r4 DynamicBatcher → one-dispatch "
                        "lm_program path (lowest single-request latency "
                        "on a tunneled device, and the offline/batch "
                        "tool either way)")
    p.add_argument("--cached-speaker", action="store_true",
                   help="serve property-controlled requests through the "
                        "cached-speaker fast path by default (32 speaker "
                        "tokens cached per (properties, seed); skips the "
                        "32-step global stage — sub-200 ms first chunk on "
                        "one chip). Per-request 'cached_speaker' overrides.")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    log.info("initializing models …")
    pipeline = build_pipeline_from_args(args)

    log.info("models ready; building app")
    batch_cfg = BatchConfig(
        max_batch_size=args.batch_size,
        collect_timeout_ms=args.batch_timeout,
        inference_timeout_ms=args.inference_timeout,
    )
    app = create_app(pipeline, batch_cfg,
                     stream_block=getattr(args, "stream_block", 16),
                     tts_engine=args.tts_engine)
    if args.tts_engine == "continuous":
        # the default serving engine: build it at startup rather than on
        # the first request (device allocations through a remote tunnel
        # take seconds)
        _get_continuous(app)
    if args.warmup:
        log.info("warming up compiled programs …")
        t_w = time.perf_counter()
        times = pipeline.warmup(budget_s=args.warmup_budget)
        log.info("pipeline warmup done in %.1fs: %s",
                 time.perf_counter() - t_w, times)
        # also precompile the continuous engine's admission/decode buckets
        # so the first streaming burst never hits a cold compile (skipped
        # only if the budget is already gone — streams would hit ~10 s of
        # cold bucket compiles inside the first burst otherwise)
        if args.warmup_budget is None or \
                time.perf_counter() - t_w < args.warmup_budget:
            _get_continuous(app).warmup()
            log.info("continuous-engine warmup done (total %.1fs)",
                     time.perf_counter() - t_w)
        else:
            log.warning("warmup budget exhausted before the continuous-"
                        "engine sweep — first burst compiles lazily")
    log.info("serving on http://%s:%d", args.host, args.port)
    web.run_app(app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
