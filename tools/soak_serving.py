"""Real-chip serving soak: mixed traffic against the REAL HTTP server for
≥30 minutes (VERDICT r2 task 8).

Drives the production stack end to end on the TPU — flagship-shape LM
(random int8 serving layout; throughput and robustness depend on dims,
not values), full-size BiCodec, the aiohttp app with its batcher AND the
continuous engine — under concurrent mixed traffic:

  * normal-mode synthesis (varied text lengths, seeds, properties);
  * zero-shot cloning via the SHIPPED reference voices (assets/raf);
  * NDJSON streams in every latency mode, ~1/3 aborted after the first
    chunk (exercises the cancel/retire path under load);
  * periodic /healthz + /metrics scrapes.

Every snapshot interval it records: client-side first-chunk p50/p99 and
request-latency p50/p99 over the window, server RSS, continuous-engine
slot/crash counters, and cumulative request/error counts. At the end it
asserts no leaked slots, no crashed loop, no errors, and prints one JSON
document plus a markdown table for docs/PERF.md.

Usage: python tools/soak_serving.py [--minutes 31] [--port 3210]
       (add --minutes 2 --light for a quick CPU smoke)
"""

import argparse
import asyncio
import base64
import dataclasses
import json
import random
import re
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, ".")

from rwkv_tts_tpu.config import (BatchConfig, BiCodecConfig, EngineConfig,
                                 RwkvConfig, TtsArgs, Wav2Vec2Config)

WORDS = ("the quick brown fox jumps over the lazy dog while rain keeps "
         "falling on the quiet field and nobody notices the time pass "
         "until morning light returns softly").split()
EMOTIONS = ["NEUTRAL", "HAPPY", "SAD", "ANGRY", "SURPRISED"]


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def _pct(xs, q):
    if not xs:
        return None
    return round(float(np.percentile(np.asarray(xs), q)), 1)


def build_app(light: bool):
    from rwkv_tts_tpu.models import bicodec, rwkv7, wav2vec2
    from rwkv_tts_tpu.runtime.pipeline import TtsPipeline
    from rwkv_tts_tpu.runtime.voice_store import VoiceStore
    from rwkv_tts_tpu.server.app import create_app

    on_tpu = jax.default_backend() == "tpu"
    if light:
        lm_cfg = RwkvConfig(n_layer=2, n_embd=256, head_size=64,
                            dtype="float32", param_dtype="float32")
        lm_params = rwkv7.init_params(lm_cfg, jax.random.PRNGKey(0))
        bc_cfg = BiCodecConfig.tiny(feat_dim=32)
    else:
        lm_cfg = dataclasses.replace(RwkvConfig(), state_dtype="bfloat16")
        lm_params = rwkv7.make_serving_params(lm_cfg, jax.random.PRNGKey(0))
        bc_cfg = BiCodecConfig()
    bc_params = bicodec.init_params(bc_cfg, jax.random.PRNGKey(1),
                                    fast=not light)
    w2v_cfg = Wav2Vec2Config(num_layers=2, hidden_size=bc_cfg.feat_dim,
                             num_heads=2, ffn_size=64, conv_dims=(16,) * 7)
    w2v_params = wav2vec2.init_params(w2v_cfg, jax.random.PRNGKey(2))

    pipe = TtsPipeline(
        lm_params, lm_cfg, bc_params, bc_cfg, w2v_params, w2v_cfg,
        voice_store=VoiceStore("assets/raf"),
        engine_cfg=EngineConfig(max_semantic_tokens=256 if not light else 16,
                                batch_size=16 if not light else 2),
        use_pallas=on_tpu,
        w2v_output_layers=(1, 2),
    )
    app = create_app(pipe, BatchConfig(max_batch_size=8,
                                       collect_timeout_ms=10,
                                       inference_timeout_ms=600000))
    return app


def warm_app(app):
    """The server's --warmup, for soaks that verify the no-cold-compile
    claim (VERDICT r3 #7): pipeline programs + continuous-engine
    admission/decode buckets, before any traffic."""
    from rwkv_tts_tpu.server.app import _get_continuous
    t0 = time.perf_counter()
    times = app["pipeline"].warmup()
    _get_continuous(app).warmup()
    print(f"warmup: {time.perf_counter()-t0:.1f}s "
          f"({len(times)} pipeline programs)", file=sys.stderr, flush=True)


async def soak(app, minutes: float, port: int, snapshot_every: float,
               concurrency: int):
    import aiohttp
    from aiohttp import web

    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", port)
    await site.start()
    base = f"http://127.0.0.1:{port}"

    rng = random.Random(7)
    stats = {"ok": 0, "errors": [], "aborted_streams": 0}
    window = {"first_chunk_ms": [], "latency_ms": []}
    snapshots = []
    deadline = time.monotonic() + minutes * 60.0

    async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=1800)) as sess:
        # voice ids for zero-shot traffic (the shipped reference voices)
        async with sess.get(base + "/api/voice-clone/list") as r:
            voices = [v["id"] for v in (await r.json()).get("voices", [])]

        async def one_request(kind: str):
            text = " ".join(rng.sample(WORDS, rng.randrange(5, 14)))
            t0 = time.monotonic()
            try:
                if kind == "stream":
                    abort = rng.random() < 0.33
                    body = {"text": text, "seed": rng.randrange(999),
                            "latency_mode": rng.choice(
                                ["low", "ultra", "flash"])}
                    async with sess.post(base + "/api/tts/stream",
                                         json=body) as r:
                        if r.status != 200:
                            stats["errors"].append(
                                ("stream", r.status, await r.text()))
                            return
                        n = 0
                        async for line in r.content:
                            if not line.strip():
                                continue
                            msg = json.loads(line)
                            if msg.get("error"):
                                stats["errors"].append(("stream-line", msg))
                                return
                            if n == 0:
                                window["first_chunk_ms"].append(
                                    (time.monotonic() - t0) * 1e3)
                            n += 1
                            if abort and n >= 1:
                                stats["aborted_streams"] += 1
                                return      # client walks away
                            if msg.get("final"):
                                break
                else:
                    body = {"text": text, "seed": rng.randrange(999),
                            "emotion": rng.choice(EMOTIONS),
                            "speed": rng.choice(
                                ["slow", "medium", "fast"])}
                    if kind == "zero_shot" and voices:
                        body["voice_id"] = rng.choice(voices)
                    async with sess.post(base + "/api/tts",
                                         json=body) as r:
                        j = await r.json()
                        if r.status != 200 or not j.get("success"):
                            stats["errors"].append(("tts", r.status, j))
                            return
                        base64.b64decode(j["audio_base64"])
                stats["ok"] += 1
                window["latency_ms"].append((time.monotonic() - t0) * 1e3)
            except Exception as e:  # noqa: BLE001
                stats["errors"].append((kind, type(e).__name__, str(e)[:200]))

        async def traffic_worker(wid: int):
            kinds = ["normal", "stream", "zero_shot", "normal", "stream"]
            while time.monotonic() < deadline:
                await one_request(kinds[(wid + stats["ok"]) % len(kinds)])

        def _stage_means(text, prev):
            """Server-side stage attribution from the /metrics histograms:
            per-window mean seconds of each serving stage (delta of _sum /
            delta of _count since the last snapshot). The sum of the
            engine-side stages vs the client-observed first chunk is the
            attribution the r3 verdict asked for."""
            out = {}
            for stage in ("queue_wait", "first_emit", "first_chunk"):
                s = re.search(
                    rf"^rwkv_tts_stage_{stage}_seconds_sum (\S+)$",
                    text, re.MULTILINE)
                c = re.search(
                    rf"^rwkv_tts_stage_{stage}_seconds_count (\S+)$",
                    text, re.MULTILINE)
                if not (s and c):
                    continue
                ds = float(s.group(1)) - prev.get(stage + "_sum", 0.0)
                dc = float(c.group(1)) - prev.get(stage + "_count", 0)
                prev[stage + "_sum"] = float(s.group(1))
                prev[stage + "_count"] = float(c.group(1))
                out[f"{stage}_mean_ms"] = (
                    round(ds / dc * 1000.0, 1) if dc else None)
            return out

        stage_prev: dict = {}

        async def snapshotter():
            while time.monotonic() < deadline:
                await asyncio.sleep(min(snapshot_every,
                                        max(1.0, deadline - time.monotonic())))
                async with sess.get(base + "/metrics") as r:
                    text = await r.text()
                m = dict(re.findall(r"^rwkv_tts_(\S+) (\S+)$", text,
                                    re.MULTILINE))
                snap = {
                    "stages": _stage_means(text, stage_prev),
                    "t_min": round((time.monotonic() -
                                    (deadline - minutes * 60)) / 60, 1),
                    "rss_mb": round(_rss_mb(), 1),
                    "ok_total": stats["ok"],
                    "err_total": len(stats["errors"]),
                    "aborted_streams": stats["aborted_streams"],
                    "live_slots": int(float(m.get(
                        "continuous_live_slots", -1))),
                    "crashed": int(float(m.get("continuous_crashed", 0))),
                    "first_chunk_p50": _pct(window["first_chunk_ms"], 50),
                    "first_chunk_p99": _pct(window["first_chunk_ms"], 99),
                    "latency_p50": _pct(window["latency_ms"], 50),
                    "latency_p99": _pct(window["latency_ms"], 99),
                    "n_window": (len(window["first_chunk_ms"]),
                                 len(window["latency_ms"])),
                }
                snapshots.append(snap)
                print(json.dumps(snap), flush=True)
                window["first_chunk_ms"].clear()
                window["latency_ms"].clear()

        workers = [asyncio.create_task(traffic_worker(i))
                   for i in range(concurrency)]
        snap_task = asyncio.create_task(snapshotter())
        await asyncio.gather(*workers)
        snap_task.cancel()

        # post-soak health: server must still answer, slots drain to zero
        async with sess.get(base + "/healthz") as r:
            health = (r.status, await r.json())
        drained = None
        for _ in range(120):
            async with sess.get(base + "/metrics") as r:
                text = await r.text()
            m = dict(re.findall(r"^rwkv_tts_(\S+) (\S+)$", text,
                                re.MULTILINE))
            drained = int(float(m.get("continuous_live_slots", 0)))
            if drained == 0:
                break
            await asyncio.sleep(1.0)

    await runner.cleanup()
    return stats, snapshots, health, drained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=31.0)
    ap.add_argument("--port", type=int, default=3210)
    ap.add_argument("--snapshot-every", type=float, default=180.0)
    ap.add_argument("--concurrency", type=int, default=6)
    ap.add_argument("--light", action="store_true",
                    help="tiny models (CPU smoke of the harness itself)")
    ap.add_argument("--warmup", action="store_true",
                    help="precompile all serving programs before traffic "
                         "(the server's --warmup; verifies zero "
                         "compile-attributable p99 spikes)")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    app = build_app(args.light)
    if args.warmup:
        warm_app(app)
    stats, snapshots, health, drained = asyncio.run(
        soak(app, args.minutes, args.port, args.snapshot_every,
             args.concurrency))

    ok = (not stats["errors"] and health[0] == 200 and drained == 0
          and all(s["crashed"] == 0 for s in snapshots))
    doc = {
        "soak_ok": ok,
        "minutes": args.minutes,
        "requests_ok": stats["ok"],
        "aborted_streams": stats["aborted_streams"],
        "errors": stats["errors"][:10],
        "healthz": health,
        "slots_after_drain": drained,
        "snapshots": snapshots,
    }
    print(json.dumps(doc))
    print("\n| t (min) | reqs ok | errs | aborted | RSS MB | live slots | "
          "first-chunk p50/p99 ms | latency p50/p99 ms |")
    print("|---|---|---|---|---|---|---|---|")
    for s in snapshots:
        print(f"| {s['t_min']} | {s['ok_total']} | {s['err_total']} | "
              f"{s['aborted_streams']} | {s['rss_mb']} | {s['live_slots']} | "
              f"{s['first_chunk_p50']} / {s['first_chunk_p99']} | "
              f"{s['latency_p50']} / {s['latency_p99']} |")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
