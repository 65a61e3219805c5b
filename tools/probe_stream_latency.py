"""Zero-load and burst first-chunk probes against the REAL serving app.

Completes the soak attribution (VERDICT r3 #2): the soak measures
first-chunk under closed-loop saturation; this tool measures the same
HTTP streaming path at zero load (1 stream, idle server) and under a
short N-stream burst, printing the server-side stage means alongside the
client-observed figure. The zero-load number is directly comparable to
bench.py's first_chunk_modes; the delta under burst is queueing/host
contention, now measurable per stage.

Usage: python tools/probe_stream_latency.py [--light] [--burst 6]
"""

import argparse
import asyncio
import dataclasses  # noqa: F401  (soak_serving re-exports configs)
import json
import re
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from soak_serving import build_app  # noqa: E402


async def one_stream(sess, base, text, mode="low"):
    t0 = time.perf_counter()
    first = None
    async with sess.post(base + "/api/tts/stream",
                         json={"text": text, "seed": 7,
                               "latency_mode": mode}) as r:
        assert r.status == 200, r.status
        async for line in r.content:
            if not line.strip():
                continue
            j = json.loads(line)
            if first is None and j.get("audio_base64"):
                first = (time.perf_counter() - t0) * 1000.0
            if j.get("final"):
                break
    return first, (time.perf_counter() - t0) * 1000.0


def stage_means(text):
    out = {}
    for stage in ("queue_wait", "first_emit", "first_chunk"):
        s = re.search(rf"^rwkv_tts_stage_{stage}_seconds_sum (\S+)$",
                      text, re.MULTILINE)
        c = re.search(rf"^rwkv_tts_stage_{stage}_seconds_count (\S+)$",
                      text, re.MULTILINE)
        if s and c and float(c.group(1)):
            out[stage] = round(
                float(s.group(1)) / float(c.group(1)) * 1000.0, 1)
    return out


async def run(app, port, burst):
    from aiohttp import ClientSession, ClientTimeout, web
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", port)
    await site.start()
    base = f"http://127.0.0.1:{port}"
    text = "The quick brown fox jumps over the lazy dog near the river."
    async with ClientSession(timeout=ClientTimeout(total=900)) as sess:
        # compile pass (cold shapes) — not measured
        await one_stream(sess, base, text)
        for mode in ("low", "flash"):
            firsts = []
            for _ in range(3):
                f, _tot = await one_stream(sess, base, text, mode)
                firsts.append(f)
            print(json.dumps({"probe": f"zero_load_{mode}",
                              "first_chunk_ms": [round(f, 1)
                                                 for f in firsts]}),
                  flush=True)
        # burst: N concurrent streams, fresh stage window
        async with sess.get(base + "/metrics") as r:
            before = await r.text()
        t0 = time.perf_counter()
        outs = await asyncio.gather(*[
            one_stream(sess, base, text) for _ in range(burst)])
        wall = time.perf_counter() - t0
        async with sess.get(base + "/metrics") as r:
            after = await r.text()

        def _sums(text):
            return {m.group(1): float(m.group(2)) for m in re.finditer(
                r"^rwkv_tts_stage_(\w+)_seconds_sum (\S+)$", text,
                re.MULTILINE)}

        def _counts(text):
            return {m.group(1): float(m.group(2)) for m in re.finditer(
                r"^rwkv_tts_stage_(\w+)_seconds_count (\S+)$", text,
                re.MULTILINE)}

        sb, sa = _sums(before), _sums(after)
        cb, ca = _counts(before), _counts(after)
        window = {k: round((sa[k] - sb.get(k, 0.0))
                           / max(1.0, ca[k] - cb.get(k, 0.0)) * 1000.0, 1)
                  for k in sa}
        print(json.dumps({
            "probe": f"burst_{burst}",
            "first_chunk_ms": [round(f, 1) for f, _ in outs],
            "burst_wall_s": round(wall, 2),
            "stage_means_ms": window,
        }), flush=True)
    await runner.cleanup()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--light", action="store_true")
    ap.add_argument("--burst", type=int, default=6)
    ap.add_argument("--port", type=int, default=3217)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    app = build_app(args.light)
    asyncio.run(run(app, args.port, args.burst))


if __name__ == "__main__":
    main()
