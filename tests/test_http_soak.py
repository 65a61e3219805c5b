"""Randomized HTTP-level soak: every public route under concurrent mixed
load — batch synth, streaming (including mid-stream client disconnects),
enrollment, list/delete, property variations — against the REAL app wiring
(batcher + continuous engine + pipeline + store). Catches cross-route
races none of the per-route tests can (slot leaks from aborted streams,
store mutations during list, batcher/engine contention on one device)."""

import asyncio
import base64
import json
import random

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from rwkv_tts_tpu.audio.io import encode_wav_16bit
from rwkv_tts_tpu.config import BatchConfig
from rwkv_tts_tpu.server.app import create_app
from test_server import tiny_pipeline


def _tone_wav(freq=260.0, seconds=1.5, sr=16000) -> bytes:
    t = np.arange(int(sr * seconds)) / sr
    return encode_wav_16bit(
        (0.35 * np.sin(2 * np.pi * freq * t)).astype(np.float32), sr)


async def _synth(client, rng, errors):
    body = {"text": f"soak {rng.randrange(1000)}", "seed": rng.randrange(99),
            "speed": rng.choice(["slow", "medium", 4.6]),
            "emotion": rng.choice(["NEUTRAL", "HAPPY", "ANGRY"])}
    r = await client.post("/api/tts", json=body)
    j = await r.json()
    if r.status != 200 or not j.get("success"):
        errors.append(("tts", r.status, j))
    else:
        base64.b64decode(j["audio_base64"])


async def _stream(client, rng, errors, abort: bool):
    r = await client.post("/api/tts/stream",
                          json={"text": f"stream {rng.randrange(1000)}",
                                "seed": rng.randrange(99),
                                "latency_mode": rng.choice(
                                    ["exact", "low", "ultra"])})
    if r.status != 200:
        errors.append(("stream", r.status, await r.text()))
        return
    n = 0
    async for line in r.content:
        if not line.strip():
            continue
        msg = json.loads(line)
        if msg.get("error"):
            errors.append(("stream-line", msg))
            return
        n += 1
        if abort and n >= 1:
            r.close()          # client walks away mid-stream
            return
        if msg.get("final"):
            return


async def _enroll_cycle(client, rng, errors):
    fd = {"voice_name": f"soak-{rng.randrange(10**6)}",
          "prompt_text": "soak voice"}
    from aiohttp import FormData
    form = FormData()
    for k, v in fd.items():
        form.add_field(k, v)
    form.add_field("audio_file", _tone_wav(200 + rng.random() * 200),
                   filename="a.wav", content_type="audio/wav")
    r = await client.post("/api/voice-clone/extract", data=form)
    j = await r.json()
    if r.status != 200 or not j.get("success"):
        errors.append(("extract", r.status, j))
        return
    vid = j["voice_id"]
    # clone with it, list it, delete it
    r = await client.post("/api/tts", json={"text": "clone", "voice_id": vid})
    if r.status != 200:
        errors.append(("clone", r.status, await r.text()))
    r = await client.get("/api/voice-clone/list")
    voices = (await r.json())["voices"]
    if vid not in {v["id"] for v in voices}:
        errors.append(("list-missing", vid))
    r = await client.post("/api/voice-clone/delete", json={"voice_id": vid})
    if r.status != 200:
        errors.append(("delete", r.status, await r.text()))


@pytest.mark.parametrize("seed", [1337, 2024])
def test_http_soak_mixed_routes(tmp_path, seed):
    rng = random.Random(seed)

    async def run():
        app = create_app(tiny_pipeline(tmp_path),
                         BatchConfig(max_batch_size=4, collect_timeout_ms=5,
                                     inference_timeout_ms=120000))
        # explicit generous per-request ceiling: the default 5-min
        # ClientTimeout fired under full-suite contention on the
        # single-core VM (r2 flake) — 14 concurrent requests share one
        # core with XLA compiles
        import aiohttp
        client = TestClient(TestServer(app),
                            timeout=aiohttp.ClientTimeout(total=1800))
        await client.start_server()
        errors: list = []
        try:
            tasks = []
            for i in range(14):
                kind = rng.randrange(4)
                if kind == 0:
                    tasks.append(_synth(client, rng, errors))
                elif kind == 1:
                    tasks.append(_stream(client, rng, errors,
                                         abort=bool(rng.randrange(2))))
                elif kind == 2:
                    tasks.append(_enroll_cycle(client, rng, errors))
                else:
                    tasks.append(_synth(client, rng, errors))
            await asyncio.gather(*tasks)
            assert not errors, errors

            # the server must still be fully healthy afterwards: no leaked
            # slots (aborted streams cancelled), store consistent
            r = await client.get("/healthz")
            assert r.status == 200, await r.text()
            r = await client.post("/api/tts", json={"text": "after soak",
                                                    "seed": 7})
            assert r.status == 200 and (await r.json())["success"]
            cont = client.app["runtime"].get("continuous")
            if cont is not None:
                for _ in range(100):        # retire any in-flight work
                    if not cont._live:
                        break
                    await asyncio.sleep(0.1)
                assert not cont._live, "leaked continuous-engine slots"
        finally:
            await client.close()
    asyncio.run(run())
