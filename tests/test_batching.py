"""DynamicBatcher unit behavior with a fake pipeline: shed-cancelled-load
and close() semantics (the HTTP suite covers the integrated path)."""

import asyncio
import time

import pytest

from rwkv_tts_tpu.config import BatchConfig, TtsArgs
from rwkv_tts_tpu.runtime.batching import DynamicBatcher, InferenceTimeout


class FakePipeline:
    """Records which requests actually reach the device thread."""

    def __init__(self, delay_s=0.0):
        self.calls = []
        self.delay_s = delay_s

    def synthesize_batch(self, args):
        self.calls.append([a.text for a in args])
        time.sleep(self.delay_s)

        class R:  # minimal result stand-in
            rtf = 0.01
            audio = b""
        return [R() for _ in args]


def test_cancelled_requests_are_shed():
    """A request whose future settled (client timeout) must not occupy a
    device batch: under backlog the device would keep synthesizing audio
    nobody will receive."""
    async def run():
        pipe = FakePipeline(delay_s=0.3)
        b = DynamicBatcher(pipe, BatchConfig(max_batch_size=4,
                                             collect_timeout_ms=50,
                                             inference_timeout_ms=150))
        # first request occupies the device thread for 300 ms — the second
        # times out (150 ms) while still queued, so by the time the
        # collector packs the next batch its future is cancelled
        t1 = asyncio.create_task(b.submit(TtsArgs(text="long")))
        await asyncio.sleep(0.08)  # let batch 1 dispatch
        with pytest.raises(InferenceTimeout):
            await b.submit(TtsArgs(text="doomed"))
        with pytest.raises(InferenceTimeout):
            await t1  # also exceeded its deadline; fine
        await asyncio.sleep(0.5)   # give the collector time to (not) run it
        flat = [t for batch in pipe.calls for t in batch]
        assert "doomed" not in flat, pipe.calls
        await b.close()
    asyncio.run(run())


def test_close_fails_pending_and_rejects_new():
    async def run():
        pipe = FakePipeline()
        b = DynamicBatcher(pipe, BatchConfig(max_batch_size=4,
                                             collect_timeout_ms=5,
                                             inference_timeout_ms=60000))
        r = await b.submit(TtsArgs(text="ok"))
        assert r.rtf > 0
        await b.close()
        with pytest.raises(RuntimeError, match="closed"):
            await b.submit(TtsArgs(text="after close"))
    asyncio.run(run())
