"""Async dynamic request batching.

The analog of ``DynamicBatchManager`` (src/dynamic_batch_manager.rs): requests
land in an asyncio queue; a collector drains them in a short window
(``collect_timeout_ms``, :194-247), groups them ≤ max_batch_size by mode
(normal vs zero-shot — they run different compiled programs), and hands each
group to the pipeline on an executor thread that owns the device. Unlike the
reference, (a) the batch really executes as one batched device program rather
than sequential per-request loops (its :419-421 processes requests
sequentially "to avoid GPU contention"), and (b) ``inference_timeout_ms`` is
actually enforced (the reference defines but never checks it, SURVEY.md §5).
"""

from __future__ import annotations

import asyncio
import logging
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

from ..config import BatchConfig, TtsArgs
from .pipeline import SynthesisResult, TtsPipeline

log = logging.getLogger(__name__)


class InferenceTimeout(TimeoutError):
    pass


class DynamicBatcher:
    def __init__(self, pipeline: TtsPipeline, cfg: BatchConfig = BatchConfig()):
        self.pipeline = pipeline
        self.cfg = cfg
        self._queue: asyncio.Queue = asyncio.Queue(maxsize=cfg.max_queue)
        # single executor thread: one owner for the TPU, like the reference's
        # runtime semaphore but without cross-request serialization inside a
        # batch
        self._executor = ThreadPoolExecutor(max_workers=1,
                                            thread_name_prefix="tpu-decode")
        self._task: Optional[asyncio.Task] = None
        self._closed = False
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                      "timeouts": 0}

    async def start(self):
        if self._task is None:
            self._task = asyncio.create_task(self._collector())

    async def close(self):
        """Stop the collector and fail everything still pending — queued
        or in-flight requests would otherwise sit silently until the full
        inference timeout (their futures are never resolved once the
        collector/executor die)."""
        self._closed = True
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None
        err = RuntimeError("batcher closed")
        while not self._queue.empty():
            try:
                _, fut = self._queue.get_nowait()
            except asyncio.QueueEmpty:
                break
            if not fut.done():
                fut.set_exception(err)
        # wait for an in-flight batch to finish (its future fan-out runs in
        # _run_batch, which the cancel above may have interrupted — the
        # executor thread itself is not cancellable). Off the event loop:
        # a flagship batch is seconds of device time, and a synchronous
        # shutdown(wait=True) would freeze every other endpoint meanwhile.
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(None, self._executor.shutdown)

    async def submit(self, args: TtsArgs) -> SynthesisResult:
        """Enqueue one request; resolves when its batch completes."""
        if self._closed:
            raise RuntimeError("batcher closed")
        if self._task is None:
            await self.start()
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        self.stats["requests"] += 1
        await self._queue.put((args, fut))
        timeout = self.cfg.inference_timeout_ms / 1000.0
        try:
            return await asyncio.wait_for(fut, timeout=timeout)
        except asyncio.TimeoutError:
            self.stats["timeouts"] += 1
            raise InferenceTimeout(
                f"inference exceeded {self.cfg.inference_timeout_ms:.0f} ms"
            )

    # ------------------------------------------------------------------

    async def _collector(self):
        while not self._closed:
            item = await self._queue.get()
            batch: List[Tuple[TtsArgs, asyncio.Future]] = [item]
            deadline = time.monotonic() + self.cfg.collect_timeout_ms / 1000.0
            while len(batch) < self.cfg.max_batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(
                        self._queue.get(), timeout=remaining))
                except asyncio.TimeoutError:
                    break
            # shed dead load: a request whose future is already settled
            # (client hit inference_timeout_ms and cancelled, or the
            # batcher errored it) must not occupy a device batch — under
            # backlog the device would otherwise keep synthesizing audio
            # nobody will receive, sustaining the overload
            batch = [(a, f) for a, f in batch if not f.done()]
            if not batch:
                continue
            # shielded: cancelling the collector (close()) must not skip
            # the result fan-out of a batch already on the device thread
            await asyncio.shield(self._run_batch(batch))

    async def _run_batch(self, batch):
        loop = asyncio.get_running_loop()
        args = [a for a, _ in batch]
        futs = [f for _, f in batch]
        self.stats["batches"] += 1
        self.stats["batched_requests"] += len(batch)
        try:
            results = await loop.run_in_executor(
                self._executor, self.pipeline.synthesize_batch, args)
        except Exception as e:  # noqa: BLE001 — per-request error fanout
            log.exception("batch failed")
            for f in futs:
                if not f.done():
                    f.set_exception(e)
            return
        for f, r in zip(futs, results):
            if not f.done():
                f.set_result(r)
