"""Cross-request batching dispatcher for the fused serving path.

Concurrent recognize requests are coalesced (up to ``max_batch`` within a
``max_wait_ms`` window) into ONE fused device call — amortizing the
per-dispatch cost and keeping the MXU fed under load. Degrades to
per-request dispatch when traffic is sparse: a lone request waits at most
``max_wait_ms``.

Requires ``PipelineConfig(fast_path=True, request_batch_buckets=(1,…,N))``
so every batch-size variant is precompiled by warmup (thread-side compiles
deadlock on the TPU tunnel — see OCREngine.warmup).
"""

from __future__ import annotations

import asyncio
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from ..pipeline import OCREngine


class BatchingDispatcher:
    """Async facade matching serve.executor.Dispatcher's submit() API."""

    def __init__(
        self,
        engine: OCREngine,
        num_workers: int = 1,
        max_batch: Optional[int] = None,
        max_wait_ms: float = 3.0,
    ):
        self.engine = engine
        self.fused = engine.fused_ocr()
        self.max_batch = max_batch or max(engine.config.request_batch_buckets)
        self.max_wait = max_wait_ms / 1000.0
        self._pool = ThreadPoolExecutor(
            max_workers=num_workers, thread_name_prefix="ocr-batch"
        )
        self._queue: Optional[asyncio.Queue] = None
        self._consumer: Optional[asyncio.Task] = None

    async def submit(self, image: Optional[np.ndarray], request_id: int) -> dict:
        if image is None or image.size == 0:
            return {
                "request_id": int(request_id),
                "width": 0,
                "height": 0,
                "success": False,
                "processing_time_ms": 0.0,
                "worker_id": 0,
                "error": "Empty image data provided",
            }
        loop = asyncio.get_running_loop()
        if self._queue is None:
            self._queue = asyncio.Queue()
            self._consumer = loop.create_task(self._consume())
        fut = loop.create_future()
        await self._queue.put((image, request_id, fut))
        return await fut

    async def _consume(self):
        loop = asyncio.get_running_loop()
        while True:
            items = [await self._queue.get()]
            deadline = loop.time() + self.max_wait
            while len(items) < self.max_batch:
                timeout = deadline - loop.time()
                if timeout <= 0 and self._queue.empty():
                    break
                try:
                    items.append(
                        await asyncio.wait_for(
                            self._queue.get(), max(timeout, 0.0005)
                        )
                    )
                except asyncio.TimeoutError:
                    break
            images = [it[0] for it in items]
            rids = [it[1] for it in items]
            try:
                results = await loop.run_in_executor(
                    self._pool, self.fused.process_batch, images, rids
                )
                for (_, _, fut), res in zip(items, results):
                    if not fut.done():
                        fut.set_result(res)
            except Exception as e:  # fail all requests in the batch
                err = {"success": False, "error": str(e)}
                for _, rid, fut in items:
                    if not fut.done():
                        fut.set_result({**err, "request_id": int(rid)})

    def shutdown(self):
        if self._consumer is not None:
            self._consumer.cancel()
        self._pool.shutdown(wait=False)
