"""Request dispatcher: the TPU-era replacement of cpu/gpu_worker_pool.

The reference keeps N OS threads, each owning a private trio of Paddle
predictors, and picks the first idle worker else round-robin
(cpu_worker_pool.cpp:43-56). Here N logical workers share ONE device-
resident engine (the TPU is the parallelism; replicating weights N× buys
nothing on one chip), and an asyncio queue feeds them through a thread
pool — device dispatch releases the GIL, so det of one request overlaps
host postprocess of another.
"""

from __future__ import annotations

import asyncio
import itertools
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np

from ..pipeline import OCREngine, OCRWorker


class Dispatcher:
    """Async facade over a pool of logical OCR workers."""

    def __init__(self, engine: OCREngine, num_workers: int = 1):
        self.engine = engine
        self.workers: List[OCRWorker] = [
            OCRWorker(engine, worker_id=i) for i in range(num_workers)
        ]
        self._idle: List[bool] = [True] * num_workers
        self._lock = threading.Lock()
        self._rr = itertools.count()
        self._pool = ThreadPoolExecutor(
            max_workers=num_workers, thread_name_prefix="ocr-worker"
        )
        # per-worker health counters (SURVEY.md §5: the reference has no
        # worker health beyond a global request count)
        self._requests: List[int] = [0] * num_workers
        self._errors: List[int] = [0] * num_workers

    def _pick_worker(self) -> int:
        """First idle worker, else round-robin — the reference's policy
        (cpu_worker_pool.cpp:43-56)."""
        with self._lock:
            for i, idle in enumerate(self._idle):
                if idle:
                    self._idle[i] = False
                    return i
            return next(self._rr) % len(self.workers)

    def _run(self, worker_idx: int, image: Optional[np.ndarray], request_id: int):
        try:
            result = self.workers[worker_idx].process(image, request_id)
            with self._lock:
                self._requests[worker_idx] += 1
                if not result.get("success"):
                    self._errors[worker_idx] += 1
            return result
        finally:
            with self._lock:
                self._idle[worker_idx] = True

    def worker_stats(self):
        with self._lock:
            return [
                {"worker_id": i, "requests": self._requests[i], "errors": self._errors[i]}
                for i in range(len(self.workers))
            ]

    async def submit(
        self, image: Optional[np.ndarray], request_id: int
    ) -> dict:
        """Submit a request; resolves with the worker's response dict
        (the promise/future rendezvous of cpu_worker_pool.cpp:34-41)."""
        loop = asyncio.get_running_loop()
        idx = self._pick_worker()
        return await loop.run_in_executor(self._pool, self._run, idx, image, request_id)

    def shutdown(self):
        self._pool.shutdown(wait=True)
