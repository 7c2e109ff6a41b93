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

# error-text markers of a lost/wedged device (XLA runtime / PJRT / tunnel
# transport failures) — triggers an engine reload + one retry
DEVICE_LOSS_MARKERS = (
    "device_unavailable",
    "device unavailable",
    "device lost",
    "data_loss",
    "failed to enqueue",
    "socket closed",
    "connection reset",
    "internal: stream",
)


def is_device_loss(error: str) -> bool:
    e = (error or "").lower()
    return any(m in e for m in DEVICE_LOSS_MARKERS)


class EngineRecoveryMixin:
    """Device-loss recovery shared by the dispatchers: reload the engine on
    the asyncio event loop (= main thread, where compiles are tunnel-safe),
    at most once per cooldown window."""

    _recover_cooldown = 5.0

    def _init_recovery(self):
        import asyncio

        self.engine_reloads = 0
        # surfaced in service status: a cold-cache recovery warmup can take
        # many minutes of main-thread compiles, during which all traffic
        # stalls — operators can now distinguish that from a hang
        self.reloading = False
        self._reload_lock = asyncio.Lock()
        self._last_attempt = 0.0  # cooldown keys off ATTEMPTS: a failed
        # reload must not be retried per-request (reload storm, review r3)
        self._last_attempt_ok = False

    async def _recover_engine(self) -> bool:
        """Returns True when the engine is freshly healthy — either this
        call reloaded it, or another request's reload just succeeded
        within the cooldown window (the caller should retry either way)."""
        import time

        async with self._reload_lock:
            now = time.monotonic()
            if (
                self._last_attempt
                and now - self._last_attempt < self._recover_cooldown
            ):
                # a reload just ran (or just failed): don't thrash the
                # event loop with another multi-minute attempt, but DO
                # tell the caller to retry if that reload succeeded —
                # its request predates the recovery and deserves the
                # one retry like the request that triggered it
                return self._last_attempt_ok
            reload_fn = getattr(self.engine, "reload", None)
            if reload_fn is None:
                return False
            self.reloading = True
            self._last_attempt_ok = False
            try:
                reload_fn(warmup=True)  # event loop == main thread: compiles OK
            except Exception:
                # stamp the failed attempt (cooldown engages; without it a
                # wedged device re-runs a blocking reload per request) and
                # report unhealthy instead of letting the exception kill
                # the caller (the batcher's consumer task, review r3)
                return False
            finally:
                self.reloading = False
                self._last_attempt = time.monotonic()
            self._last_attempt_ok = True
            self.engine_reloads += 1
            self._after_engine_reload()
            return True

    def _after_engine_reload(self):  # pragma: no cover - overridden
        pass


class Dispatcher(EngineRecoveryMixin):
    """Async facade over a pool of logical OCR workers."""

    def __init__(self, engine: OCREngine, num_workers: int = 1):
        self.engine = engine
        self.workers: List[OCRWorker] = [
            OCRWorker(engine, worker_id=i) for i in range(num_workers)
        ]
        # in-flight COUNT per worker, not an idle bool: with round-robin
        # overflow a worker can carry two requests, and the first one
        # finishing must not mark it idle while the second still runs
        # (review r3 — skews the first-idle policy onto one worker)
        self._inflight: List[int] = [0] * num_workers
        self._lock = threading.Lock()
        self._rr = itertools.count()
        self._pool = ThreadPoolExecutor(
            max_workers=num_workers, thread_name_prefix="ocr-worker"
        )
        # per-worker health counters (SURVEY.md §5: the reference has no
        # worker health beyond a global request count)
        self._requests: List[int] = [0] * num_workers
        self._errors: List[int] = [0] * num_workers
        self._init_recovery()

    def _after_engine_reload(self):
        """Workers cache the engine's fused wrapper — rebuild them so they
        bind the reloaded device state."""
        self.workers = [
            OCRWorker(self.engine, worker_id=i)
            for i in range(len(self.workers))
        ]

    def _pick_worker(self) -> int:
        """First idle worker, else round-robin — the reference's policy
        (cpu_worker_pool.cpp:43-56)."""
        with self._lock:
            for i, n in enumerate(self._inflight):
                if n == 0:
                    self._inflight[i] += 1
                    return i
            i = next(self._rr) % len(self.workers)
            self._inflight[i] += 1
            return i

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
                self._inflight[worker_idx] -= 1

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
        (the promise/future rendezvous of cpu_worker_pool.cpp:34-41).
        A device-loss error triggers an engine reload (main-thread warmup)
        and ONE retry — the recovery the reference lacks (SURVEY §5)."""
        loop = asyncio.get_running_loop()
        cfg = self.engine.config
        if (
            cfg.fast_path
            and not getattr(cfg, "cross_chip", False)
            and image is not None
            and image.size
        ):
            # incremental warmup: compile missing fused variants here on
            # the event loop (main thread) — worker-thread compiles
            # deadlock the TPU tunnel. No-op on a warm variant set.
            fused = self.engine.fused_ocr()
            for key in fused.required_variants([image]):
                fused.compile_variant(key)
        idx = self._pick_worker()
        result = await loop.run_in_executor(
            self._pool, self._run, idx, image, request_id
        )
        if not result.get("success") and is_device_loss(result.get("error")):
            if await self._recover_engine():
                idx = self._pick_worker()
                result = await loop.run_in_executor(
                    self._pool, self._run, idx, image, request_id
                )
        return result

    def shutdown(self):
        self._pool.shutdown(wait=True)
