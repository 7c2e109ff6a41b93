"""Serving robustness (VERDICT r1 #6): supervised batch consumer,
per-request timeout, per-worker error counters — hermetic tests with stub
engines (no model compiles)."""

import asyncio
import base64
import json

import cv2
import numpy as np
import pytest

from ppocr_tpu.pipeline.config import PipelineConfig
from ppocr_tpu.serve.batcher import BatchingDispatcher
from ppocr_tpu.serve.executor import Dispatcher
from ppocr_tpu.serve.service import OCRIPCService


class FakeFused:
    def __init__(self):
        self.calls = 0
        self.fail_next = 0

    # the incremental-warmup guard's surface (a warm real FusedOCR
    # returns [] here; pipeline/fused.py required_variants)
    def required_variants(self, images, batch_buckets=None):
        return []

    def compile_variant(self, key):
        return False

    def process_batch(
        self,
        images,
        request_ids,
        worker_id=0,
        batch_buckets=None,
        arrival_times=None,
    ):
        self.calls += 1
        if self.fail_next > 0:
            self.fail_next -= 1
            raise RuntimeError("device exploded")
        return [
            {"request_id": int(r), "success": True, "words": []}
            for r in request_ids
        ]


class FakeEngine:
    def __init__(self, fast_path=False):
        self.config = PipelineConfig()
        self.config.fast_path = fast_path
        self.config.request_batch_buckets = (1, 2, 4)
        self._fused = FakeFused()
        self.random_weights = {}

    def fused_ocr(self):
        return self._fused


IMG = np.full((8, 8, 3), 255, np.uint8)


def tiny_b64():
    ok, buf = cv2.imencode(".png", IMG)
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


class TestBatchingDispatcherSupervision:
    def test_batch_failure_resolves_all_and_consumer_survives(self):
        eng = FakeEngine(fast_path=True)
        disp = BatchingDispatcher(eng, num_workers=1, max_wait_ms=5)
        eng._fused.fail_next = 1

        async def run():
            bad = await asyncio.gather(
                disp.submit(IMG, 1), disp.submit(IMG, 2)
            )
            good = await disp.submit(IMG, 3)
            return bad, good

        bad, good = asyncio.run(run())
        assert all(r["success"] is False for r in bad)
        assert all("device exploded" in r["error"] for r in bad)
        assert good["success"] is True
        stats = disp.worker_stats()[0]
        # batch failures are contained in their batch task now — the
        # gather loop never died, so no restart was needed
        assert stats["consumer_restarts"] == 0
        assert stats["errors"] >= 2
        disp.shutdown()

    def test_cancelled_consumer_restarts_on_next_submit(self):
        eng = FakeEngine(fast_path=True)
        disp = BatchingDispatcher(eng, num_workers=1, max_wait_ms=2)

        async def run():
            r1 = await disp.submit(IMG, 1)
            disp._consumer.cancel()
            await asyncio.sleep(0.01)
            assert disp._consumer.done()
            r2 = await asyncio.wait_for(disp.submit(IMG, 2), timeout=5)
            return r1, r2

        r1, r2 = asyncio.run(run())
        assert r1["success"] and r2["success"]
        disp.shutdown()


class TestWorkerCounters:
    def test_dispatcher_per_worker_stats(self):
        eng = FakeEngine(fast_path=False)
        disp = Dispatcher(eng, num_workers=2)
        for w in disp.workers:
            w.process = lambda img, rid, _w=w: {
                "request_id": rid,
                "success": rid % 2 == 0,
                "worker_id": _w.worker_id,
            }

        async def run():
            return await asyncio.gather(
                *[disp.submit(IMG, i) for i in range(6)]
            )

        results = asyncio.run(run())
        assert len(results) == 6
        stats = disp.worker_stats()
        assert sum(s["requests"] for s in stats) == 6
        assert sum(s["errors"] for s in stats) == 3  # odd request_ids fail
        disp.shutdown()


class TestRequestTimeout:
    def _service(self, timeout_ms):
        return OCRIPCService(
            model_dir="/nonexistent",
            socket_path="/tmp/unused-robustness.sock",
            cpu_workers=1,
            engine=FakeEngine(fast_path=False),
            request_timeout_ms=timeout_ms,
        )

    def test_wedged_request_times_out(self):
        svc = self._service(timeout_ms=50)

        async def hang(image, request_id):
            await asyncio.sleep(30)

        svc.dispatcher.submit = hang

        async def run():
            line = json.dumps(
                {"command": "recognize", "image_data": tiny_b64()}
            ).encode()
            return await svc.process_request(line)

        r = asyncio.run(run())
        assert r["success"] is False
        assert "timed out" in r["error"]
        assert svc.timed_out_requests == 1
        assert svc.failed_requests == 1

    def test_status_surfaces_health_counters(self):
        svc = self._service(timeout_ms=50)
        status = json.loads(svc.get_status_info())
        assert status["failed_requests"] == 0
        assert status["timed_out_requests"] == 0
        assert status["workers"] == [
            {"worker_id": 0, "requests": 0, "errors": 0}
        ]

    def test_failed_request_counted(self):
        svc = self._service(timeout_ms=5000)

        async def fail(image, request_id):
            return {"request_id": request_id, "success": False, "error": "x"}

        svc.dispatcher.submit = fail

        async def run():
            line = json.dumps(
                {"command": "recognize", "image_data": tiny_b64()}
            ).encode()
            return await svc.process_request(line)

        r = asyncio.run(run())
        assert r["success"] is False
        assert svc.failed_requests == 1 and svc.timed_out_requests == 0


class TestDeviceLossRecovery:
    """Engine reload + retry on device-loss errors (the recovery the
    reference lacks — SURVEY §5 'no worker restart')."""

    class LossyEngine:
        """Stub engine: every request fails with a device-loss error until
        reload() is called; healthy afterwards."""

        def __init__(self):
            self.config = PipelineConfig()
            self.config.fast_path = False
            self.random_weights = {}
            self.healthy = False
            self.reload_calls = 0

        def reload(self, warmup=False):
            self.reload_calls += 1
            self.warmed = warmup
            self.healthy = True

    def _patched_dispatcher(self, eng):
        disp = Dispatcher.__new__(Dispatcher)
        import itertools
        import threading
        from concurrent.futures import ThreadPoolExecutor

        class StubWorker:
            def __init__(self, engine, worker_id=0):
                self.engine = engine
                self.worker_id = worker_id

            def process(self, image, request_id):
                if not self.engine.healthy:
                    return {
                        "request_id": request_id,
                        "success": False,
                        "error": "INTERNAL: stream closed: DEVICE_UNAVAILABLE",
                    }
                return {"request_id": request_id, "success": True, "words": []}

        disp.engine = eng
        disp.workers = [StubWorker(eng, 0)]
        disp._inflight = [0]
        disp._lock = threading.Lock()
        disp._rr = itertools.count()
        disp._pool = ThreadPoolExecutor(max_workers=1)
        disp._requests = [0]
        disp._errors = [0]
        disp._init_recovery()
        disp._after_engine_reload = lambda: disp.workers.__setitem__(
            0, StubWorker(eng, 0)
        )
        return disp

    def test_device_loss_reloads_and_retries(self):
        from ppocr_tpu.serve.executor import is_device_loss

        assert is_device_loss("INTERNAL: stream closed: DEVICE_UNAVAILABLE")
        assert is_device_loss("Socket closed by peer")
        assert not is_device_loss("Empty image data provided")
        assert not is_device_loss(None)

        eng = self.LossyEngine()
        disp = self._patched_dispatcher(eng)

        async def run():
            return await disp.submit(IMG, 7)

        result = asyncio.run(run())
        assert result["success"] is True, result
        assert eng.reload_calls == 1
        assert eng.warmed is True  # recovery warms up on the main thread
        assert disp.engine_reloads == 1
        disp.shutdown()

    def test_reload_throttled_within_cooldown(self):
        eng = self.LossyEngine()
        disp = self._patched_dispatcher(eng)

        async def run():
            r1 = await disp.submit(IMG, 1)
            eng.healthy = False  # device dies again immediately
            r2 = await disp.submit(IMG, 2)
            return r1, r2

        r1, r2 = asyncio.run(run())
        assert r1["success"] is True
        # second loss within the cooldown: no second reload, error surfaces
        assert r2["success"] is False
        assert eng.reload_calls == 1
        disp.shutdown()

    def test_batching_dispatcher_reloads_on_device_loss(self):
        eng = FakeEngine(fast_path=True)
        eng.healthy = True
        eng.reload_calls = 0

        def reload(warmup=False):
            eng.reload_calls += 1
            eng._fused = FakeFused()  # fresh fused wrapper post-reload

        eng.reload = reload
        disp = BatchingDispatcher(eng, num_workers=1, max_wait_ms=5)
        old_fused = eng._fused

        def explode(
            images,
            request_ids,
            worker_id=0,
            batch_buckets=None,
            arrival_times=None,
        ):
            raise RuntimeError("transport: socket closed")

        old_fused.process_batch = explode

        async def run():
            first = await disp.submit(IMG, 1)
            second = await disp.submit(IMG, 2)
            return first, second

        first, second = asyncio.run(run())
        assert first["success"] is False
        assert eng.reload_calls == 1
        assert disp.fused is not old_fused  # rebound to the reloaded engine
        assert second["success"] is True, second
        disp.shutdown()


class TestBatchBucketList:
    def test_pow2_and_single_modes(self):
        from ppocr_tpu.cli.service_main import batch_bucket_list

        assert batch_bucket_list(8, "pow2") == (1, 2, 4, 8)
        assert batch_bucket_list(6, "pow2") == (1, 2, 4, 6)
        assert batch_bucket_list(1, "pow2") == (1,)
        assert batch_bucket_list(8, "single") == (8,)

    def test_single_bucket_pads_partial_batches(self):
        """With a (4,) bucket list, a lone request dispatches as a padded
        batch of 4 and still resolves correctly."""
        eng = FakeEngine(fast_path=True)
        eng.config.request_batch_buckets = (4,)
        disp = BatchingDispatcher(eng, num_workers=1, max_wait_ms=3)

        async def run():
            return await disp.submit(IMG, 11)

        r = asyncio.run(run())
        assert r["success"] is True and r["request_id"] == 11
        disp.shutdown()


class TestRecoveryReviewFixes:
    """Round-3 review findings on the recovery layer."""

    def test_failed_reload_engages_cooldown_not_a_storm(self):
        """A reload that raises must stamp the attempt (cooldown engages)
        and report unhealthy — not re-run a blocking reload per request
        and not kill the batcher's consumer task."""
        eng = FakeEngine(fast_path=True)
        eng.reload_calls = 0

        def bad_reload(warmup=False):
            eng.reload_calls += 1
            raise RuntimeError("device still wedged")

        eng.reload = bad_reload
        disp = BatchingDispatcher(eng, num_workers=1, max_wait_ms=2)
        eng._fused.fail_next = 99  # every batch raises device loss

        class DeviceLossFused(FakeFused):
            def process_batch(self, images, request_ids, **kw):
                raise RuntimeError("INTERNAL: stream closed: device lost")

        eng._fused = DeviceLossFused()
        disp.fused = eng._fused

        async def run():
            rs = []
            for i in range(4):
                rs.append(await disp.submit(IMG, i))
            # the consumer survived all four failing batches (checked
            # inside the loop: asyncio.run cancels tasks at exit)
            alive = disp._consumer is not None and not disp._consumer.done()
            return rs, alive

        rs, alive = asyncio.run(run())
        assert all(r["success"] is False for r in rs)
        # one attempt, then the cooldown suppresses the other three
        assert eng.reload_calls == 1
        assert disp.engine_reloads == 0
        assert alive
        disp.shutdown()

    def test_cooldown_still_allows_retry_after_recent_success(self):
        """A request whose device-loss lands just after another request's
        successful reload must still get its one retry (the engine IS
        freshly healthy) instead of failing back to the client."""
        import itertools
        import threading
        from concurrent.futures import ThreadPoolExecutor

        eng = FakeEngine(fast_path=False)
        eng.healthy = False
        eng.reload_calls = 0

        def reload(warmup=False):
            eng.reload_calls += 1
            eng.healthy = True

        eng.reload = reload
        disp = Dispatcher.__new__(Dispatcher)

        class StubWorker:
            def __init__(self, engine, wid):
                self.engine = engine

            def process(self, image, request_id):
                if not self.engine.healthy:
                    return {
                        "request_id": request_id,
                        "success": False,
                        "error": "device lost",
                    }
                return {"request_id": request_id, "success": True, "words": []}

        disp.engine = eng
        disp.workers = [StubWorker(eng, 0)]
        disp._inflight = [0]
        disp._lock = threading.Lock()
        disp._rr = itertools.count()
        disp._pool = ThreadPoolExecutor(max_workers=1)
        disp._requests = [0]
        disp._errors = [0]
        disp._init_recovery()
        disp._after_engine_reload = lambda: None

        async def run():
            r1 = await disp.submit(IMG, 1)  # loss -> reload -> retry ok
            eng.healthy = False  # device drops again within the cooldown

            # stage a request that fails with device loss, then becomes
            # healthy without another reload (simulating the in-flight
            # sibling whose error predates the recovery)
            orig = disp.workers[0].process
            calls = {"n": 0}

            def flaky(image, request_id):
                calls["n"] += 1
                if calls["n"] == 1:
                    return {
                        "request_id": request_id,
                        "success": False,
                        "error": "device lost",
                    }
                return {"request_id": request_id, "success": True, "words": []}

            disp.workers[0].process = flaky
            r2 = await disp.submit(IMG, 2)
            disp.workers[0].process = orig
            return r1, r2

        r1, r2 = asyncio.run(run())
        assert r1["success"] is True
        # retry ran without a second reload (cooldown suppressed it) and
        # succeeded — the old code returned the stale error here
        assert r2["success"] is True
        assert eng.reload_calls == 1
        disp.shutdown()

    def test_dead_futures_are_not_batched(self):
        """Items whose future is already done (client timeout) must be
        dropped before the batch is built — device work for them wastes
        batch slots under overload."""
        eng = FakeEngine(fast_path=True)
        disp = BatchingDispatcher(eng, num_workers=1, max_wait_ms=20)
        seen = []

        class RecordingFused(FakeFused):
            def process_batch(self, images, request_ids, **kw):
                seen.append(list(request_ids))
                return super().process_batch(images, request_ids, **kw)

        eng._fused = RecordingFused()
        disp.fused = eng._fused

        async def run():
            import time

            # prime queue/consumer bindings
            await disp.submit(IMG, 0)
            dead = asyncio.get_running_loop().create_future()
            dead.cancel()
            await disp._queue.put((IMG, 99, dead, time.perf_counter()))
            return await disp.submit(IMG, 1)

        r = asyncio.run(run())
        assert r["success"] is True
        assert all(99 not in batch for batch in seen), seen

    def test_shutdown_fails_queued_requests_promptly(self):
        eng = FakeEngine(fast_path=True)
        disp = BatchingDispatcher(eng, num_workers=1, max_wait_ms=2)

        async def run():
            import time

            await disp.submit(IMG, 0)  # bind queue/consumer
            disp._consumer.cancel()
            await asyncio.sleep(0.01)
            fut = asyncio.get_running_loop().create_future()
            await disp._queue.put((IMG, 7, fut, time.perf_counter()))
            disp.shutdown()
            return await asyncio.wait_for(fut, 1.0)

        r = asyncio.run(run())
        assert r["success"] is False
        assert "shutting down" in r["error"]


class TestServiceCounterSemantics:
    """Round-3 review: request ids, timeout=0, counter invariants."""

    def _service(self, timeout_ms=30000.0):
        return OCRIPCService(
            model_dir="/nonexistent",
            socket_path="/tmp/unused-robustness2.sock",
            cpu_workers=1,
            engine=FakeEngine(fast_path=False),
            request_timeout_ms=timeout_ms,
        )

    def _line(self):
        return json.dumps(
            {"command": "recognize", "image_data": tiny_b64()}
        ).encode()

    def test_request_ids_are_zero_based(self):
        """fetch_add(1) returns the PRE-increment value, so the reference's
        first request_id is 0 (ocr_ipc_service.cpp:49,426)."""
        svc = self._service()

        async def ok(image, request_id):
            return {"request_id": request_id, "success": True,
                    "processing_time_ms": 5.0}

        svc.dispatcher.submit = ok

        async def run():
            r0 = await svc.process_request(self._line())
            r1 = await svc.process_request(self._line())
            return r0, r1

        r0, r1 = asyncio.run(run())
        assert r0["request_id"] == 0 and r1["request_id"] == 1

    def test_timeout_zero_disables_the_ceiling(self):
        svc = self._service(timeout_ms=0)
        assert svc.request_timeout is None

        async def slow(image, request_id):
            await asyncio.sleep(0.15)
            return {"request_id": request_id, "success": True,
                    "processing_time_ms": 150.0}

        svc.dispatcher.submit = slow
        r = asyncio.run(svc.process_request(self._line()))
        assert r["success"] is True
        assert svc.timed_out_requests == 0

    def test_average_is_success_only(self):
        """5 failures must not drag the reported average toward zero —
        the time sum only accumulates on success."""
        svc = self._service()
        outcomes = iter([True, False, True])

        async def mixed(image, request_id):
            ok = next(outcomes)
            return {
                "request_id": request_id,
                "success": ok,
                "processing_time_ms": 100.0 if ok else 0.0,
                **({} if ok else {"error": "boom"}),
            }

        svc.dispatcher.submit = mixed

        async def run():
            for _ in range(3):
                await svc.process_request(self._line())

        asyncio.run(run())
        status = json.loads(svc.get_status_info())
        assert status["average_processing_time_ms"] == 100.0
        assert (
            status["total_requests"]
            == status["successful_requests"] + status["failed_requests"]
        )

    def test_dispatcher_exception_counts_as_failed(self):
        """total == successful + failed must hold even when submit raises
        (e.g. pool shut down mid-recycle)."""
        svc = self._service()

        async def boom(image, request_id):
            raise RuntimeError("cannot schedule new futures after shutdown")

        svc.dispatcher.submit = boom
        r = asyncio.run(svc.process_request(self._line()))
        assert r["success"] is False
        assert svc.failed_requests == 1
        assert svc.total_requests == (
            svc.successful_requests + svc.failed_requests
        )

    def test_drain_waits_on_inflight_not_connections(self):
        """Idle pooled connections must not make the recycle drain kill
        in-flight requests: _delayed_stop polls in-flight requests."""
        svc = self._service()
        svc.running = True
        svc._active_clients = 8  # pooled idle connections held open
        svc._inflight_requests = 0
        stopped = []

        async def fake_stop():
            stopped.append(True)

        svc.stop_async = fake_stop

        async def run():
            t0 = asyncio.get_running_loop().time()
            await svc._delayed_stop()
            return asyncio.get_running_loop().time() - t0

        dt = asyncio.run(run())
        assert stopped and dt < 0.1  # drained immediately despite clients
