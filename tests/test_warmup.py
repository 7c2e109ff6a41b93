"""Incremental warmup: serve-before-fully-compiled (VERDICT r4 missing #4).

The reference loads models then serves within seconds (ocr_det.cpp:23-91,
ocr_service_main.cpp:124-129); the fused serving set here is 75 compiled
variants that cost tens of tunnel-minutes to precompile. Incremental mode
starts serving immediately: the fused variant set compiles one at a time
on the event loop (the only tunnel-safe compile site), and a request for
a not-yet-compiled variant triggers the dispatchers' compile-before-
dispatch guard — compiling that variant inline on the loop BEFORE the
request's device work moves to a worker thread.
"""

import asyncio
import base64
import json
import socket
import time

import cv2
import numpy as np
import pytest

from ppocr_tpu.pipeline import OCREngine
from ppocr_tpu.pipeline.fused import FusedOCR
from test_pipeline import small_config


def _scene(i: int, h: int = 70, w: int = 90) -> np.ndarray:
    img = np.full((h, w, 3), 255, np.uint8)
    cv2.putText(
        img, f"{i}7", (6, 48), cv2.FONT_HERSHEY_SIMPLEX, 1.1, (0, 0, 0), 2
    )
    return img


@pytest.fixture()
def engine(reference_models):
    cfg = small_config(
        enable_cls=False,
        fast_path=True,
        fused_max_boxes=8,
        request_batch_buckets=(1, 2),
    )
    return OCREngine(str(reference_models), cfg)


class TestVariantTracking:
    def test_variant_keys_priority_order(self, engine):
        """Smallest batch bucket first, then ascending det-bucket area —
        the order that reaches single-request serve-readiness fastest."""
        fused = FusedOCR(engine, max_boxes=8)
        keys = fused.variant_keys()
        assert keys == [
            (1, 64, 64),
            (1, 64, 96),
            (1, 96, 64),
            (1, 96, 96),
            (2, 64, 64),
            (2, 64, 96),
            (2, 96, 64),
            (2, 96, 96),
        ]

    def test_required_variants_matches_process_batch_exactly(self, engine):
        """The shape-only predictor must name exactly the variants a real
        process_batch dispatches (the guard's correctness contract: a
        mispredicted key would compile on a worker thread = tunnel
        deadlock in production)."""
        fused = FusedOCR(engine, max_boxes=8)
        assert fused._compiled == set()
        # mixed det buckets and a group larger than a batch bucket
        imgs = [_scene(1, 70, 90), _scene(2, 70, 90), _scene(3, 70, 90),
                _scene(4, 50, 50)]
        rids = [1, 2, 3, 4]
        predicted = fused.required_variants(imgs)
        assert predicted  # fresh instance: everything is missing
        fused.process_batch(imgs, rids)
        assert fused._compiled == set(predicted)
        # now warm: nothing required
        assert fused.required_variants(imgs) == []

    def test_compile_variant_records_and_dedupes(self, engine):
        fused = FusedOCR(engine, max_boxes=8)
        key = fused.variant_keys()[0]
        assert fused.compile_variant(key) is True
        assert fused.compile_variant(key) is False  # already recorded
        assert key in fused._compiled

    def test_full_warmup_covers_variant_keys(self, engine):
        fused = FusedOCR(engine, max_boxes=8)
        fused.warmup()
        assert fused._compiled == set(fused.variant_keys())


class TestDispatcherGuard:
    def test_batching_dispatcher_compiles_on_loop_before_dispatch(
        self, engine
    ):
        """An UNWARMED engine must serve through the BatchingDispatcher:
        the consumer compiles the batch's variants inline on the event
        loop (observable via compile_variant calls) before the thread
        pool runs the device work."""
        from ppocr_tpu.serve.batcher import BatchingDispatcher

        disp = BatchingDispatcher(engine, num_workers=1, max_wait_ms=5)
        fused = disp.fused
        calls = []
        orig = fused.compile_variant

        def spy(key):
            calls.append(key)
            return orig(key)

        fused.compile_variant = spy

        async def run():
            return await asyncio.gather(
                disp.submit(_scene(1), 0), disp.submit(_scene(2), 1)
            )

        results = asyncio.run(run())
        disp.shutdown()
        assert all(r["success"] for r in results)
        assert calls, "guard never compiled — requests ran unguarded"
        assert set(calls) <= set(fused.variant_keys())

    def test_plain_dispatcher_guard_fused_path(self, engine):
        from ppocr_tpu.serve.executor import Dispatcher

        disp = Dispatcher(engine, num_workers=1)
        fused = engine.fused_ocr()
        assert fused._compiled == set()

        async def run():
            return await disp.submit(_scene(3), 7)

        r = asyncio.run(run())
        disp.shutdown()
        assert r["success"] is True
        assert fused._compiled  # the guard (or dispatch) recorded the key


class TestIncrementalWarmupService:
    def test_incremental_warmup_completes_and_serves_concurrently(
        self, reference_models
    ):
        """Start the service with NO warmup, launch incremental_warmup as
        a task, and serve a request while it runs: the request succeeds,
        the task finishes the whole variant set, and progress is
        surfaced in the status JSON."""
        import json

        from ppocr_tpu.serve import OCRIPCService

        cfg = small_config(
            enable_cls=False,
            fast_path=True,
            fused_max_boxes=8,
            request_batch_buckets=(1, 2),
        )
        svc = OCRIPCService(
            model_dir=str(reference_models),
            socket_path="/tmp/ppocr_tpu_warmup_test.sock",
            cpu_workers=1,
            config=cfg,
        )

        async def run():
            await svc.start_async()
            task = asyncio.get_running_loop().create_task(
                svc.incremental_warmup(log=lambda *_: None)
            )
            # request lands while the warmup task is still compiling
            res = await svc.dispatcher.submit(_scene(5), 0)
            await task
            status = json.loads(svc.get_status_info())
            await svc.stop_async()
            return res, status

        res, status = asyncio.run(run())
        assert res["success"] is True
        fused = svc.engine.fused_ocr()
        assert fused._compiled == set(fused.variant_keys())
        assert status["warmup_progress"]["compiled"] == len(
            fused.variant_keys()
        )

    def test_warmup_pauses_while_request_inflight(self, reference_models):
        """Background warmup must HOLD while a recognize is in flight
        (plus a 1 s idle grace), instead of racing the request for the
        event loop — under sustained load it pauses entirely and the
        guard warms demanded variants instead."""
        import time as _time

        from ppocr_tpu.serve import OCRIPCService

        cfg = small_config(
            enable_cls=False,
            fast_path=True,
            fused_max_boxes=8,
            request_batch_buckets=(1, 2),
        )
        svc = OCRIPCService(
            model_dir=str(reference_models),
            socket_path="/tmp/ppocr_tpu_warmup_test3.sock",
            cpu_workers=1,
            config=cfg,
        )
        fused = svc.engine.fused_ocr()
        compiled = []
        fused.compile_variant = lambda key: (compiled.append(key), True)[1]

        async def run():
            svc.running = True
            svc._inflight_requests = 1  # a request is being served
            task = asyncio.get_running_loop().create_task(
                svc.incremental_warmup(log=lambda *_: None)
            )
            await asyncio.sleep(0.5)
            held = len(compiled)  # must still be 0 — warmup is paused
            svc._inflight_requests = 0
            svc._last_request_ts = _time.monotonic() - 2.0  # grace elapsed
            await asyncio.wait_for(task, timeout=10)
            return held

        held = asyncio.run(run())
        assert held == 0, f"warmup compiled {held} variants under load"
        assert len(compiled) == len(fused.variant_keys())

    def test_request_not_starved_behind_background_compiles(
        self, reference_models
    ):
        """A recognize whose bytes arrive DURING a background variant
        compile must complete after at most ~one compile, not trickle
        one socket read per compile through the whole set (the r5 boot
        measurement caught a single request starved ~10 tunnel-compiles
        deep behind the old bare-sleep(0) yield)."""
        import threading

        from ppocr_tpu.serve import OCRIPCService

        sock_path = "/tmp/ppocr_tpu_warmup_test4.sock"
        cfg = small_config(
            enable_cls=False,
            fast_path=True,
            fused_max_boxes=8,
            request_batch_buckets=(1, 2),
        )
        svc = OCRIPCService(
            model_dir=str(reference_models),
            socket_path=sock_path,
            cpu_workers=1,
            config=cfg,
        )
        img = _scene(9)
        fused = svc.engine.fused_ocr()
        # pre-compile exactly what the request needs, so the measured
        # request time is free of real compile cost; every OTHER variant
        # gets a fake 0.3 s loop-blocking "tunnel compile"
        for key in fused.required_variants([img]):
            fused.compile_variant(key)
        def slow_compile(key):
            import time as _t

            _t.sleep(0.3)  # blocks the event loop like a real compile
            if key in fused._compiled:
                return False
            # record WITHOUT really compiling — the timing below must
            # count only the synthetic 0.3 s per variant, not real CPU
            # compiles (the request's own variant was pre-compiled above)
            fused._compiled.add(key)
            return True

        fused.compile_variant = slow_compile

        ready = threading.Event()
        t = threading.Thread(
            target=svc.run_blocking, args=(ready,), daemon=True
        )
        t.start()
        assert ready.wait(timeout=60)
        import asyncio as _aio

        warm_fut = _aio.run_coroutine_threadsafe(
            svc.incremental_warmup(log=lambda *_: None), svc._loop
        )
        try:
            ok, encoded = cv2.imencode(".png", img)
            assert ok
            payload = (
                json.dumps(
                    {
                        "command": "recognize",
                        "image_data": base64.b64encode(
                            encoded.tobytes()
                        ).decode(),
                    }
                )
                + "\n"
            ).encode()
            time.sleep(0.1)  # let warmup start its first fake compile
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            s.settimeout(30)
            s.connect(sock_path)
            t0 = time.perf_counter()
            # chunked send: the bytes arrive across multiple loop
            # iterations, exactly the starvation-triggering arrival shape
            for i in range(0, len(payload), max(1, len(payload) // 20)):
                s.sendall(payload[i : i + max(1, len(payload) // 20)])
                time.sleep(0.01)
            resp = json.loads(s.makefile().readline())
            elapsed = time.perf_counter() - t0
            s.close()
            assert resp["success"] is True
            # old scheduling: ≥ 7 remaining fake compiles × 0.3 s ≈ 2.1 s+
            # before the request even assembled; fixed: ≤ ~1 compile in
            # front of it
            assert elapsed < 1.8, (
                f"request took {elapsed:.2f}s — starved behind background "
                f"compiles"
            )
            warm_fut.result(timeout=30)
        finally:
            if svc.running and svc._loop is not None:
                _aio.run_coroutine_threadsafe(
                    svc.stop_async(), svc._loop
                ).result(timeout=10)
            t.join(timeout=10)

    def test_incremental_warmup_rejects_staged_profile(self, reference_models):
        from ppocr_tpu.serve import OCRIPCService

        svc = OCRIPCService(
            model_dir=str(reference_models),
            socket_path="/tmp/ppocr_tpu_warmup_test2.sock",
            cpu_workers=1,
            config=small_config(enable_cls=False, fast_path=False),
        )
        with pytest.raises(ValueError, match="fused"):
            asyncio.run(svc.incremental_warmup())


class TestShapeHelpers:
    """The shape-only det resize/cap predictors must track the pixel
    functions exactly (drift = wrong variant key = thread compile)."""

    @pytest.mark.parametrize(
        "h,w,limit_type,limit",
        [
            (178, 391, "max", 960),
            (178, 391, "max", 512),
            (100, 5000, "max", 960),
            (80, 80, "max", 96),
            (40, 700, "min", 736),
            (16, 16, "max", 960),
        ],
    )
    def test_det_target_shape_matches_det_resize(self, h, w, limit_type, limit):
        from ppocr_tpu.ops import det_resize, det_target_shape

        img = np.zeros((h, w, 3), np.uint8)
        resized, _, _ = det_resize(img, limit_type, limit)
        assert det_target_shape(h, w, limit_type, limit) == resized.shape[:2]

    @pytest.mark.parametrize("rh,rw,cap", [(192, 384, 96), (96, 64, 96), (960, 960, 512)])
    def test_det_cap_shape_matches_det_fit_cap(self, rh, rw, cap):
        from ppocr_tpu.ops import det_cap_shape, det_fit_cap

        img = np.zeros((rh, rw, 3), np.uint8)
        out, _, _ = det_fit_cap(img, 1.0, 1.0, cap)
        assert det_cap_shape(rh, rw, cap) == out.shape[:2]
