"""The reference's own 13-test inventory, reproduced name-for-name.

tests/test_ocr_worker.cpp:618-689 runs: ConstructorCPU, StartStop,
MultipleStart, IdleState, InvalidModelPath, BasicOCRProcessing,
RealImageProcessing, EmptyImageProcessing, WithTextClassification,
WithoutTextClassification, ConcurrentProcessing, PerformanceBenchmark,
ColdVsWarmStartup — mapped onto this framework's equivalents (worker =
engine-backed logical worker; start/stop = service lifecycle).
"""

import threading
import time

import numpy as np
import pytest

from test_pipeline import small_config

from ppocr_tpu.pipeline import OCREngine, OCRWorker
from ppocr_tpu.serve import Dispatcher, OCRIPCService


@pytest.fixture(scope="module")
def engine(reference_models):
    return OCREngine(str(reference_models), small_config())


@pytest.fixture(scope="module")
def worker(engine):
    return OCRWorker(engine, worker_id=1)


def synthetic_image():
    import cv2

    img = np.full((100, 300, 3), 255, np.uint8)
    cv2.putText(img, "Hello OCR Test", (10, 55), cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 0, 0), 2)
    return img


class TestReferenceSuite:
    def test_constructor_cpu(self, engine):
        """ConstructorCPU: worker construction with valid models."""
        w = OCRWorker(engine, worker_id=0)
        assert w.worker_id == 0
        assert w.engine.rec_params is not None

    def test_start_stop(self, reference_models):
        """StartStop: service starts and stops cleanly."""
        svc = OCRIPCService(
            str(reference_models),
            "/tmp/ppocr_ref_suite.sock",
            cpu_workers=1,
            config=small_config(),
        )
        ready = threading.Event()
        t = threading.Thread(target=svc.run_blocking, args=(ready,), daemon=True)
        t.start()
        assert ready.wait(30)
        assert svc.running is True
        import asyncio

        asyncio.run_coroutine_threadsafe(svc.stop_async(), svc._loop).result(10)
        t.join(10)
        assert svc.running is False

    def test_multiple_start(self, engine):
        """MultipleStart: re-dispatching through the same pool is safe."""
        d = Dispatcher(engine, num_workers=2)
        d.shutdown()
        d2 = Dispatcher(engine, num_workers=2)  # second pool over same engine
        d2.shutdown()

    def test_idle_state(self, engine):
        """IdleState: workers report idle before/after a request."""
        d = Dispatcher(engine, num_workers=2)
        assert all(n == 0 for n in d._inflight)
        idx = d._pick_worker()
        assert d._inflight[idx] == 1
        d._run(idx, synthetic_image(), 1)
        assert d._inflight[idx] == 0
        d.shutdown()

    def test_invalid_model_path(self):
        """InvalidModelPath: engine construction must raise."""
        with pytest.raises(Exception):
            OCREngine("/nonexistent/models", small_config())

    def test_basic_ocr_processing(self, worker):
        """BasicOCRProcessing: synthetic cv2.putText image."""
        r = worker.process(synthetic_image(), request_id=100)
        assert r["success"] is True
        assert r["request_id"] == 100

    def test_real_image_processing(self, worker, card_image_path):
        """RealImageProcessing: the bundled card-jd.jpg. (The reference's
        version checks stale `texts`/`boxes` keys the worker no longer
        emits — SURVEY.md §4; we assert the real `words` schema.)"""
        import cv2

        r = worker.process(cv2.imread(str(card_image_path)), request_id=101)
        assert r["success"] is True
        assert "words" in r

    def test_empty_image_processing(self, worker):
        """EmptyImageProcessing: expects success:false."""
        r = worker.process(None, request_id=102)
        assert r["success"] is False
        assert r["error"] == "Empty image data provided"

    def test_with_text_classification(self, reference_models, card_image_path):
        """WithTextClassification: cls enabled end-to-end."""
        import cv2

        eng = OCREngine(str(reference_models), small_config(enable_cls=True))
        r = OCRWorker(eng, 0).process(cv2.imread(str(card_image_path)), 1)
        assert r["success"] is True

    def test_without_text_classification(self, reference_models, card_image_path):
        """WithoutTextClassification: cls disabled end-to-end."""
        import cv2

        eng = OCREngine(str(reference_models), small_config(enable_cls=False))
        assert eng.cls_params is None
        r = OCRWorker(eng, 0).process(cv2.imread(str(card_image_path)), 2)
        assert r["success"] is True

    def test_concurrent_processing(self, worker, card_image_path):
        """ConcurrentProcessing: 3 queued requests, each response carries
        its own request_id (the reference queues 3 on one worker)."""
        import cv2

        img = cv2.imread(str(card_image_path))
        results = [None] * 3

        def run(i):
            results[i] = worker.process(img, request_id=200 + i)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(60)
        assert all(r is not None and r["success"] for r in results)
        assert [r["request_id"] for r in results] == [200, 201, 202]

    def test_performance_benchmark(self, worker, card_image_path):
        """PerformanceBenchmark: 3 runs of card-jd, average wall time. The
        reference grades <300 ms excellent on its CPU; on the hermetic CPU
        test backend we only pin an upper bound (bench.py measures the real
        chip)."""
        import cv2

        img = cv2.imread(str(card_image_path))
        worker.process(img, 0)  # warm
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            r = worker.process(img, i + 1)
            times.append((time.perf_counter() - t0) * 1e3)
            assert r["success"]
        assert sum(times) / 3 < 30000  # hard timeout analog (30 s/request)

    def test_cold_vs_warm_startup(self, reference_models, card_image_path):
        """ColdVsWarmStartup: first inference (compile/cached-load) vs
        subsequent — warm must not be slower than cold."""
        import cv2

        eng = OCREngine(str(reference_models), small_config())
        w = OCRWorker(eng, 0)
        img = cv2.imread(str(card_image_path))
        t0 = time.perf_counter()
        w.process(img, 1)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        w.process(img, 2)
        warm = time.perf_counter() - t0
        assert warm <= cold * 1.5 + 0.05
