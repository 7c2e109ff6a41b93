"""End-to-end pipeline tests (engine + worker) on CPU with small shapes.

det/rec run with deterministic stand-in weights (real .pdiparams are not
bundled — SURVEY.md §2.2), so these tests pin behavior/schema/determinism
rather than OCR accuracy; cls runs with the real bundled weights.
"""

import numpy as np
import pytest

from ppocr_tpu.pipeline import (
    ClsConfig,
    DetConfig,
    OCREngine,
    OCRWorker,
    PipelineConfig,
    RecConfig,
)

RESPONSE_KEYS = {
    "request_id",
    "width",
    "height",
    "success",
    "processing_time_ms",
    "worker_id",
}


def small_config(**kw):
    """Tiny shapes so XLA CPU compiles stay fast (see utils.xla_cache).
    cls is enabled (non-default) so tests exercise the full 3-stage path."""
    kw.setdefault("enable_cls", True)
    return PipelineConfig(
        det=DetConfig(
            limit_type="max",
            limit_side_len=96,
            thresh=0.2,
            box_thresh=0.4,
            unclip_ratio=1.8,
            score_mode="fast",
            # no 32-bucket: XLA CPU compiles the degenerate 1×1-deep-feature
            # det graph pathologically slowly (~8 min vs 2 s at 96×96)
            shape_buckets=(64, 96),
        ),
        cls=ClsConfig(batch_num=4),
        rec=RecConfig(batch_num=4, img_h=28, img_w=192, width_buckets=(192,)),
        dtype="float32",
        **kw,
    )


@pytest.fixture(scope="module")
def engine(reference_models):
    return OCREngine(str(reference_models), small_config())


@pytest.fixture(scope="module")
def worker(engine):
    return OCRWorker(engine, worker_id=3)


def load_card(path):
    import cv2

    return cv2.imread(str(path))


class TestWorkerSchema:
    def test_success_schema(self, worker, card_image_path):
        r = worker.process(load_card(card_image_path), request_id=11)
        assert RESPONSE_KEYS <= set(r)
        assert r["request_id"] == 11
        assert r["worker_id"] == 3
        assert r["width"] == 391 and r["height"] == 178
        assert r["success"] is True
        assert isinstance(r["words"], list)
        for w in r["words"]:
            assert set(w) >= {"text", "confidence", "box"}
            assert len(w["box"]) == 4 and all(len(p) == 2 for p in w["box"])
            for x, y in w["box"]:
                assert 0 <= x <= 390 and 0 <= y <= 177

    def test_empty_image_error(self, worker):
        r = worker.process(None, request_id=5)
        assert r["success"] is False
        assert r["error"] == "Empty image data provided"
        assert r["width"] == 0 and r["height"] == 0

    def test_blank_image_empty_words(self, worker):
        # uniform gray → det prob map may or may not fire with random
        # weights, but the call must succeed either way
        r = worker.process(np.full((50, 80, 3), 128, np.uint8), request_id=6)
        assert r["success"] is True
        assert isinstance(r.get("words", []), list)

    def test_deterministic(self, worker, card_image_path):
        img = load_card(card_image_path)
        r1 = worker.process(img, 1)
        r2 = worker.process(img, 2)
        w1 = [(w["text"], w["box"]) for w in r1.get("words", [])]
        w2 = [(w["text"], w["box"]) for w in r2.get("words", [])]
        assert w1 == w2

    def test_stage_times_surface(self, worker, card_image_path):
        r = worker.process(load_card(card_image_path), request_id=7)
        assert "stage_times" in r
        assert len(r["stage_times"]["det_ms"]) == 3
        assert r["processing_time_ms"] > 0


class TestEngineStages:
    def test_classify_real_weights(self, engine, card_image_path):
        img = load_card(card_image_path)
        crop = img[40:88, 30:222]
        import cv2

        labels, scores, times = engine.classify(
            [crop, cv2.rotate(crop, cv2.ROTATE_180), crop]
        )
        assert labels[0] == 0  # upright with real cls weights
        assert len(labels) == len(scores) == 3
        assert all(0.0 <= s <= 1.0 for s in scores)

    def test_recognize_returns_aligned_lists(self, engine):
        rng = np.random.default_rng(0)
        crops = [
            rng.integers(0, 255, (20, 30 + 17 * i, 3), np.uint8) for i in range(6)
        ]
        texts, confs, times = engine.recognize(crops)
        assert len(texts) == len(confs) == 6
        texts2, confs2, _ = engine.recognize(crops)
        assert texts == texts2 and confs == confs2

    def test_detect_boxes_in_bounds(self, engine, card_image_path):
        img = load_card(card_image_path)
        boxes, times = engine.detect(img)
        for b in boxes:
            assert b.shape == (4, 2)
            assert (b[:, 0] >= 0).all() and (b[:, 0] <= 390).all()
            assert (b[:, 1] >= 0).all() and (b[:, 1] <= 177).all()
        assert times.inference_ms > 0

    def test_charset(self, engine):
        assert len(engine.charset) == 6625
        assert engine.charset[0] == "#"
        assert engine.charset[-1] == " "


class TestOffBucketGuard:
    """Requests whose det resize exceeds the closed bucket set must never
    lazily compile on a worker thread (that deadlocks the TPU tunnel —
    ADVICE r1 / CLAUDE.md). Main-thread compiles stay allowed."""

    def test_worker_thread_raises_clear_error(self, engine):
        import threading

        # limit 96 with buckets (64, 96): force the fallback by asking for
        # a resize beyond the largest bucket
        engine.config.det.limit_side_len = 192
        try:
            img = np.full((80, 160, 3), 255, np.uint8)
            errs = []

            def run():
                try:
                    engine.detect(img)
                except RuntimeError as e:
                    errs.append(str(e))

            t = threading.Thread(target=run)
            t.start()
            t.join(timeout=60)
            assert not t.is_alive()
            assert len(errs) == 1 and "worker thread" in errs[0]
        finally:
            engine.config.det.limit_side_len = 96

    def test_main_thread_fallback_still_works(self, engine):
        engine.config.det.limit_side_len = 128
        try:
            img = np.full((70, 140, 3), 255, np.uint8)
            boxes, times = engine.detect(img)  # compiles exact shape here
            assert times.inference_ms > 0
            # ...and the now-compiled shape is executable from a thread
            import threading

            ok = []
            t = threading.Thread(
                target=lambda: ok.append(engine.detect(img)[1].inference_ms)
            )
            t.start()
            t.join(timeout=60)
            assert ok and ok[0] > 0
        finally:
            engine.config.det.limit_side_len = 96

    def test_envelope_warning(self, reference_models):
        import warnings

        from ppocr_tpu.pipeline.config import DetConfig

        cfg = small_config(enable_cls=False)
        cfg.det = DetConfig(
            limit_type="max", limit_side_len=192, shape_buckets=(64, 96)
        )
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            OCREngine(str(reference_models), cfg)
        assert any("envelope" in str(w.message) for w in rec)
