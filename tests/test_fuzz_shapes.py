"""Shape-fuzz sweep: arbitrary image geometries through both serving
pipelines must never crash and always return schema-valid responses
(degenerate inputs collapse onto the closed compiled bucket sets)."""

import cv2
import numpy as np
import pytest

from ppocr_tpu.pipeline import OCREngine, OCRWorker
from test_pipeline import small_config

SIZES = [
    (1, 1),
    (1, 200),
    (200, 1),
    (7, 13),
    (31, 33),
    (64, 64),
    (95, 97),
    (100, 700),  # extreme aspect (wide)
    (700, 100),  # extreme aspect (tall)
    (193, 191),
]


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 255, np.uint8)
    if h >= 30 and w >= 60:
        cv2.putText(
            img,
            str(seed) * 3,
            (5, min(h - 5, 40)),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.8,
            (0, 0, 0),
            2,
        )
    else:
        img[:] = rng.integers(0, 255, (h, w, 3), np.uint8)
    return img


def _check(r, h, w):
    assert r["success"] is True, r
    assert r["width"] == w and r["height"] == h
    for word in r["words"]:
        assert isinstance(word["text"], str)
        assert 0.0 <= word["confidence"] <= 1.0 or word["confidence"] == 0.0
        assert len(word["box"]) == 4
        for x, y in word["box"]:
            assert 0 <= x < w and 0 <= y < h, (word["box"], (h, w))


@pytest.fixture(scope="module")
def staged_worker(reference_models):
    return OCRWorker(OCREngine(str(reference_models), small_config()), 0)


@pytest.fixture(scope="module")
def fused_worker(reference_models):
    cfg = small_config(enable_cls=False, fast_path=True, fused_max_boxes=8)
    return OCRWorker(OCREngine(str(reference_models), cfg), 1)


@pytest.mark.parametrize("h,w", SIZES)
def test_staged_fuzz(staged_worker, h, w):
    r = staged_worker.process(_img(h, w, h * 1000 + w), 1)
    _check(r, h, w)


@pytest.mark.parametrize("h,w", SIZES)
def test_fused_fuzz(fused_worker, h, w):
    r = fused_worker.process(_img(h, w, h * 1000 + w), 1)
    _check(r, h, w)


def test_non_contiguous_and_grayscale_like_inputs(staged_worker):
    """Sliced (non-contiguous) views must work like owned arrays."""
    base = _img(120, 240, 5)
    view = base[10:74, 20:180]  # non-contiguous slice
    r = staged_worker.process(view, 2)
    _check(r, 64, 160)
