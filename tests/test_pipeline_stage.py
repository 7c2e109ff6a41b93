"""Cross-chip pipeline staging (SURVEY §2.4 PP row): det/geometry on device
A, rec on device B with a device-to-device crops handoff, results equal to
the single-chip fused step."""

import cv2
import numpy as np
import pytest

from ppocr_tpu.parallel import CrossChipFusedOCR
from ppocr_tpu.pipeline import OCREngine
from test_pipeline import small_config


@pytest.fixture(scope="module")
def engine(reference_models):
    cfg = small_config(
        enable_cls=False, fast_path=True, fused_max_boxes=8
    )
    cfg.det.shape_buckets = (96,)
    return OCREngine(str(reference_models), cfg)


def _text_img(i: int) -> np.ndarray:
    img = np.full((100, 200, 3), 255, np.uint8)
    cv2.putText(
        img,
        f"{i}{(i + 3) % 10}{(i + 7) % 10}",
        (12, 62),
        cv2.FONT_HERSHEY_SIMPLEX,
        1.2,
        (0, 0, 0),
        2,
    )
    return img


def test_two_stage_matches_single_chip_fused(engine):
    import jax

    devs = jax.devices()
    assert len(devs) >= 2
    staged = CrossChipFusedOCR(engine, devs[0], devs[1])
    # stage params actually live on distinct devices
    det_dev = jax.tree.leaves(staged.det_params)[0].devices()
    rec_dev = jax.tree.leaves(staged.rec_params)[0].devices()
    assert det_dev == {devs[0]} and rec_dev == {devs[1]}

    fused = engine.fused_ocr()
    imgs = [_text_img(i) for i in range(4)]
    base = [fused.process(im, i) for i, im in enumerate(imgs)]
    got = staged.process_stream(imgs, list(range(4)))
    for rb, rg in zip(base, got):
        assert rg["success"] is True
        assert [w["text"] for w in rb["words"]] == [
            w["text"] for w in rg["words"]
        ]
        assert [w["box"] for w in rb["words"]] == [
            w["box"] for w in rg["words"]
        ]
        np.testing.assert_allclose(
            [w["confidence"] for w in rb["words"]],
            [w["confidence"] for w in rg["words"]],
            rtol=1e-5,
        )


def test_stream_overlap_dispatches_async(engine):
    """process_stream must issue every stage-1 dispatch before fetching any
    result (request-level overlap); smoke-checked by processing a stream
    larger than 2 and verifying per-request outputs stay request-aligned."""
    import jax

    devs = jax.devices()
    staged = CrossChipFusedOCR(engine, devs[0], devs[1])
    imgs = [_text_img(i) for i in (1, 5, 9)]
    out = staged.process_stream(imgs, [11, 12, 13])
    assert [r["request_id"] for r in out] == [11, 12, 13]
    texts = [[w["text"] for w in r["words"]] for r in out]
    singles = [
        [w["text"] for w in staged.process(im, 0)["words"]] for im in imgs
    ]
    assert texts == singles


def test_worker_routes_to_cross_chip(reference_models):
    """PipelineConfig.cross_chip: OCRWorker serves through the two-stage
    cross-chip pipeline and matches the single-chip fused output."""
    from ppocr_tpu.pipeline import OCRWorker

    cfg = small_config(enable_cls=False, fast_path=True, fused_max_boxes=8)
    cfg.det.shape_buckets = (96,)
    cfg.cross_chip = True
    eng = OCREngine(str(reference_models), cfg)
    w = OCRWorker(eng, worker_id=2)
    assert type(w._fused).__name__ == "CrossChipFusedOCR"
    img = _text_img(4)
    r = w.process(img, 9)
    assert r["success"] is True and r["worker_id"] == 2

    cfg2 = small_config(enable_cls=False, fast_path=True, fused_max_boxes=8)
    cfg2.det.shape_buckets = (96,)
    base = OCREngine(str(reference_models), cfg2).fused_ocr().process(img, 9)
    assert [x["text"] for x in r["words"]] == [
        x["text"] for x in base["words"]
    ]
    assert [x["box"] for x in r["words"]] == [x["box"] for x in base["words"]]


def test_oversize_image_downscales_to_bucket_cap(engine):
    """An image whose det resize exceeds the largest shape bucket must
    downscale to fit (ops.det_fit_cap) on the cross-chip path too, and
    still equal the single-chip fused result (same regression as
    tests/test_fused.py: broadcast crash with truncated bucket sets)."""
    import jax

    devs = jax.devices()
    staged = CrossChipFusedOCR(engine, devs[0], devs[1])
    fused = engine.fused_ocr()
    img = _text_img(5)
    old = engine.config.det.limit_side_len
    engine.config.det.limit_side_len = 960  # resize → 128×256 > cap 96
    try:
        base = fused.process(img, 1)
        got = staged.process_stream([img], [1])[0]
    finally:
        engine.config.det.limit_side_len = old
    assert got["success"] is True
    assert [w["text"] for w in got["words"]] == [
        w["text"] for w in base["words"]
    ]
    assert [w["box"] for w in got["words"]] == [
        w["box"] for w in base["words"]
    ]


def test_cross_chip_honors_use_dilation(reference_models):
    """use_dilation must flow into the cross-chip graph like every other
    path (review r3: the hand-copied build call silently dropped it) —
    equality vs the single-chip fused step WITH dilation enabled."""
    import jax

    cfg = small_config(enable_cls=False, fast_path=True, fused_max_boxes=8)
    cfg.det.shape_buckets = (96,)
    cfg.det.use_dilation = True
    eng = OCREngine(str(reference_models), cfg)
    devs = jax.devices()
    staged = CrossChipFusedOCR(eng, devs[0], devs[1])
    fused = eng.fused_ocr()
    imgs = [_text_img(i) for i in range(2)]
    base = [fused.process(im, i) for i, im in enumerate(imgs)]
    got = staged.process_stream(imgs, [0, 1])
    for rb, rg in zip(base, got):
        assert [w["text"] for w in rb["words"]] == [
            w["text"] for w in rg["words"]
        ]
        assert [w["box"] for w in rb["words"]] == [
            w["box"] for w in rg["words"]
        ]


def test_process_stream_rejects_length_mismatch(engine):
    import jax

    devs = jax.devices()
    staged = CrossChipFusedOCR(engine, devs[0], devs[1])
    with pytest.raises(ValueError, match="request_ids"):
        staged.process_stream([_text_img(0)], [1, 2])
