"""Golden-output test on the bundled card image (SURVEY.md §4 implication:
integration-test shape with exact response pinning).

With the bundled artifacts, det/rec run deterministic stand-in weights, so
the golden pins the *pipeline's* behavior (boxes, schema, decode plumbing,
determinism) rather than OCR accuracy. Regenerate deliberately with
scripts/make_golden.py; the test fails loudly on any unintended change to
resize rounding, postprocess geometry, ordering, or decode rules.
"""

import json
import pathlib

import pytest

from test_pipeline import small_config

GOLDEN = pathlib.Path(__file__).parent / "goldens" / "card-jd.small.json"


@pytest.mark.skipif(not GOLDEN.exists(), reason="golden not generated")
def test_card_matches_golden(reference_models, card_image_path):
    import cv2

    from ppocr_tpu.pipeline import OCREngine, OCRWorker

    engine = OCREngine(str(reference_models), small_config())
    worker = OCRWorker(engine, worker_id=0)
    result = worker.process(cv2.imread(str(card_image_path)), request_id=42)
    result.pop("processing_time_ms")
    result.pop("stage_times")
    for w in result.get("words", []):
        w["confidence"] = round(w["confidence"], 4)

    golden = json.loads(GOLDEN.read_text(encoding="utf-8"))
    assert result["success"] == golden["success"]
    assert result["width"] == golden["width"]
    assert result["height"] == golden["height"]
    assert len(result["words"]) == len(golden["words"])
    for got, want in zip(result["words"], golden["words"]):
        assert got["box"] == want["box"]
        assert got["text"] == want["text"]
        assert abs(got["confidence"] - want["confidence"]) < 2e-3


TRAINED_GOLDEN = pathlib.Path(__file__).parent / "goldens" / "scene-trained.json"


@pytest.mark.skipif(not TRAINED_GOLDEN.exists(), reason="golden not generated")
def test_trained_scene_matches_golden(reference_models, tmp_path):
    """Real-text golden (VERDICT r1 #3): with the bundled TRAINED weights,
    the staged pipeline must reproduce the pinned boxes AND the exact gt
    text of a fixed multi-line digit scene — an OCR-accuracy regression
    (not just a plumbing change) now fails this test."""
    import shutil

    from test_e2e_trained import DET_W, REC_W, _cfg

    from ppocr_tpu.pipeline import OCREngine, OCRWorker
    from ppocr_tpu.train.synthetic import SyntheticSceneDataset

    if not (DET_W.exists() and REC_W.exists()):
        pytest.skip("bundled trained weights not present")

    golden = json.loads(TRAINED_GOLDEN.read_text(encoding="utf-8"))
    md = tmp_path / "trained_golden_models"
    if not md.exists():
        for name in ("det", "cls", "rec"):
            (md / name).mkdir(parents=True)
            shutil.copy(
                reference_models / name / "inference.pdmodel",
                md / name / "inference.pdmodel",
            )
        shutil.copy(
            reference_models / "rec" / "ppocr_keys_v1.txt",
            md / "rec" / "ppocr_keys_v1.txt",
        )
        shutil.copy(DET_W, md / "det" / "weights.npz")
        shutil.copy(REC_W, md / "rec" / "weights.npz")

    ds = SyntheticSceneDataset(seed=424)
    scene, placed = ds.sample_scene()
    while len(placed) < 3:
        scene, placed = ds.sample_scene()
    assert sorted(t for t, _ in placed) == golden["gt_lines"]

    worker = OCRWorker(OCREngine(str(md), _cfg()), worker_id=0)
    result = worker.process(scene, request_id=7)
    result.pop("processing_time_ms")
    result.pop("stage_times", None)
    assert result["success"] is True
    # the pinned words read the ground truth back exactly
    assert sorted(w["text"] for w in golden["words"]) == golden["gt_lines"]
    assert len(result["words"]) == len(golden["words"])
    for got, want in zip(result["words"], golden["words"]):
        assert got["text"] == want["text"]
        assert got["box"] == want["box"]
        assert abs(got["confidence"] - want["confidence"]) < 2e-3


FUSED_GOLDEN = pathlib.Path(__file__).parent / "goldens" / "scene-trained-fused.json"


@pytest.mark.skipif(not FUSED_GOLDEN.exists(), reason="golden not generated")
def test_trained_scene_fused_matches_golden(reference_models, tmp_path):
    """Fused-path real-text golden: the single-dispatch pipeline reproduces
    its pinned boxes and the exact gt text on the trained scene."""
    import shutil

    from test_e2e_trained import DET_W, REC_W, _cfg

    from ppocr_tpu.pipeline import OCREngine, OCRWorker
    from ppocr_tpu.train.synthetic import SyntheticSceneDataset

    if not (DET_W.exists() and REC_W.exists()):
        pytest.skip("bundled trained weights not present")

    golden = json.loads(FUSED_GOLDEN.read_text(encoding="utf-8"))
    md = tmp_path / "m"
    for name in ("det", "cls", "rec"):
        (md / name).mkdir(parents=True)
        shutil.copy(
            reference_models / name / "inference.pdmodel",
            md / name / "inference.pdmodel",
        )
    shutil.copy(
        reference_models / "rec" / "ppocr_keys_v1.txt",
        md / "rec" / "ppocr_keys_v1.txt",
    )
    shutil.copy(DET_W, md / "det" / "weights.npz")
    shutil.copy(REC_W, md / "rec" / "weights.npz")

    ds = SyntheticSceneDataset(seed=424)
    scene, placed = ds.sample_scene()
    while len(placed) < 3:
        scene, placed = ds.sample_scene()

    cfg = _cfg(fast_path=True, fused_max_boxes=8)
    cfg.det.shape_buckets = (96,)
    worker = OCRWorker(OCREngine(str(md), cfg), worker_id=0)
    result = worker.process(scene, request_id=7)
    assert result["success"] is True
    assert sorted(w["text"] for w in golden["words"]) == golden["gt_lines"]
    assert len(result["words"]) == len(golden["words"])
    for got, want in zip(result["words"], golden["words"]):
        assert got["text"] == want["text"]
        assert got["box"] == want["box"]
        assert abs(got["confidence"] - round(want["confidence"], 4)) < 2e-3
