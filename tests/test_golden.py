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
