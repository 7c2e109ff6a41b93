"""Regenerate the golden pipeline output for tests/test_golden.py.

Run after any deliberate behavior change (or when real det/rec weights
replace the deterministic stand-ins):

    python scripts/make_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import jax

jax.config.update("jax_platforms", "cpu")

import cv2

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "goldens",
    "card-jd.small.json",
)


def main():
    from test_pipeline import small_config

    from ppocr_tpu.pipeline import OCREngine, OCRWorker

    engine = OCREngine("/root/reference/models", small_config())
    worker = OCRWorker(engine, worker_id=0)
    img = cv2.imread("/root/reference/images/card-jd.jpg")
    result = worker.process(img, request_id=42)
    result.pop("processing_time_ms")
    result.pop("stage_times")
    # round confidences for a stable comparison across backends/dtypes
    for w in result.get("words", []):
        w["confidence"] = round(w["confidence"], 4)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w", encoding="utf-8") as f:
        json.dump(result, f, ensure_ascii=False, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN}: {len(result.get('words', []))} words")


if __name__ == "__main__":
    main()
