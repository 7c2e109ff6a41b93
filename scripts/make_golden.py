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


TRAINED_GOLDEN = os.path.join(
    os.path.dirname(GOLDEN), "scene-trained.json"
)


def _strip(result):
    result.pop("processing_time_ms")
    result.pop("stage_times", None)
    # round confidences for a stable comparison across backends/dtypes
    for w in result.get("words", []):
        w["confidence"] = round(w["confidence"], 4)
    return result


def main():
    from test_e2e_trained import DET_W, REC_W, _cfg
    from test_pipeline import small_config

    from ppocr_tpu.pipeline import OCREngine, OCRWorker

    engine = OCREngine("/root/reference/models", small_config())
    worker = OCRWorker(engine, worker_id=0)
    img = cv2.imread("/root/reference/images/card-jd.jpg")
    result = _strip(worker.process(img, request_id=42))
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w", encoding="utf-8") as f:
        json.dump(result, f, ensure_ascii=False, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN}: {len(result.get('words', []))} words")

    # real-text golden: trained det finds rendered digits, trained rec reads
    # them — pins text content, not just plumbing (VERDICT r1 #3)
    if DET_W.exists() and REC_W.exists():
        import shutil
        import tempfile

        from ppocr_tpu.train.synthetic import SyntheticSceneDataset

        with tempfile.TemporaryDirectory() as md:
            ref = "/root/reference/models"
            for name in ("det", "cls", "rec"):
                os.makedirs(os.path.join(md, name))
                shutil.copy(
                    os.path.join(ref, name, "inference.pdmodel"),
                    os.path.join(md, name, "inference.pdmodel"),
                )
            shutil.copy(
                os.path.join(ref, "rec", "ppocr_keys_v1.txt"),
                os.path.join(md, "rec", "ppocr_keys_v1.txt"),
            )
            shutil.copy(DET_W, os.path.join(md, "det", "weights.npz"))
            shutil.copy(REC_W, os.path.join(md, "rec", "weights.npz"))
            ds = SyntheticSceneDataset(seed=424)
            scene, placed = ds.sample_scene()
            while len(placed) < 3:  # deterministic multi-line scene
                scene, placed = ds.sample_scene()
            trained = OCRWorker(OCREngine(md, _cfg()), worker_id=0)
            result = _strip(trained.process(scene, request_id=7))
            result["gt_lines"] = sorted(t for t, _ in placed)
            with open(TRAINED_GOLDEN, "w", encoding="utf-8") as f:
                json.dump(result, f, ensure_ascii=False, indent=1, sort_keys=True)
            print(
                f"wrote {TRAINED_GOLDEN}: {len(result['words'])} words, "
                f"gt {result['gt_lines']}"
            )

            # fused-path golden on the same scene (single-dispatch pipeline)
            fcfg = _cfg(fast_path=True, fused_max_boxes=8)
            fcfg.det.shape_buckets = (96,)
            fworker = OCRWorker(OCREngine(md, fcfg), worker_id=0)
            fres = _strip(fworker.process(scene, request_id=7))
            fres["gt_lines"] = sorted(t for t, _ in placed)
            fused_path = os.path.join(
                os.path.dirname(GOLDEN), "scene-trained-fused.json"
            )
            with open(fused_path, "w", encoding="utf-8") as f:
                json.dump(fres, f, ensure_ascii=False, indent=1, sort_keys=True)
            print(
                f"wrote {fused_path}: {len(fres['words'])} words, "
                f"gt {fres['gt_lines']}"
            )


if __name__ == "__main__":
    main()
