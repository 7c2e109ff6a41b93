"""End-to-end accuracy gate with in-repo-trained weights (VERDICT r1 #3).

The reference bundles no det/rec inference weights (SURVEY.md §2.2), so the
round-1 goldens pinned stand-in-weight plumbing only. These tests close the
accuracy half of the north star: the bundled detector
(scripts/train_synthetic_det.py) *finds* rendered digit lines and the
bundled scene recognizer (scripts/train_synthetic_rec.py --scene-crops)
*reads them back exactly*, through the real serving pipelines — both the
staged parity path (det → boundingRect crop → rec, ocr_worker.cpp:213-311)
and the single-dispatch fused path. A text regression that preserves noise
would now fail loudly.
"""

import pathlib
import shutil

import numpy as np
import pytest

from ppocr_tpu.pipeline import OCREngine, OCRWorker
from ppocr_tpu.pipeline.config import DetConfig, PipelineConfig, RecConfig
from ppocr_tpu.train.synthetic import SyntheticSceneDataset

WEIGHTS = pathlib.Path(__file__).parent.parent / "weights"
DET_W = WEIGHTS / "det_synthetic_digits.npz"
REC_W = WEIGHTS / "rec_scene_digits.npz"

needs_weights = pytest.mark.skipif(
    not (DET_W.exists() and REC_W.exists()),
    reason="bundled trained weights not present",
)

N_SCENES = 12


def _cfg(**kw):
    return PipelineConfig(
        det=DetConfig(
            limit_type="max",
            limit_side_len=96,
            thresh=0.2,
            box_thresh=0.4,
            unclip_ratio=1.8,
            score_mode="fast",
            shape_buckets=(64, 96),
        ),
        rec=RecConfig(batch_num=4, img_h=48, img_w=160, width_buckets=(160,)),
        enable_cls=False,
        dtype="float32",
        **kw,
    )


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory, reference_models):
    md = tmp_path_factory.mktemp("trained_models")
    for name in ("det", "cls", "rec"):
        (md / name).mkdir()
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
    return md


def _score(worker, n_scenes=N_SCENES, seed=424):
    """(exact_matches, total_lines, det_found, det_gt) over fixed scenes."""
    ds = SyntheticSceneDataset(seed=seed)
    total = exact = det_found = det_gt = 0
    for s in range(n_scenes):
        scene, placed = ds.sample_scene()
        r = worker.process(scene, s)
        assert r["success"] is True
        det_gt += len(placed)
        det_found += len(r["words"])
        for t, (x0, y0, x1, y1) in placed:
            best, biou = None, 0.2
            for word in r["words"]:
                bx = np.array(word["box"])
                wx0, wy0 = bx.min(0)
                wx1, wy1 = bx.max(0)
                ix0, iy0 = max(x0, wx0), max(y0, wy0)
                ix1, iy1 = min(x1, wx1), min(y1, wy1)
                inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
                ua = (x1 - x0) * (y1 - y0) + (wx1 - wx0) * (wy1 - wy0) - inter
                v = inter / ua if ua > 0 else 0.0
                if v > biou:
                    biou, best = v, word
            total += 1
            if best is not None and best["text"] == t:
                exact += 1
    return exact, total, det_found, det_gt


@needs_weights
def test_staged_pipeline_reads_rendered_text(trained_model_dir):
    """Staged parity path: every rendered line is detected and nearly every
    one reads back exactly (measured 37/38 at pinning time; the gate leaves
    one extra slack for cross-platform float drift)."""
    eng = OCREngine(str(trained_model_dir), _cfg())
    assert eng.random_weights["det"] is False
    assert eng.random_weights["rec"] is False
    exact, total, det_found, det_gt = _score(OCRWorker(eng, 0))
    assert det_found == det_gt, (det_found, det_gt)
    assert total >= 15
    assert exact >= total - 2, f"{exact}/{total} exact text matches"


@needs_weights
def test_fused_pipeline_reads_rendered_text(trained_model_dir):
    """Single-dispatch fused path (det→CC→crops→rec in one jit): same gate.
    Measured 38/38 at pinning time — the MXU interpolation-matmul crops
    lose nothing vs host cv2 crops on this workload."""
    cfg = _cfg(fast_path=True, fused_max_boxes=8)
    cfg.det.shape_buckets = (96,)
    eng = OCREngine(str(trained_model_dir), cfg)
    exact, total, det_found, det_gt = _score(OCRWorker(eng, 0))
    assert det_found == det_gt, (det_found, det_gt)
    assert exact >= total - 2, f"{exact}/{total} exact text matches"


@needs_weights
def test_trained_weights_reject_garbled_regression(trained_model_dir):
    """The accuracy gate actually gates: a recognizer with re-randomized
    weights must NOT pass the exact-match bar (guards against the gate
    degenerating into a schema check)."""
    eng = OCREngine(str(trained_model_dir), _cfg())
    from ppocr_tpu.models import init_rec_params
    import jax

    eng.rec_params = jax.device_put(
        init_rec_params(seed=1), eng.device
    )
    exact, total, _, _ = _score(OCRWorker(eng, 0), n_scenes=3)
    assert exact < total - 2


@needs_weights
def test_rotated_scene_reads_back(trained_model_dir):
    """Rotation robustness: the det stage finds slightly-rotated lines and
    the rotation-augmented recognizer reads them — 8° scenes decode
    exactly (at pinning time 15/15; gate leaves slack of 2)."""
    import cv2

    eng = OCREngine(str(trained_model_dir), _cfg())
    worker = OCRWorker(eng, 0)
    ds = SyntheticSceneDataset(seed=2024)
    total = exact = 0
    for s in range(8):
        scene, placed = ds.sample_scene()
        h, w = scene.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2, h / 2), 8.0, 1.0)
        rot = cv2.warpAffine(scene, m, (w, h), borderValue=(255, 255, 255))
        r = worker.process(rot, s)
        assert r["success"] is True
        got = [x["text"] for x in r["words"]]
        for t, _ in placed:
            total += 1
            if t in got:
                got.remove(t)
                exact += 1
    assert total >= 10
    assert exact >= total - 2, f"{exact}/{total} exact at 8 deg"
