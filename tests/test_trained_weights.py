"""Integration: the bundled trained recognizer weights actually read text.

Closes the loop train → export → serve: weights produced by
scripts/train_synthetic_rec.py load through the engine's weights.npz
override and greedy-decode rendered digit lines correctly.
"""

import pathlib
import shutil

import numpy as np
import pytest

WEIGHTS = pathlib.Path(__file__).parent.parent / "weights" / "rec_synthetic_digits.npz"


@pytest.mark.skipif(not WEIGHTS.exists(), reason="demo weights not present")
def test_trained_rec_reads_digits(tmp_path, reference_models):
    from test_pipeline import small_config

    from ppocr_tpu.pipeline import OCREngine, RecConfig
    from ppocr_tpu.train.synthetic import render_line

    model_dir = tmp_path / "models"
    for name in ("det", "cls", "rec"):
        (model_dir / name).mkdir(parents=True)
        shutil.copy(
            reference_models / name / "inference.pdmodel",
            model_dir / name / "inference.pdmodel",
        )
    shutil.copy(
        reference_models / "rec" / "ppocr_keys_v1.txt",
        model_dir / "rec" / "ppocr_keys_v1.txt",
    )
    shutil.copy(WEIGHTS, model_dir / "rec" / "weights.npz")

    cfg = small_config(enable_cls=False)
    # trained at h=48 on 128px-wide renders
    cfg.rec = RecConfig(batch_num=4, img_h=48, img_w=128, width_buckets=(128,))
    engine = OCREngine(str(model_dir), cfg)
    assert engine.random_weights["rec"] is False

    rng = np.random.default_rng(123)
    texts = ["314", "0926", "57", "88410"]
    crops = [render_line(t, 48, 128, rng) for t in texts]
    decoded, confs, _times = engine.recognize(crops)
    exact = sum(d == t for d, t in zip(decoded, texts))
    assert exact >= 3, list(zip(texts, decoded, confs))
    assert all(c > 0.5 for d, c in zip(decoded, confs) if d)
