"""Multi-chip fused serving (SURVEY §2.4 DP row): request batches sharded
over the mesh "data" axis must produce exactly the single-device results —
the fused-serving analog of test_data_parallel_rec_matches_single_device.

The reference's parallelism is N worker replicas with private predictors
(cpu_worker_pool.cpp:43-56); here one replicated param set serves a batch
sharded across chips.
"""

import cv2
import numpy as np
import pytest

from ppocr_tpu.parallel import make_mesh
from ppocr_tpu.pipeline import OCREngine
from test_pipeline import small_config


def _scene(i: int) -> np.ndarray:
    img = np.full((100, 200, 3), 255, np.uint8)
    cv2.putText(
        img,
        f"{i}{(i + 1) % 10}{(i + 2) % 10}",
        (10 + 3 * i, 60),
        cv2.FONT_HERSHEY_SIMPLEX,
        1.2,
        (0, 0, 0),
        2,
    )
    return img


@pytest.fixture(scope="module")
def cfg():
    c = small_config(
        enable_cls=False,
        fast_path=True,
        request_batch_buckets=(8,),
        fused_max_boxes=8,
    )
    c.det.shape_buckets = (96,)  # one canvas shape keeps CPU compiles tiny
    return c


def test_fused_mesh_matches_single_device(reference_models, cfg):
    single = OCREngine(str(reference_models), cfg)
    mesh = make_mesh(8, model=1)
    sharded = OCREngine(str(reference_models), cfg, mesh=mesh)
    assert sharded.fused_ocr()._n_data() == 8

    imgs = [_scene(i) for i in range(5)]  # 5 < 8: exercises pad slots
    rids = list(range(5))
    base = single.fused_ocr().process_batch(imgs, rids)
    got = sharded.fused_ocr().process_batch(imgs, rids)
    assert len(base) == len(got) == 5
    for rb, rg in zip(base, got):
        assert rb["success"] and rg["success"]
        assert rb["request_id"] == rg["request_id"]
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


def test_mesh_pads_batch_bucket_to_data_axis(reference_models, cfg):
    """With a (1,) bucket config, a mesh engine must still dispatch evenly
    shardable batches (bucket rounded up to the data-axis width)."""
    mesh = make_mesh(8, model=1)
    eng = OCREngine(str(reference_models), cfg, mesh=mesh)
    fused = eng.fused_ocr()
    assert fused._pad_bucket(1) == 8
    assert fused._pad_bucket(8) == 8
    r = fused.process(_scene(3), 42)  # single request → padded batch of 8
    assert r["success"] is True
    assert r["request_id"] == 42


def test_mesh_beam_rotated_combination(reference_models):
    """Feature interaction guard: beam decode + rotated boxes + data-axis
    sharding compose — sharded output equals single-device exactly."""
    def make(mesh):
        c = small_config(
            enable_cls=False,
            fast_path=True,
            request_batch_buckets=(8,),
            fused_max_boxes=8,
        )
        c.det.shape_buckets = (96,)
        c.rec.decode = "beam"
        c.fused_rotated_boxes = True
        return OCREngine(str(reference_models), c, mesh=mesh)

    single = make(None)
    sharded = make(make_mesh(8, model=1))
    imgs = [_scene(i) for i in range(3)]
    base = single.fused_ocr().process_batch(imgs, [0, 1, 2])
    got = sharded.fused_ocr().process_batch(imgs, [0, 1, 2])
    for rb, rg in zip(base, got):
        assert rb["success"] and rg["success"]
        assert [w["text"] for w in rb["words"]] == [
            w["text"] for w in rg["words"]
        ]
        assert [w["box"] for w in rb["words"]] == [
            w["box"] for w in rg["words"]
        ]
