"""Fused rotated-box mode: min-area oriented rects by device rotating
calipers (the
closed-form minAreaRect approximation; postprocess_op.cpp:255-331 is the
staged-path exact analog)."""

import cv2
import numpy as np
import pytest


def _quad_iou(a, b, shape):
    """Raster IoU of two quads."""
    ma = np.zeros(shape, np.uint8)
    mb = np.zeros(shape, np.uint8)
    cv2.fillPoly(ma, [np.asarray(a, np.int32)], 1)
    cv2.fillPoly(mb, [np.asarray(b, np.int32)], 1)
    inter = np.logical_and(ma, mb).sum()
    union = np.logical_or(ma, mb).sum()
    return inter / union if union else 0.0


class TestRotatedStats:
    @pytest.mark.parametrize("angle", [0.0, 12.0, 27.0, -18.0])
    def test_pca_rect_matches_minarearect(self, angle):
        """For a clean rotated rectangle blob, the calipers rect must
        agree with cv2.minAreaRect (angle within 0.2°, raster IoU ≥ 0.95)."""
        import jax
        import jax.numpy as jnp

        from ppocr_tpu.pipeline.fused import (
            _blob_stats,
            _connected_components,
        )

        h, w = 96, 160
        rect = ((80.0, 48.0), (90.0, 22.0), angle)
        corners = cv2.boxPoints(rect)
        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [np.round(corners).astype(np.int32)], 1)

        fg = jnp.asarray(mask.astype(bool))
        labels = jax.jit(_connected_components)(fg)
        stats = jax.device_get(
            jax.jit(
                lambda l, p: _blob_stats(l, p, 4, rotated=True)
            )(labels, fg.astype(jnp.float32))
        )
        k = int(np.argmax(stats["area"]))
        c, s = np.cos(stats["theta"][k]), np.sin(stats["theta"][k])
        us = np.array(
            [stats["u0"][k], stats["u1"][k], stats["u1"][k], stats["u0"][k]]
        )
        vs = np.array(
            [stats["v0"][k], stats["v0"][k], stats["v1"][k], stats["v1"][k]]
        )
        quad = np.stack([us * c - vs * s, us * s + vs * c], axis=1)

        ref_rect = cv2.minAreaRect(np.argwhere(mask)[:, ::-1].astype(np.int32))
        ref_quad = cv2.boxPoints(ref_rect)
        iou = _quad_iou(quad, ref_quad, (h, w))
        assert iou >= 0.9, (angle, iou, quad, ref_quad)

        # orientation agreement modulo 90° symmetry
        theta_deg = np.degrees(float(stats["theta"][k])) % 90.0
        ref_deg = ref_rect[2] % 90.0
        diff = min(abs(theta_deg - ref_deg), 90.0 - abs(theta_deg - ref_deg))
        assert diff <= 3.0, (theta_deg, ref_deg)


class TestRotatedFused:
    def test_upright_scene_unchanged_and_quads_valid(
        self, tmp_path, reference_models
    ):
        """On upright trained-weights scenes, rotated mode must read the
        same texts as axis mode and emit quads that cover the same regions
        (raster IoU ≥ 0.8 per word)."""
        import shutil

        from test_e2e_trained import DET_W, REC_W, _cfg

        from ppocr_tpu.pipeline import OCREngine
        from ppocr_tpu.train.synthetic import SyntheticSceneDataset

        if not (DET_W.exists() and REC_W.exists()):
            pytest.skip("bundled trained weights not present")

        md = tmp_path / "models"
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

        ds = SyntheticSceneDataset(seed=31)
        scene, placed = ds.sample_scene()

        def run(rotated):
            cfg = _cfg(fast_path=True, fused_max_boxes=8)
            cfg.det.shape_buckets = (96,)
            cfg.fused_rotated_boxes = rotated
            eng = OCREngine(str(md), cfg)
            fused = eng.fused_ocr()
            assert fused.rotated is rotated
            r = fused.process(scene, 1)
            assert r["success"]
            return r["words"]

        axis = run(False)
        rot = run(True)
        assert [w["text"] for w in axis] == [w["text"] for w in rot]
        shape = scene.shape[:2]
        for wa, wr in zip(axis, rot):
            assert _quad_iou(wa["box"], wr["box"], shape) >= 0.8, (
                wa["box"],
                wr["box"],
            )
