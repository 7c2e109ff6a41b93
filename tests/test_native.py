"""Parity tests: native C++ DB-postprocess core vs the cv2 baseline."""

import cv2
import numpy as np
import pytest

from ppocr_tpu.ops import DBPostProcess, boxes_from_bitmap
from ppocr_tpu.ops import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libdbpost.so not built (make -C native)"
)


def random_blob_map(rng, h=96, w=160, n_blobs=4):
    prob = np.zeros((h, w), np.float32)
    for _ in range(n_blobs):
        bw = int(rng.integers(8, 60))
        bh = int(rng.integers(5, 25))
        x = int(rng.integers(0, w - bw))
        y = int(rng.integers(0, h - bh))
        val = float(rng.uniform(0.5, 0.95))
        patch = np.full((bh, bw), val, np.float32)
        if rng.random() < 0.5:  # rotated blob
            m = cv2.getRotationMatrix2D((bw / 2, bh / 2), float(rng.uniform(-40, 40)), 1.0)
            canvas = np.zeros((bh + 20, bw + 20), np.float32)
            canvas[10 : 10 + bh, 10 : 10 + bw] = patch
            patch = cv2.warpAffine(canvas, m, (bw + 20, bh + 20))
            bh, bw = patch.shape
            y = min(y, h - bh)
            x = min(x, w - bw)
        prob[y : y + bh, x : x + bw] = np.maximum(prob[y : y + bh, x : x + bw], patch)
    return prob


def test_min_area_rect_matches_cv2():
    rng = np.random.default_rng(1)
    for _ in range(20):
        pts = (rng.normal(0, 15, (int(rng.integers(4, 60)), 2)) + 60).astype(
            np.float32
        )
        (rc, rs, _), (nc, ns, _) = cv2.minAreaRect(pts), native.min_area_rect_native(pts)
        assert sorted(np.round(rs, 3)) == pytest.approx(sorted(np.round(ns, 3)), abs=1e-2)
        assert rc == pytest.approx(nc, abs=1e-2)


@pytest.mark.parametrize("score_mode", ["fast", "slow"])
def test_boxes_parity_random_maps(score_mode):
    rng = np.random.default_rng(7)
    agree = total = 0
    for trial in range(12):
        prob = random_blob_map(rng)
        bitmap = ((prob * 255).astype(np.uint8) > 51).astype(np.uint8) * 255
        ref = boxes_from_bitmap(prob, bitmap, 0.4, 1.8, score_mode)
        got, _ = native.boxes_from_bitmap_native(prob, bitmap, 0.4, 1.8, score_mode)
        # corners within 2px; scan-fill vs cv2.fillPoly rasterization can
        # skew a box's mean score by ~±0.005, so a box sitting exactly on
        # box_thresh may flip — allow at most one such per map
        assert abs(len(ref) - len(got)) <= 1, f"trial {trial}: {len(ref)} vs {len(got)}"
        for rb in ref:
            centers = [np.abs(np.sort(g, axis=0) - np.sort(rb, axis=0)).max() for g in got]
            total += 1
            if centers and min(centers) <= 2:
                agree += 1
    assert total == 0 or agree / total >= 0.9


def test_engine_backend_switch():
    prob = np.zeros((96, 160), np.float32)
    prob[30:50, 40:120] = 0.9
    kw = dict(thresh=0.2, box_thresh=0.4, unclip_ratio=1.8, score_mode="fast")
    ref = DBPostProcess(backend="cv2", **kw)(prob, 96, 160, 1.0, 1.0)
    nat = DBPostProcess(backend="native", **kw)(prob, 96, 160, 1.0, 1.0)
    assert len(ref) == len(nat) == 1
    np.testing.assert_array_equal(ref[0], nat[0])


class TestBackendAgreement:
    """Round-3 review: the four empirically-found cv2/native divergences."""

    def _both(self, prob, thresh=0.3, **kw):
        bmp = ((prob * 255).astype(np.uint8) > int(thresh * 255)).astype(
            np.uint8
        ) * 255
        ref = boxes_from_bitmap(prob, bmp, 0.4, 1.8, "fast", **kw)
        nat, _ = native.boxes_from_bitmap_native(
            prob, bmp, 0.4, 1.8, "fast", **kw
        )
        return ref, nat

    def test_thin_diagonal_staircase_kept(self):
        """A 1px slope-1/2 line keeps its corner points under cv2's
        CHAIN_APPROX_SIMPLE (only exact H/V/45° lines compress to ≤2
        points); the native min-dim<1 rule used to drop it."""
        prob = np.zeros((40, 60), np.float32)
        for i in range(20):
            prob[10 + i // 2, 10 + i] = 0.9
        ref, nat = self._both(prob, thresh=0.2)
        assert len(ref) == len(nat) == 1

    def test_exact_45_line_still_dropped(self):
        prob = np.zeros((40, 60), np.float32)
        for i in range(20):
            prob[10 + i, 10 + i] = 0.9
        ref, nat = self._both(prob, thresh=0.2)
        assert len(ref) == len(nat) == 0

    def test_corner_touching_holes_stay_separate(self):
        """Hole components are 4-connected (8-conn foreground ⇒ 4-conn
        background); an 8-conn fill merged diagonal-touching holes and
        lost a box."""
        prob = np.zeros((40, 40), np.float32)
        prob[5:35, 5:35] = 0.9
        prob[10:15, 10:15] = 0.0
        prob[15:20, 15:20] = 0.0
        ref, nat = self._both(prob, thresh=0.2)
        assert len(ref) == len(nat) == 3

    def test_max_candidates_keeps_the_same_subset(self):
        """cv2 slices the first N of its bottom-up emission list; the
        native cap now applies to the same ordering."""
        prob = np.zeros((60, 30), np.float32)
        for y0 in (2, 17, 32, 47):
            prob[y0 : y0 + 8, 5:25] = 0.9
        ref, nat = self._both(prob, thresh=0.2, max_candidates=2)
        assert [b[:, 1].min() for b in ref] == [b[:, 1].min() for b in nat]
        assert len(ref) == 2

    def test_unclip_truncation_tightens_corner_agreement(self):
        """Expanding from the int-truncated quad (ClipperLib::Path
        semantics) instead of the float rect: corners now agree within
        1 px across random rotated blobs (was 2 px on 90% of boxes)."""
        rng = np.random.default_rng(7)
        worst = 0
        for _ in range(20):
            prob = np.zeros((96, 160), np.float32)
            bw, bh = int(rng.integers(15, 50)), int(rng.integers(8, 20))
            x, y = int(rng.integers(0, 100)), int(rng.integers(0, 60))
            patch = np.full((bh, bw), 0.9, np.float32)
            m = cv2.getRotationMatrix2D(
                (bw / 2, bh / 2), float(rng.uniform(-40, 40)), 1.0
            )
            canvas = np.zeros((bh + 24, bw + 24), np.float32)
            canvas[12 : 12 + bh, 12 : 12 + bw] = patch
            patch = cv2.warpAffine(canvas, m, (bw + 24, bh + 24))
            ph, pw = patch.shape
            y = min(y, 96 - ph)
            x = min(x, 160 - pw)
            prob[y : y + ph, x : x + pw] = np.maximum(
                prob[y : y + ph, x : x + pw], patch
            )
            ref, nat = self._both(prob, thresh=0.2)
            assert len(ref) == len(nat)
            for rb, nb in zip(ref, nat):
                worst = max(
                    worst,
                    int(np.abs(np.sort(rb, 0) - np.sort(nb, 0)).max()),
                )
        assert worst <= 1, worst

    def test_mismatched_bitmap_shape_rejected(self):
        prob = np.zeros((40, 40), np.float32)
        with pytest.raises(ValueError, match="same-resolution"):
            native.boxes_from_bitmap_native(
                prob, np.zeros((20, 20), np.uint8), 0.4, 1.8, "fast"
            )
