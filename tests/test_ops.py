"""Golden/unit tests for ppocr_tpu.ops against reference C++ semantics."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppocr_tpu.ops import (
    DBPostProcess,
    bounding_crop,
    cls_resize,
    crnn_resize,
    ctc_greedy_decode_np,
    det_resize,
    get_mini_boxes,
    get_rotate_crop_image,
    iou_float,
    order_points_clockwise,
    sort_boxes,
    unclip_rect,
    xyxyxyxy2xyxy,
)
from ppocr_tpu.ops.ctc import ctc_greedy_collapse, ctc_topk_device
from ppocr_tpu.ops.db_postprocess import binarize_device
from ppocr_tpu.ops.normalize import (
    HALF_MEAN,
    HALF_SCALE,
    IMAGENET_MEAN,
    IMAGENET_SCALE,
    normalize_chw_np,
    normalize_nhwc_to_nchw,
    normalize_nhwc_to_nchw_masked,
    pack_batch,
)


class TestDetResize:
    def test_card_image_shape(self):
        # card-jd.jpg is 391×178: under limit 960 no scaling, sides snap to
        # round(178/32)*32 = 192 and round(391/32)*32 = 384
        img = np.zeros((178, 391, 3), np.uint8)
        out, rh, rw = det_resize(img, "max", 960)
        assert out.shape == (192, 384, 3)
        assert rh == pytest.approx(192 / 178)
        assert rw == pytest.approx(384 / 391)

    def test_limit_max_downscale(self):
        img = np.zeros((1080, 1920, 3), np.uint8)
        out, rh, rw = det_resize(img, "max", 960)
        # ratio 960/1920=0.5 → 540×960 → round to 544×960
        assert out.shape == (544, 960, 3)

    def test_serving_profile_512(self):
        img = np.zeros((178, 391, 3), np.uint8)
        out, _, _ = det_resize(img, "max", 512)
        assert out.shape == (192, 384, 3)  # unchanged, under limit

    def test_floor_32(self):
        img = np.zeros((10, 10, 3), np.uint8)
        out, _, _ = det_resize(img, "max", 960)
        assert out.shape == (32, 32, 3)

    def test_limit_min_upscale(self):
        img = np.zeros((100, 400, 3), np.uint8)
        out, _, _ = det_resize(img, "min", 736)
        # ratio = 736/100 = 7.36 → 736×2944 → round/32 → 736×2944
        assert out.shape[0] == 736


class TestRecClsResize:
    def test_crnn_resize_pads_to_batch_width(self):
        img = np.zeros((56, 100, 3), np.uint8)  # ratio 1.786
        out = crnn_resize(img, max_wh_ratio=320 / 48, rec_image_shape=(3, 48, 320))
        assert out.shape == (48, 320, 3)
        # content width = ceil(48*100/56) = ceil(85.71) = 86
        assert out[:, 86:].max() == 0

    def test_crnn_resize_caps_width(self):
        img = np.zeros((10, 1000, 3), np.uint8)  # ratio 100 ≫ max
        out = crnn_resize(img, max_wh_ratio=10.0, rec_image_shape=(3, 48, 320))
        assert out.shape == (48, 480, 3)

    def test_cls_resize_no_pad(self):
        img = np.zeros((96, 100, 3), np.uint8)
        out = cls_resize(img, (3, 48, 192))
        assert out.shape == (48, 50, 3)
        wide = cls_resize(np.zeros((10, 1000, 3), np.uint8), (3, 48, 192))
        assert wide.shape == (48, 192, 3)


class TestNormalize:
    def test_host_device_parity_imagenet(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (16, 24, 3), np.uint8)
        host = normalize_chw_np(img, IMAGENET_MEAN, IMAGENET_SCALE)
        dev = np.asarray(
            normalize_nhwc_to_nchw(jnp.asarray(img[None]), IMAGENET_MEAN, IMAGENET_SCALE)
        )[0]
        np.testing.assert_allclose(host, dev, rtol=1e-6, atol=1e-6)

    def test_rec_pad_black_equals_reference_padding(self):
        # rec pads with black pixels BEFORE normalize → pad value is exactly
        # (0/255 - 0.5)*2 = -1 in the normalized tensor
        batch = pack_batch([np.full((4, 3, 3), 200, np.uint8)], width=6)
        out = np.asarray(normalize_nhwc_to_nchw(jnp.asarray(batch), HALF_MEAN, HALF_SCALE))
        np.testing.assert_allclose(out[0, :, :, 3:], -1.0, atol=1e-6)

    def test_cls_masked_pad_is_zero(self):
        # cls pads AFTER normalize with 0 (ocr_cls.cpp:52-56)
        batch = pack_batch([np.full((4, 3, 3), 200, np.uint8)], width=6)
        out = np.asarray(
            normalize_nhwc_to_nchw_masked(
                jnp.asarray(batch), jnp.asarray([3], jnp.int32), HALF_MEAN, HALF_SCALE
            )
        )
        np.testing.assert_allclose(out[0, :, :, 3:], 0.0, atol=1e-6)
        assert abs(out[0, 0, 0, 0] - (200 / 255 - 0.5) * 2) < 1e-6


class TestCTC:
    def test_collapse_rule(self):
        # sequence: [1, 1, 0, 1, 2, 2, 0, 3] → "1 1 2 3" after
        # drop-blank + dedup-adjacent (reference: keep idx>0 and not repeat)
        idx = np.array([[1, 1, 0, 1, 2, 2, 0, 3]])
        probs = np.full((1, 8), 0.5, np.float32)
        kept, conf = ctc_greedy_collapse(idx, probs)
        assert kept[0].tolist() == [1, 1, 2, 3]
        assert conf[0] == pytest.approx(0.5)

    def test_all_blank_gives_nan(self):
        idx = np.zeros((1, 5), np.int32)
        _, conf = ctc_greedy_collapse(idx, np.ones((1, 5), np.float32))
        assert np.isnan(conf[0])

    def test_full_decode(self):
        charset = ["#", "a", "b", "c"]
        probs = np.zeros((1, 4, 4), np.float32)
        probs[0, 0, 1] = 0.9  # a
        probs[0, 1, 1] = 0.8  # a (repeat, dropped)
        probs[0, 2, 0] = 0.7  # blank
        probs[0, 3, 3] = 0.6  # c
        probs += 1e-4
        texts, conf = ctc_greedy_decode_np(probs, charset)
        assert texts == ["ac"]
        assert conf[0] == pytest.approx((0.9001 + 0.6001) / 2, rel=1e-4)

    def test_device_topk_matches_numpy(self):
        rng = np.random.default_rng(1)
        probs = rng.random((3, 7, 20)).astype(np.float32)
        idx, val = jax.jit(ctc_topk_device)(jnp.asarray(probs))
        np.testing.assert_array_equal(np.asarray(idx), probs.argmax(-1))
        np.testing.assert_allclose(np.asarray(val), probs.max(-1), rtol=1e-6)


class TestDBPostprocess:
    def test_binarize_matches_cv2(self):
        rng = np.random.default_rng(2)
        prob = rng.random((64, 96)).astype(np.float32)
        post = DBPostProcess(thresh=0.3, use_dilation=True)
        host = post.binarize_np(prob)
        dev = np.asarray(jax.jit(
            lambda p: binarize_device(p, 0.3, dilate=True)
        )(jnp.asarray(prob)))
        np.testing.assert_array_equal(host, dev)

    def test_order_points_clockwise(self):
        pts = np.array([[10, 10], [50, 12], [48, 30], [8, 28]])
        shuffled = pts[[2, 0, 3, 1]]
        ordered = order_points_clockwise(shuffled)
        np.testing.assert_array_equal(ordered, pts)

    def test_get_mini_boxes_axis_aligned(self):
        rect = ((50.0, 30.0), (40.0, 20.0), 0.0)
        box, ssid = get_mini_boxes(rect)
        assert ssid == 40.0  # max(w,h) — this reference's quirk
        np.testing.assert_allclose(
            box, [[30, 20], [70, 20], [70, 40], [30, 40]], atol=1e-4
        )

    def test_unclip_expands_by_distance(self):
        box = np.array([[30, 20], [70, 20], [70, 40], [30, 40]], np.float32)
        rect = unclip_rect(box, unclip_ratio=2.0)
        # area 800, perim 120 → d = 800*2/120 = 13.333
        (cx, cy), (w, h), _ = rect
        assert (cx, cy) == pytest.approx((50, 30), abs=0.51)
        assert sorted([w, h]) == pytest.approx([20 + 2 * 13.3333, 40 + 2 * 13.3333], abs=0.6)

    def test_end_to_end_synthetic_blob(self):
        # a filled rectangle in the prob map must come back as one box
        # centered on it and expanded by the unclip distance
        prob = np.zeros((96, 160), np.float32)
        prob[30:50, 40:120] = 0.9
        post = DBPostProcess(
            thresh=0.2, box_thresh=0.4, unclip_ratio=1.8, score_mode="fast"
        )
        boxes = post(prob, src_h=96, src_w=160, ratio_h=1.0, ratio_w=1.0)
        assert len(boxes) == 1
        box = boxes[0]
        xs, ys = box[:, 0], box[:, 1]
        # blob is 80×20 at (40..119, 30..49); unclip distance ≈ area·1.8/per ≈ 14.2
        assert 20 <= xs.min() <= 32 and 127 <= xs.max() <= 140
        assert 10 <= ys.min() <= 22 and 57 <= ys.max() <= 70

    def test_small_blob_rejected(self):
        prob = np.zeros((64, 64), np.float32)
        prob[10:12, 10:12] = 0.9  # ssid < 3
        post = DBPostProcess(thresh=0.2, box_thresh=0.4, score_mode="fast")
        assert post(prob, 64, 64, 1.0, 1.0) == []

    def test_low_score_rejected(self):
        prob = np.zeros((64, 64), np.float32)
        prob[20:40, 10:50] = 0.3  # above thresh·255 quantization, below box_thresh
        post = DBPostProcess(thresh=0.2, box_thresh=0.6, score_mode="slow")
        assert post(prob, 64, 64, 1.0, 1.0) == []

    def test_rescale_to_source(self):
        prob = np.zeros((96, 160), np.float32)
        prob[30:50, 40:120] = 0.9
        post = DBPostProcess(thresh=0.2, box_thresh=0.4, unclip_ratio=1.8, score_mode="fast")
        full = post(prob, 96, 160, 1.0, 1.0)
        halved = post(prob, 192, 320, 0.5, 0.5)
        np.testing.assert_allclose(halved[0], full[0] * 2, atol=2)


class TestGeometry:
    def test_xyxyxyxy2xyxy(self):
        assert xyxyxyxy2xyxy([[10, 5], [40, 6], [38, 20], [9, 19]]) == [9, 5, 40, 20]

    def test_bounding_crop(self):
        img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
        crop = bounding_crop(img, [[10, 5], [40, 6], [38, 20], [9, 19]])
        assert crop.shape == (16, 32, 3)  # boundingRect of the quad
        np.testing.assert_array_equal(crop, img[5:21, 9:41])

    def test_rotate_crop_tall_rotates(self):
        img = np.zeros((200, 100, 3), np.uint8)
        box = [[10, 10], [40, 10], [40, 110], [10, 110]]  # h=100, w=30 → tall
        crop = get_rotate_crop_image(img, box)
        assert crop.shape[1] > crop.shape[0]  # rotated to landscape

    def test_sort_boxes_rows(self):
        boxes = [
            np.array([[100, 12], [150, 12], [150, 30], [100, 30]]),  # row 1 right
            np.array([[10, 50], [60, 50], [60, 70], [10, 70]]),  # row 2 left
            np.array([[10, 10], [60, 10], [60, 30], [10, 30]]),  # row 1 left
        ]
        order = sort_boxes(boxes)
        assert order == [2, 0, 1]

    def test_iou(self):
        assert iou_float([0, 0, 10, 10], [5, 5, 15, 15]) == pytest.approx(25 / 175)
        assert iou_float([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0


class TestDetFitCap:
    def test_noop_when_within_cap(self):
        from ppocr_tpu.ops import det_fit_cap

        img = np.zeros((64, 96, 3), np.uint8)
        out, rh, rw = det_fit_cap(img, 0.5, 0.5, 96)
        assert out is img and rh == 0.5 and rw == 0.5

    def test_downscale_keeps_32_alignment_and_ratios(self):
        from ppocr_tpu.ops import det_fit_cap, det_resize

        src = np.zeros((178, 391, 3), np.uint8)
        resized, rh, rw = det_resize(src, "max", 960)  # → 192×384
        assert resized.shape[:2] == (192, 384)
        out, nrh, nrw = det_fit_cap(resized, rh, rw, 96)
        oh, ow = out.shape[:2]
        assert oh <= 96 and ow <= 96
        assert oh % 32 == 0 and ow % 32 == 0
        # ratios stay resized/src so boxes map back to source coords
        assert nrh == pytest.approx(oh / 178)
        assert nrw == pytest.approx(ow / 391)


class TestReferenceExactSemantics:
    """Round-3 review: C-exact rounding/clamping corners."""

    def test_roundf_half_away_from_zero(self):
        from ppocr_tpu.ops.db_postprocess import _roundf

        x = np.array([0.5, 1.5, 2.5, -0.5, -1.5, 2.4])
        np.testing.assert_array_equal(
            _roundf(x), [1.0, 2.0, 3.0, -1.0, -2.0, 2.0]
        )

    def test_box_corners_round_like_the_reference(self):
        """A centered square blob lands on an exact-.5 corner after unclip;
        np.round (banker's) rounded 2.5 down to 2 where roundf/std::round —
        the reference and the native backend — give 3."""
        from ppocr_tpu.ops import boxes_from_bitmap

        prob = np.zeros((16, 16), np.float32)
        prob[4:8, 4:8] = 0.9
        bitmap = ((prob * 255).astype(np.uint8) > 51).astype(np.uint8) * 255
        boxes = boxes_from_bitmap(prob, bitmap, 0.4, 1.8, "fast")
        assert len(boxes) == 1
        # the min corner is exactly 2.5: banker's rounding gave 2
        assert boxes[0].min() == 3, boxes[0]

    def test_iou_degenerate_crossing_boxes(self):
        """Zero-area crossing boxes: the reference returns 0.0 via its
        epsilon denominator; this used to ZeroDivisionError."""
        from ppocr_tpu.ops import iou_float

        assert iou_float([3, 0, 3, 5], [0, 2, 7, 2]) == 0.0
        # inverted boxes clamp to zero area instead of going negative
        assert iou_float([5, 5, 1, 1], [0, 0, 4, 4]) == 0.0

    def test_bounding_crop_negative_origin_intersects(self):
        """cv::Rect intersection: bbox &= Rect(0,0,cols,rows) keeps the far
        edge at x+w with the ORIGINAL x; clamping x first widened crops."""
        from ppocr_tpu.ops import bounding_crop

        img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
        crop = bounding_crop(img, [[-5, 10], [14, 10], [14, 20], [-5, 20]])
        assert crop.shape[1] == 15  # [0, 15), not [0, 20)

    def test_perspective_crop_uses_black_borders(self):
        """The reference's 5-arg warpPerspective passes BORDER_REPLICATE in
        the FLAGS position (==INTER_LINEAR), so it actually warps with
        default black borders — quirk preserved."""
        from ppocr_tpu.ops import get_rotate_crop_image

        img = np.full((40, 40, 3), 200, np.uint8)
        # rotated quad: the upright warp samples outside the crop corners
        box = [[20, 2], [38, 20], [20, 38], [2, 20]]
        crop = get_rotate_crop_image(img, box)
        # with BORDER_REPLICATE every pixel would be exactly 200; constant
        # (black) borders blend the corners below it
        assert crop.min() < 200

    def test_det_resize_rounds_half_away_from_zero(self):
        """C round (preprocess_op.cpp): a side of 80 px snaps to 96
        (80/32 = 2.5 → 3); Python's banker's round() picked 64."""
        from ppocr_tpu.ops import det_resize

        img = np.zeros((80, 720, 3), np.uint8)
        resized, _, _ = det_resize(img, "max", 960)  # ratio stays 1.0
        assert resized.shape[0] == 96, resized.shape
        # and 144 → 160 (4.5 → 5), not 128
        img2 = np.zeros((144, 720, 3), np.uint8)
        assert det_resize(img2, "max", 960)[0].shape[0] == 160
