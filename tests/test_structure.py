"""Tests for table-structure decode + PicoDet layout decode (ops.structure)."""

import numpy as np
import pytest

from ppocr_tpu.ops.resize import resize_hw, table_pad, table_resize
from ppocr_tpu.ops.structure import (
    LayoutBox,
    dis_pred_to_bbox,
    hard_nms,
    picodet_decode,
    table_decode,
)


class TestTableDecode:
    def test_basic_decode(self):
        labels = ["sos", "<tr>", "<td></td>", "</tr>", "eos"]
        T, C = 6, 5
        probs = np.zeros((1, T, C), np.float32)
        seq = [0, 1, 2, 2, 3, 4]  # sos <tr> td td </tr> eos
        for t, c in enumerate(seq):
            probs[0, t, c] = 0.9
        loc = np.zeros((1, T, 4), np.float32)
        loc[0, 2] = [0.1, 0.2, 0.5, 0.6]
        loc[0, 3] = [0.5, 0.2, 0.9, 0.6]
        tags, boxes, scores = table_decode(probs, loc, labels, widths=[100], heights=[50])
        assert tags[0] == ["<tr>", "<td></td>", "<td></td>", "</tr>"]
        assert boxes[0] == [[10, 10, 50, 30], [50, 10, 90, 30]]
        assert scores[0] == pytest.approx(0.9)

    def test_empty_boxes_score_minus_one(self):
        labels = ["sos", "<tr>", "</tr>", "eos"]
        probs = np.zeros((1, 3, 4), np.float32)
        probs[0, 0, 1] = 0.8
        probs[0, 1, 2] = 0.8
        probs[0, 2, 3] = 0.8  # eos
        _, boxes, scores = table_decode(probs, np.zeros((1, 3, 4), np.float32), labels, [10], [10])
        assert boxes[0] == []
        assert scores[0] == -1.0


class TestPicodet:
    def test_dfl_decode_center(self):
        # distribution peaked at bin 2 on all sides → dis = 2·stride
        reg_max, stride = 8, 8
        pred = np.full((4 * reg_max,), -10.0, np.float32)
        for side in range(4):
            pred[side * reg_max + 2] = 10.0
        box = dis_pred_to_bbox(pred, x=4, y=3, stride=stride, im_h=256, im_w=256, reg_max=reg_max)
        ct = ((4 + 0.5) * 8, (3 + 0.5) * 8)
        assert box == pytest.approx(
            [ct[0] - 16, ct[1] - 16, ct[0] + 16, ct[1] + 16], abs=1e-3
        )

    def test_hard_nms(self):
        boxes = [
            LayoutBox([0, 0, 10, 10], "text", 0.9),
            LayoutBox([1, 1, 11, 11], "text", 0.8),  # overlaps → dropped
            LayoutBox([50, 50, 60, 60], "text", 0.7),
        ]
        kept = hard_nms(boxes, 0.5)
        assert len(kept) == 2
        assert kept[0].confidence == 0.9 and kept[1].confidence == 0.7

    def test_full_decode_single_hit(self):
        labels = ["text", "table"]
        fpn = (8,)
        in_h = in_w = 64
        fh = fw = 8
        reg_max = 8
        cls = np.zeros((fh * fw, 2), np.float32)
        cls[9, 1] = 0.95  # row 1, col 1 → table
        reg = np.zeros((fh * fw, 4 * reg_max), np.float32)
        reg[9, :] = -10.0
        for side in range(4):
            reg[9, side * reg_max + 1] = 10.0  # dis = 1·stride = 8
        out = picodet_decode(
            [cls], [reg], labels, ori_shape=(128, 128), resize_shape=(64, 64),
            fpn_stride=fpn, score_threshold=0.4, reg_max=reg_max,
        )
        assert len(out) == 1
        b = out[0]
        assert b.type == "table" and b.confidence == pytest.approx(0.95)
        # center (12, 12) ± 8 in resize coords → ×2 to source coords
        assert b.box == pytest.approx([8, 8, 40, 40], abs=1e-3)


def test_table_resize_pad():
    img = np.ones((100, 200, 3), np.uint8) * 7
    resized, ratio = table_resize(img, 488)
    assert resized.shape[1] == 488 and ratio == pytest.approx(2.44)
    padded = table_pad(resized, 488)
    assert padded.shape[:2] == (488, 488)
    assert padded[-1, -1].tolist() == [0, 0, 0]
    assert resize_hw(img, 50, 60).shape == (50, 60, 3)


def test_table_labels_keep_interior_blank_lines(tmp_path):
    """ReadDict keeps blank lines (utility.cpp:32-48): dropping one would
    shift every later class index and decode wrong tags (review r3)."""
    from ppocr_tpu.ops.structure import load_table_labels

    p = tmp_path / "dict.txt"
    p.write_text("<thead>\n\n<tr>\n")
    labels = load_table_labels(str(p), merge_no_span_structure=False)
    assert labels == ["sos", "<thead>", "", "<tr>", "eos"]
    # CRLF dicts don't leak \r into the emitted HTML (documented deviation)
    p.write_bytes(b"<thead>\r\n<tr>\r\n")
    labels = load_table_labels(str(p), merge_no_span_structure=False)
    assert labels == ["sos", "<thead>", "<tr>", "eos"]
