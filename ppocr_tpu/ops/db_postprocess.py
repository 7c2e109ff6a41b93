"""DB (Differentiable Binarization) detection postprocess.

Behavioral mirror of DBPostProcessor (postprocess_op.cpp:20-362) and the
threshold step of DBDetector::Run (ocr_det.cpp:136-160):

    prob map → uint8(prob·255) → binary (> thresh·255) → [dilate 2×2]
    → findContours → per contour: minAreaRect → ssid≥3 → score ≥ box_thresh
    → unclip by distance = area·ratio/perimeter → minAreaRect → ssid≥5
    → round/clamp → order clockwise → rescale to source → drop ≤4 px sides

The binarize/dilate half runs on-device inside the det jit
(:func:`binarize_device`); the irregular contour half runs on the host
(cv2 — same OpenCV the reference links, so contour/minAreaRect semantics
match exactly). The unclip is computed in closed form: offsetting a rotated
rect by d with round joins and re-taking minAreaRect equals expanding the
rect by 2d per side (Clipper places join vertices exactly on each edge
normal, so the support in the rect's axes is exactly +d; deviation from
Clipper's integer arc sampling is sub-pixel and vanishes after rounding).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import cv2
import jax.numpy as jnp
import numpy as np


def _roundf(x: np.ndarray) -> np.ndarray:
    """C roundf: half away from zero (np.round is banker's rounding and
    would shift exact-.5 box corners 1 px off the reference/native path)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def binarize_device(prob_map: jnp.ndarray, thresh: float, dilate: bool = False):
    """Device half: probability map → uint8 {0,255} bitmap (+2×2 dilation).

    Matches ocr_det.cpp:144-160: quantize to uint8 by truncation, then
    strict > thresh·255. The 2×2 dilation anchors like cv2's even kernel:
    out(y,x) = max(in[y-1..y, x-1..x]) — ink spreads down-right (see the
    inline comment; keep doc and code in agreement, review r3).
    """
    cbuf = (prob_map * 255.0).astype(jnp.uint8)
    bit = (cbuf > jnp.uint8(int(thresh * 255))).astype(jnp.uint8)
    if dilate:
        # cv2.dilate with a 2×2 rect kernel (default anchor → (1,1))
        # is out(y,x) = max(in[y-1..y, x-1..x]) with replicated borders.
        p = jnp.pad(bit, ((1, 0), (1, 0)), mode="edge")
        bit = jnp.maximum(
            jnp.maximum(p[:-1, :-1], p[:-1, 1:]),
            jnp.maximum(p[1:, :-1], p[1:, 1:]),
        )
    return bit * jnp.uint8(255)


def order_points_clockwise(pts: np.ndarray) -> np.ndarray:
    """4 points → [top-left, top-right, bottom-right, bottom-left]
    (postprocess_op.cpp:87-104: x-sort, then y-order within left/right pairs)."""
    pts = np.asarray(pts)
    box = pts[np.argsort(pts[:, 0], kind="stable")]
    left = box[:2][np.argsort(box[:2, 1], kind="stable")]
    right = box[2:][np.argsort(box[2:, 1], kind="stable")]
    return np.array([left[0], right[0], right[1], left[1]], dtype=pts.dtype)


def get_mini_boxes(rect) -> Tuple[np.ndarray, float]:
    """cv2 RotatedRect → corner points in the reference's canonical order,
    plus ssid = max(w, h).

    NOTE: upstream PaddleOCR uses min(w, h) for ssid; this codebase's
    reference uses **max** (postprocess_op.cpp:137) — preserved here.
    """
    (cx, cy), (w, h), angle = rect
    ssid = max(w, h)
    points = cv2.boxPoints(((cx, cy), (w, h), angle))
    array = points[np.argsort(points[:, 0], kind="stable")]
    if array[3][1] <= array[2][1]:
        idx2, idx3 = array[3], array[2]
    else:
        idx2, idx3 = array[2], array[3]
    if array[1][1] <= array[0][1]:
        idx1, idx4 = array[1], array[0]
    else:
        idx1, idx4 = array[0], array[1]
    return np.array([idx1, idx2, idx3, idx4], dtype=np.float32), float(ssid)


def box_score_fast(box: np.ndarray, pred: np.ndarray) -> float:
    """Mean of pred inside the (int-truncated) quad mask, bbox-cropped
    (postprocess_op.cpp:216-253)."""
    h, w = pred.shape
    xs, ys = box[:, 0], box[:, 1]
    xmin = int(np.clip(np.floor(xs.min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(xs.max()), 0, w - 1))
    ymin = int(np.clip(np.floor(ys.min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(ys.max()), 0, h - 1))
    mask = np.zeros((ymax - ymin + 1, xmax - xmin + 1), dtype=np.uint8)
    quad = np.stack(
        [xs.astype(np.int32) - xmin, ys.astype(np.int32) - ymin], axis=1
    )
    cv2.fillPoly(mask, [quad.reshape(-1, 1, 2)], 1)
    region = pred[ymin : ymax + 1, xmin : xmax + 1]
    return float(cv2.mean(region, mask)[0])


def polygon_score_acc(contour: np.ndarray, pred: np.ndarray) -> float:
    """'slow' score: mean of pred inside the full contour polygon
    (postprocess_op.cpp:170-214)."""
    h, w = pred.shape
    pts = contour.reshape(-1, 2)
    xs, ys = pts[:, 0].astype(np.float32), pts[:, 1].astype(np.float32)
    xmin = int(np.clip(np.floor(xs.min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(xs.max()), 0, w - 1))
    ymin = int(np.clip(np.floor(ys.min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(ys.max()), 0, h - 1))
    mask = np.zeros((ymax - ymin + 1, xmax - xmin + 1), dtype=np.uint8)
    poly = np.stack(
        [xs.astype(np.int32) - xmin, ys.astype(np.int32) - ymin], axis=1
    )
    cv2.fillPoly(mask, [poly.reshape(-1, 1, 2)], 1)
    region = pred[ymin : ymax + 1, xmin : xmax + 1]
    return float(cv2.mean(region, mask)[0])


def unclip_rect(box: np.ndarray, unclip_ratio: float):
    """Closed-form Clipper round-join offset of a quad + minAreaRect.

    distance = area·ratio/perimeter (postprocess_op.cpp:20-37); the quad's
    vertices are int-truncated first, exactly like the ClipperLib::Path
    construction at postprocess_op.cpp:48-51. Returns a cv2-style rotated
    rect ((cx, cy), (w+2d, h+2d), angle), or None when the polygon is
    degenerate (mirrors Clipper returning an empty solution → 1×1 rect →
    rejected by the < 1.001 check at postprocess_op.cpp:303).
    """
    pts = box.astype(np.float32)
    area = 0.0
    perim = 0.0
    for i in range(4):
        j = (i + 1) % 4
        area += pts[i, 0] * pts[j, 1] - pts[i, 1] * pts[j, 0]
        perim += float(np.hypot(pts[i, 0] - pts[j, 0], pts[i, 1] - pts[j, 1]))
    area = abs(area / 2.0)
    if perim <= 0:
        return None
    distance = area * unclip_ratio / perim

    ipts = np.trunc(pts).astype(np.float32)
    if cv2.contourArea(ipts) <= 0:
        return None
    (cx, cy), (w, h), angle = cv2.minAreaRect(ipts)
    return ((cx, cy), (w + 2 * distance, h + 2 * distance), angle)


def boxes_from_bitmap(
    pred: np.ndarray,
    bitmap: np.ndarray,
    box_thresh: float,
    unclip_ratio: float,
    score_mode: str = "slow",
    max_candidates: int = 1000,
    min_size: int = 3,
) -> List[np.ndarray]:
    """Bitmap → list of int quads in pred-map coordinates
    (postprocess_op.cpp:255-331)."""
    height, width = bitmap.shape
    dest_height, dest_width = pred.shape
    contours, _ = cv2.findContours(
        bitmap, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE
    )
    boxes = []
    for contour in contours[:max_candidates]:
        if len(contour) <= 2:
            continue
        rect = cv2.minAreaRect(contour)
        array, ssid = get_mini_boxes(rect)
        if ssid < min_size:
            continue
        if score_mode == "slow":
            score = polygon_score_acc(contour, pred)
        else:
            score = box_score_fast(array, pred)
        if score < box_thresh:
            continue
        clipped = unclip_rect(array, unclip_ratio)
        if clipped is None or (clipped[1][0] < 1.001 and clipped[1][1] < 1.001):
            continue
        cliparray, ssid = get_mini_boxes(clipped)
        if ssid < min_size + 2:
            continue
        # roundf semantics (half away from zero, postprocess_op.cpp:319),
        # NOT np.round's banker's rounding: an exact .5 coordinate would
        # otherwise shift a corner 1 px and disagree with the native
        # backend's std::round (review r3)
        quad = np.stack(
            [
                np.clip(
                    _roundf(cliparray[:, 0] / width * dest_width),
                    0,
                    dest_width,
                ),
                np.clip(
                    _roundf(cliparray[:, 1] / height * dest_height),
                    0,
                    dest_height,
                ),
            ],
            axis=1,
        ).astype(np.int64)
        boxes.append(quad)
    return boxes


def filter_tag_det_res(
    boxes: List[np.ndarray], ratio_h: float, ratio_w: float, src_h: int, src_w: int
) -> List[np.ndarray]:
    """Order clockwise, rescale to source pixels (int-truncating division,
    matching the C++ ``int /= float``), clamp, drop quads with either
    ordered side ≤ 4 px (postprocess_op.cpp:333-362)."""
    out = []
    for box in boxes:
        box = order_points_clockwise(box).astype(np.int64)
        box[:, 0] = np.clip(
            (box[:, 0] / ratio_w).astype(np.int64), 0, src_w - 1
        )
        box[:, 1] = np.clip(
            (box[:, 1] / ratio_h).astype(np.int64), 0, src_h - 1
        )
        rect_w = int(np.sqrt(((box[0] - box[1]) ** 2).sum()))
        rect_h = int(np.sqrt(((box[0] - box[3]) ** 2).sum()))
        if rect_w <= 4 or rect_h <= 4:
            continue
        out.append(box)
    return out


@dataclass
class DBPostProcess:
    """Bundled DB postprocess with the reference's two config profiles
    (header defaults ocr_det.h:108-123 vs the serving profile
    ocr_worker.cpp:28-33).

    ``backend``: "cv2" (parity baseline), "native" (the from-scratch C++
    core in native/dbpost.cpp via ctypes), or "auto" (native when built).
    """

    thresh: float = 0.3
    box_thresh: float = 0.5
    unclip_ratio: float = 2.0
    score_mode: str = "slow"
    use_dilation: bool = False
    max_candidates: int = 1000
    backend: str = "auto"

    def binarize_np(self, prob_map: np.ndarray) -> np.ndarray:
        """Host fallback of :func:`binarize_device` (identical output)."""
        cbuf = (prob_map * 255.0).astype(np.uint8)
        bit = ((cbuf > int(self.thresh * 255)) * 255).astype(np.uint8)
        if self.use_dilation:
            bit = cv2.dilate(bit, cv2.getStructuringElement(cv2.MORPH_RECT, (2, 2)))
        return bit

    def __call__(
        self,
        prob_map: np.ndarray,
        src_h: int,
        src_w: int,
        ratio_h: float,
        ratio_w: float,
        bitmap: np.ndarray = None,
    ) -> List[np.ndarray]:
        """prob_map [H,W] float32 (+ optionally the device-binarized bitmap)
        → list of 4×2 int quads in source-image coordinates."""
        if bitmap is None:
            bitmap = self.binarize_np(prob_map)
        use_native = self.backend == "native"
        if self.backend == "auto":
            from . import native

            use_native = native.available()
        if use_native:
            from . import native

            boxes, _scores = native.boxes_from_bitmap_native(
                prob_map,
                bitmap,
                self.box_thresh,
                self.unclip_ratio,
                self.score_mode,
                self.max_candidates,
            )
        else:
            boxes = boxes_from_bitmap(
                prob_map,
                bitmap,
                self.box_thresh,
                self.unclip_ratio,
                self.score_mode,
                self.max_candidates,
            )
        return filter_tag_det_res(boxes, ratio_h, ratio_w, src_h, src_w)
