"""Host geometry helpers mirroring Utility (utility.cpp) behavior.

These run on quads/crops — tiny host work between the two device stages.
"""

from __future__ import annotations

from typing import List, Sequence

import cv2
import numpy as np


def xyxyxyxy2xyxy(box: Sequence[Sequence[int]]) -> List[int]:
    """Quad → axis-aligned [left, top, right, bottom] (utility.cpp:329-348)."""
    xs = [p[0] for p in box]
    ys = [p[1] for p in box]
    return [int(min(xs)), int(min(ys)), int(max(xs)), int(max(ys))]


def bounding_crop(img: np.ndarray, box: Sequence[Sequence[int]]) -> np.ndarray:
    """Axis-aligned boundingRect crop of a quad — the crop the worker
    actually uses (ocr_worker.cpp:245-259 uses cv::boundingRect, NOT the
    perspective crop; preserved as a behavioral quirk for output parity)."""
    pts = np.asarray(box, dtype=np.int32)
    x, y, w, h = cv2.boundingRect(pts)
    # cv::Rect intersection (bbox &= Rect(0,0,cols,rows)): the far edge is
    # min(cols, x+w) with the ORIGINAL x — clamping x first would widen
    # the crop for negative origins (review r3)
    x2 = min(img.shape[1], x + w)
    y2 = min(img.shape[0], y + h)
    x = max(0, x)
    y = max(0, y)
    if x2 <= x or y2 <= y:
        return np.zeros((0, 0, 3), dtype=img.dtype)
    return img[y:y2, x:x2].copy()


def get_rotate_crop_image(
    img: np.ndarray, box: Sequence[Sequence[int]]
) -> np.ndarray:
    """Perspective crop of a quad with the tall-crop rotate heuristic
    (utility.cpp:137-190): warp to an upright rect sized by the quad's edge
    lengths; if height ≥ 1.5·width, rotate 90° (transpose + vertical flip).
    Exposed as the optional ``perspective`` crop mode."""
    points = np.asarray(box, dtype=np.float32)
    left, top = points[:, 0].min(), points[:, 1].min()
    right, bottom = points[:, 0].max(), points[:, 1].max()
    crop = img[int(top) : int(bottom), int(left) : int(right)].copy()
    shifted = points - np.array([left, top], np.float32)

    width = int(np.sqrt(((shifted[0] - shifted[1]) ** 2).sum()))
    height = int(np.sqrt(((shifted[0] - shifted[3]) ** 2).sum()))
    std = np.array(
        [[0, 0], [width, 0], [width, height], [0, height]], dtype=np.float32
    )
    m = cv2.getPerspectiveTransform(shifted, std)
    # quirk preserved: the reference passes cv::BORDER_REPLICATE in the
    # FLAGS position of the 5-arg warpPerspective (utility.cpp:178-181),
    # and BORDER_REPLICATE==1==INTER_LINEAR — so it actually runs with
    # default BORDER_CONSTANT (black) borders. Match that, not the intent.
    dst = cv2.warpPerspective(crop, m, (width, height))
    if dst.shape[0] >= dst.shape[1] * 1.5:
        dst = cv2.flip(cv2.transpose(dst), 0)
    return dst


def sort_boxes(boxes: List[np.ndarray]) -> List[int]:
    """Top-to-bottom, left-to-right ordering with a 10 px same-row
    tolerance. Reproduces Utility::sort_boxes (utility.cpp:315-327)
    including its single-pass bubble quirk: first sort by (y, x) of the
    top-left point, then swap adjacent entries whose rows overlap within
    10 px but are left-right inverted. Returns the index order."""
    order = sorted(
        range(len(boxes)), key=lambda i: (boxes[i][0][1], boxes[i][0][0])
    )
    if len(order) > 1:
        for i in range(len(order) - 1):
            for j in range(i, -1, -1):
                a, b = boxes[order[j + 1]], boxes[order[j]]
                if abs(a[0][1] - b[0][1]) < 10 and a[0][0] < b[0][0]:
                    order[i], order[i + 1] = order[i + 1], order[i]
    return order


def iou_float(a: Sequence[float], b: Sequence[float]) -> float:
    """Axis-aligned IoU over [x1, y1, x2, y2] floats (utility.cpp:401-424):
    areas clamp at 0 (inverted boxes contribute nothing) and the epsilon
    denominator returns 0.0 on crossing degenerate boxes instead of a
    ZeroDivisionError (reachable via hard_nms on saturated DFL boxes)."""
    if a[2] <= b[0] or a[0] >= b[2] or a[3] <= b[1] or a[1] >= b[3]:
        return 0.0
    ix = min(a[2], b[2]) - max(a[0], b[0])
    iy = min(a[3], b[3]) - max(a[1], b[1])
    inter = max(ix, 0.0) * max(iy, 0.0)
    area_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    area_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    return inter / (area_a + area_b - inter + 1e-8)
