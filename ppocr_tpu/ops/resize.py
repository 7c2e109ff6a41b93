"""Image resize ops with the reference's exact rounding semantics.

Host-side (cv2) because image decode/resize stay on the host in the TPU
design (SURVEY.md §2.3); shapes produced here are static per bucket so the
downstream jitted graphs never see dynamic dims.

Semantics mirror /root/reference/src/preprocess_op.cpp:57-137 (behavior, not
code): ResizeImgType0 → :func:`det_resize`, CrnnResizeImg →
:func:`crnn_resize`, ClsResizeImg → :func:`cls_resize`.
"""

from __future__ import annotations

import math
from typing import Tuple

import cv2
import numpy as np


def det_target_shape(
    h: int, w: int, limit_type: str = "max", limit_side_len: int = 960
) -> Tuple[int, int]:
    """Shape-only :func:`det_resize`: the (resize_h, resize_w) a source of
    (h, w) resolves to — used by the serving layer to predict which
    compiled variant a request will hit WITHOUT touching pixels
    (incremental warmup's compile-before-dispatch guard)."""
    ratio = 1.0
    if limit_type == "min":
        if min(h, w) < limit_side_len:
            ratio = limit_side_len / (h if h < w else w)
    else:
        if max(h, w) > limit_side_len:
            ratio = limit_side_len / (h if h > w else w)

    resize_h = int(h * ratio)
    resize_w = int(w * ratio)
    # round-to-nearest /32 with floor of 32 — the det graph downsamples
    # x32. C round semantics (half away from zero, preprocess_op.cpp's
    # round): Python's banker's round() would pick a DIFFERENT 32px
    # bucket at sides ≡ 16 (mod 64), e.g. 80 → 64 instead of the
    # reference's 96 (review r3)
    resize_h = max(int(resize_h / 32.0 + 0.5) * 32, 32)
    resize_w = max(int(resize_w / 32.0 + 0.5) * 32, 32)
    return resize_h, resize_w


def det_resize(
    img: np.ndarray, limit_type: str = "max", limit_side_len: int = 960
) -> Tuple[np.ndarray, float, float]:
    """Scale so the limiting side hits ``limit_side_len``, then snap each
    side to the nearest multiple of 32 (floor 32). Returns
    (resized, ratio_h, ratio_w) where ratios are resized/src.
    """
    h, w = img.shape[:2]
    resize_h, resize_w = det_target_shape(h, w, limit_type, limit_side_len)
    resized = cv2.resize(img, (resize_w, resize_h))
    return resized, resize_h / h, resize_w / w


def det_fit_cap(
    img: np.ndarray, ratio_h: float, ratio_w: float, cap: int
) -> Tuple[np.ndarray, float, float]:
    """Downscale a det-resized image so both sides fit within ``cap`` (the
    largest compiled det shape bucket), preserving /32 alignment.

    With ``limit_type='max'`` the serving bucket set covers
    ``limit_side_len`` so this only engages on truncated bucket sets
    (``--det-buckets 96`` dev/test configs). With ``limit_type='min'``
    the resize UPSCALES the long side without bound (a 100×5000 source
    at min-side 736 becomes ~36,800 px wide), so this cap engages in
    real serving too and costs small-text detail — prefer limit_type
    'max', or size the bucket set for the workload's aspect ratios. The
    fused paths have no exact-shape fallback (compile sets are closed by
    design), so an oversize image scales down to the cap instead of
    failing. Input/output ratios are resized/src (det_resize convention).
    """
    rh, rw = img.shape[:2]
    nh, nw = det_cap_shape(rh, rw, cap)
    if (nh, nw) == (rh, rw):
        return img, ratio_h, ratio_w
    out = cv2.resize(img, (nw, nh))
    return out, ratio_h * nh / rh, ratio_w * nw / rw


def det_cap_shape(rh: int, rw: int, cap: int) -> Tuple[int, int]:
    """Shape-only :func:`det_fit_cap` (see :func:`det_target_shape`)."""
    if rh <= cap and rw <= cap:
        return rh, rw
    scale = cap / max(rh, rw)
    nh = min(max(int(round(rh * scale / 32) * 32), 32), cap)
    nw = min(max(int(round(rw * scale / 32) * 32), 32), cap)
    return nh, nw


def crnn_resize(
    img: np.ndarray, max_wh_ratio: float, rec_image_shape=(3, 48, 320)
) -> np.ndarray:
    """Resize a text-line crop to rec height, cap width at
    ``img_h * max_wh_ratio``, right-pad with black to exactly that width."""
    _, img_h, img_w = rec_image_shape
    img_w = int(img_h * max_wh_ratio)
    h, w = img.shape[:2]
    ratio = w / h
    resize_w = img_w if math.ceil(img_h * ratio) > img_w else int(math.ceil(img_h * ratio))
    resized = cv2.resize(img, (resize_w, img_h), interpolation=cv2.INTER_LINEAR)
    if resize_w < img_w:
        resized = cv2.copyMakeBorder(
            resized, 0, 0, 0, img_w - resize_w, cv2.BORDER_CONSTANT, value=(0, 0, 0)
        )
    return resized


def table_resize(img: np.ndarray, max_len: int = 488) -> Tuple[np.ndarray, float]:
    """Long-side resize for table-structure inputs (TableResizeImg,
    preprocess_op.cpp:139-151). Returns (resized, ratio)."""
    h, w = img.shape[:2]
    ratio = max_len / (w if w >= h else h)
    return cv2.resize(img, (int(w * ratio), int(h * ratio))), ratio


def table_pad(img: np.ndarray, max_len: int = 488) -> np.ndarray:
    """Bottom/right zero-pad to a square max_len canvas (TablePadImg,
    preprocess_op.cpp:153-159)."""
    h, w = img.shape[:2]
    return cv2.copyMakeBorder(
        img, 0, max_len - h, 0, max_len - w, cv2.BORDER_CONSTANT, value=(0, 0, 0)
    )


def resize_hw(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Plain resize (Resize op, preprocess_op.cpp:161-164)."""
    return cv2.resize(img, (w, h))


def cls_resize(img: np.ndarray, cls_image_shape=(3, 48, 192)) -> np.ndarray:
    """Resize keeping aspect to cls height; the caller right-pads the batch
    buffer with zeros (the reference pads implicitly via a zeroed input
    tensor)."""
    _, img_h, img_w = cls_image_shape
    h, w = img.shape[:2]
    ratio = w / h
    resize_w = img_w if math.ceil(img_h * ratio) > img_w else int(math.ceil(img_h * ratio))
    return cv2.resize(img, (resize_w, img_h), interpolation=cv2.INTER_LINEAR)
