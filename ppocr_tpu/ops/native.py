"""ctypes bindings for the native DB-postprocess core (native/dbpost.cpp).

The C++ library re-implements the host hot loop of DB detection from
scratch (border following, scanline polygon scoring, rotating-calipers
min-area rects, closed-form unclip) — the role OpenCV + vendored Clipper
play in the reference. The cv2-based path in ops.db_postprocess remains the
parity baseline; this one is used when the library has been built
(``make -C native``). Falls back silently when absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libdbpost.so"),
    os.path.join(os.path.dirname(__file__), "libdbpost.so"),
]

_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.dbpost_boxes_from_bitmap.restype = ctypes.c_int
            lib.dbpost_boxes_from_bitmap.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.dbpost_min_area_rect.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
            return _lib
    return None


def available() -> bool:
    return load_library() is not None


def boxes_from_bitmap_native(
    pred: np.ndarray,
    bitmap: np.ndarray,
    box_thresh: float,
    unclip_ratio: float,
    score_mode: str = "fast",
    max_candidates: int = 1000,
) -> Tuple[List[np.ndarray], List[float]]:
    """Native equivalent of ops.db_postprocess.boxes_from_bitmap.
    Returns (boxes in pred coords, scores)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("libdbpost.so not built (run: make -C native)")
    pred = np.ascontiguousarray(pred, np.float32)
    bmp = np.ascontiguousarray((bitmap > 0).astype(np.uint8))
    if bmp.shape != pred.shape:
        # the C core indexes the bitmap with pred's dims: a smaller bitmap
        # would be read out of bounds (the cv2 baseline supports differing
        # shapes; this backend deliberately does not)
        raise ValueError(
            f"bitmap shape {bmp.shape} != pred shape {pred.shape} "
            "(the native backend requires same-resolution maps)"
        )
    h, w = pred.shape
    max_boxes = max_candidates
    out_boxes = np.zeros((max_boxes, 4, 2), np.int32)
    out_scores = np.zeros((max_boxes,), np.float32)
    n = lib.dbpost_boxes_from_bitmap(
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bmp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w,
        h,
        ctypes.c_float(box_thresh),
        ctypes.c_float(unclip_ratio),
        1 if score_mode == "slow" else 0,
        max_candidates,
        out_boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_boxes,
    )
    # the C core already emits contours in cv2's bottom-up order (and
    # applies max_candidates to that order, so both backends keep the
    # same subset when the cap bites)
    return (
        [out_boxes[i].astype(np.int64) for i in range(n)],
        out_scores[:n].tolist(),
    )


def min_area_rect_native(points: np.ndarray):
    lib = load_library()
    if lib is None:
        raise RuntimeError("libdbpost.so not built")
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 2)
    out = np.zeros(5, np.float32)
    lib.dbpost_min_area_rect(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    (cx, cy, w, h, ang) = out
    return (float(cx), float(cy)), (float(w), float(h)), float(np.degrees(ang))
