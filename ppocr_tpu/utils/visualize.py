"""Result visualization — the Utility::VisualizeBboxes analog
(utility.cpp:50-70): draw detected word quads on the source image and
save it (quads only, like the reference — no text/confidence labels)."""

from __future__ import annotations

from typing import Dict, Sequence

import cv2
import numpy as np


def visualize_boxes(
    image_bgr: np.ndarray,
    words: Sequence[Dict],
    output_path: str | None = None,
    color=(0, 255, 0),  # green, CV_RGB(0,255,0) like the reference
    thickness: int = 2,
) -> np.ndarray:
    """Draw each word's quad; ``words`` is the response's words list
    ([{text, confidence, box: [[x,y]×4]}]). Raises IOError when
    ``output_path`` cannot be written (cv2.imwrite fails silently)."""
    canvas = image_bgr.copy()
    for word in words:
        pts = np.asarray(word["box"], np.int32).reshape(-1, 1, 2)
        cv2.polylines(canvas, [pts], isClosed=True, color=color, thickness=thickness)
    if output_path:
        if not cv2.imwrite(output_path, canvas):
            raise IOError(f"cannot write visualization to {output_path}")
    return canvas
