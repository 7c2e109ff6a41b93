"""Result visualization — the Utility::VisualizeBboxes analog
(utility.cpp:50-102): draw detected quads (and text/confidence) on the
source image and save it."""

from __future__ import annotations

from typing import Dict, Sequence

import cv2
import numpy as np


def visualize_boxes(
    image_bgr: np.ndarray,
    words: Sequence[Dict],
    output_path: str | None = None,
    color=(0, 0, 255),
    thickness: int = 2,
) -> np.ndarray:
    """Draw each word's quad; ``words`` is the response's words list
    ([{text, confidence, box: [[x,y]×4]}])."""
    canvas = image_bgr.copy()
    for word in words:
        pts = np.asarray(word["box"], np.int32).reshape(-1, 1, 2)
        cv2.polylines(canvas, [pts], isClosed=True, color=color, thickness=thickness)
    if output_path:
        cv2.imwrite(output_path, canvas)
    return canvas
