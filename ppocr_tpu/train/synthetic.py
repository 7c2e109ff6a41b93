"""Synthetic text-line data for recognizer training/smoke-training.

Renders random character strings with cv2 at rec input geometry — enough
to validate the CTC training stack end-to-end (loss → working greedy
decode) without external datasets, and to produce demo weights for the
pipeline when the reference's rec weights are absent.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import cv2
import numpy as np


def render_line(
    text: str,
    img_h: int = 48,
    img_w: int = 320,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Render one line, black-on-white with slight jitter, HWC uint8."""
    rng = rng or np.random.default_rng(0)
    img = np.full((img_h, img_w, 3), 255, np.uint8)
    scale = img_h / 40.0
    x = int(rng.integers(2, 8))
    y = int(img_h - rng.integers(8, 14))
    cv2.putText(
        img,
        text,
        (x, y),
        cv2.FONT_HERSHEY_SIMPLEX,
        scale,
        (0, 0, 0),
        2,
        cv2.LINE_AA,
    )
    return img


class SyntheticRecDataset:
    """Batches of (normalized images, padded labels, label paddings)."""

    def __init__(
        self,
        charset: Sequence[str],
        alphabet: str = "0123456789",
        img_h: int = 48,
        img_w: int = 320,
        min_len: int = 1,
        max_len: int = 8,
        seed: int = 0,
    ):
        self.char_to_idx = {c: i for i, c in enumerate(charset)}
        missing = [c for c in alphabet if c not in self.char_to_idx]
        if missing:
            raise ValueError(f"alphabet chars not in charset: {missing}")
        self.alphabet = alphabet
        self.img_h = img_h
        self.img_w = img_w
        self.min_len = min_len
        self.max_len = max_len
        self.rng = np.random.default_rng(seed)

    def sample_text(self) -> str:
        n = int(self.rng.integers(self.min_len, self.max_len + 1))
        return "".join(self.rng.choice(list(self.alphabet), size=n))

    def batch(self, batch_size: int) -> Tuple[Dict[str, np.ndarray], List[str]]:
        texts = [self.sample_text() for _ in range(batch_size)]
        images = np.stack(
            [render_line(t, self.img_h, self.img_w, self.rng) for t in texts]
        )
        # normalize exactly like the serving path (mean 0.5, scale 2)
        x = (images.astype(np.float32) / 255.0 - 0.5) * 2.0
        labels = np.zeros((batch_size, self.max_len), np.int32)
        pad = np.ones((batch_size, self.max_len), np.float32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t):
                labels[i, j] = self.char_to_idx[ch]
                pad[i, j] = 0.0
        return {"images": x, "labels": labels, "label_paddings": pad}, texts
