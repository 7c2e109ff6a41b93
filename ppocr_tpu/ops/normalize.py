"""Normalize + HWC→CHW pack, host (parity) and device (fused) versions.

The reference normalizes on the CPU per image ((x/255 − mean)·scale, channel
split; preprocess_op.cpp:40-55) then permutes into the input buffer. On TPU
we ship **uint8 HWC** to the device (4× less PCIe/ICI traffic than float32)
and fuse cast+normalize+transpose into the model's jit, where XLA folds it
into the first conv.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_SCALE = (1 / 0.229, 1 / 0.224, 1 / 0.225)
HALF_MEAN = (0.5, 0.5, 0.5)
HALF_SCALE = (2.0, 2.0, 2.0)  # 1/0.5


def normalize_chw_np(
    img: np.ndarray, mean: Sequence[float], scale: Sequence[float]
) -> np.ndarray:
    """Host reference implementation: uint8/float HWC → float32 CHW."""
    x = img.astype(np.float32) / 255.0
    x = (x - np.asarray(mean, np.float32)) * np.asarray(scale, np.float32)
    return np.ascontiguousarray(x.transpose(2, 0, 1))


def normalize_imagenet_np(img: np.ndarray) -> np.ndarray:
    return normalize_chw_np(img, IMAGENET_MEAN, IMAGENET_SCALE)


def normalize_nhwc_to_nchw(
    batch: jnp.ndarray, mean: Sequence[float], scale: Sequence[float]
) -> jnp.ndarray:
    """Device op: uint8 NHWC batch → normalized float32 NCHW.

    Call inside a jitted step so XLA fuses the cast/affine into the first
    conv's input read instead of materializing an intermediate in HBM.
    """
    x = batch.astype(jnp.float32) / 255.0
    mean_v = jnp.asarray(mean, jnp.float32)
    scale_v = jnp.asarray(scale, jnp.float32)
    x = (x - mean_v) * scale_v
    return jnp.transpose(x, (0, 3, 1, 2))


def normalize_nhwc_to_nchw_masked(
    batch: jnp.ndarray,
    widths: jnp.ndarray,
    mean: Sequence[float],
    scale: Sequence[float],
) -> jnp.ndarray:
    """Device op for the cls path: normalize, then zero columns beyond each
    image's true width.

    The reference classifier pads *after* normalization with constant 0
    (ocr_cls.cpp:52-56), i.e. pad value is 0 in normalized space — not a
    black pixel. ``widths`` is an int32 [N] array of true pixel widths.
    """
    x = normalize_nhwc_to_nchw(batch, mean, scale)
    col = jnp.arange(batch.shape[2], dtype=jnp.int32)  # W axis
    mask = col[None, :] < widths[:, None]  # [N, W]
    return x * mask[:, None, None, :].astype(x.dtype)


def pack_batch(images: Sequence[np.ndarray], width: int) -> np.ndarray:
    """Stack variable-width HWC uint8 crops into a zero-padded NHWC batch.

    Black (0) padding matches the recognizer exactly: rec pads with black
    pixels *before* normalization (preprocess_op.cpp:115-117), so uint8 zero
    columns normalize to the same −1 constant the reference feeds. The cls
    path must instead mask after normalization — use
    :func:`normalize_nhwc_to_nchw_masked`.
    """
    n = len(images)
    h = images[0].shape[0]
    c = images[0].shape[2] if images[0].ndim == 3 else 1
    out = np.zeros((n, h, width, c), dtype=np.uint8)
    for i, im in enumerate(images):
        out[i, :, : im.shape[1]] = im if im.ndim == 3 else im[..., None]
    return out
