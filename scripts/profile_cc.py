"""CC variants microbenchmark: packed associative_scan (current) vs
Hillis-Steele doubling with contiguous pad-shifts, and convergence-check
cadence. Dependent-loop protocol (see profile_fused.onchip_ms).

Usage: python scripts/profile_cc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from ppocr_tpu.models.det_db import det_forward  # noqa: E402
from ppocr_tpu.ops import det_resize  # noqa: E402
from ppocr_tpu.ops.normalize import IMAGENET_MEAN, IMAGENET_SCALE  # noqa: E402
from ppocr_tpu.pipeline import OCREngine, PipelineConfig  # noqa: E402
from ppocr_tpu.pipeline.config import pick_bucket  # noqa: E402
from ppocr_tpu.pipeline.fused import _connected_components  # noqa: E402
from ppocr_tpu.utils import enable_persistent_cache  # noqa: E402

from profile_fused import onchip_ms  # noqa: E402

FLAG = jnp.int32(1 << 30)
VMASK = jnp.int32((1 << 30) - 1)


def cc_hillis(fg, max_iters=None):
    """Same algorithm as fused._connected_components but the segmented min
    scans are Hillis-Steele doubling over contiguous pad-shifts."""
    h, w = fg.shape
    if max_iters is None:
        max_iters = h + w + 8
    big = jnp.int32(h * w)
    init = jnp.where(
        fg, (jnp.arange(h * w, dtype=jnp.int32)).reshape(h, w), big
    )
    bg = ~fg
    flag_in = jnp.where(bg, FLAG, 0)
    IDENT = VMASK  # value >= any label, flag 0

    def comb(a, b):
        bv = b & VMASK
        v = jnp.where((b & FLAG) != 0, bv, jnp.minimum(a & VMASK, bv))
        return v | ((a | b) & FLAG)

    def scan_axis(p, axis, reverse):
        n_ax = p.shape[axis]
        d = 1
        while d < n_ax:
            if axis == 1:
                if not reverse:
                    sh = jnp.concatenate(
                        [jnp.full((h, d), IDENT, jnp.int32), p[:, : n_ax - d]],
                        axis=1,
                    )
                else:
                    sh = jnp.concatenate(
                        [p[:, d:], jnp.full((h, d), IDENT, jnp.int32)], axis=1
                    )
            else:
                if not reverse:
                    sh = jnp.concatenate(
                        [jnp.full((d, w), IDENT, jnp.int32), p[: n_ax - d, :]],
                        axis=0,
                    )
                else:
                    sh = jnp.concatenate(
                        [p[d:, :], jnp.full((d, w), IDENT, jnp.int32)], axis=0
                    )
            p = comb(sh, p)
            d *= 2
        return p

    def run_min(labels, axis):
        p = labels | flag_in
        fwd = scan_axis(p, axis, False) & VMASK
        bwd = scan_axis(p, axis, True) & VMASK
        return jnp.where(fg, jnp.minimum(fwd, bwd), big)

    def propagate(labels):
        neigh = lax.reduce_window(
            labels,
            big,
            lax.min,
            window_dimensions=(3, 3),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
        )
        labels = jnp.where(fg, jnp.minimum(labels, neigh), big)
        return run_min(run_min(labels, 1), 0)

    def cond(state):
        labels, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        labels, _, it = state
        new = propagate(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = lax.while_loop(
        cond, body, (run_min(run_min(init, 1), 0), jnp.bool_(True), 0)
    )
    return labels


def main():
    enable_persistent_cache()
    cfg = PipelineConfig.serving()
    engine = OCREngine("/root/reference/models", cfg)
    dp = engine.det_params
    dtype = engine.dtype
    det_thresh = cfg.det.thresh

    image = cv2.imread("/root/reference/images/card-jd.jpg")
    resized, _, _ = det_resize(image, cfg.det.limit_type, cfg.det.limit_side_len)
    rh, rw = resized.shape[:2]
    bh = pick_bucket(cfg.det.shape_buckets, rh)
    bw = pick_bucket(cfg.det.shape_buckets, rw)
    img = np.zeros((1, bh, bw, 3), np.uint8)
    img[0, :rh, :rw] = resized
    content = jnp.asarray(np.array([[rh, rw]], np.int32))
    print(f"canvas {bh}x{bw}, device {jax.devices()[0]}")

    def p_det(u8):
        x = (u8.astype(jnp.float32) / 255.0 - jnp.asarray(IMAGENET_MEAN)) * jnp.asarray(
            IMAGENET_SCALE
        )
        return det_forward(dp, x.astype(dtype)).astype(jnp.float32)

    def fg_of(prob, chw):
        h, w = prob.shape
        m = (jnp.arange(h, dtype=jnp.int32)[:, None] < chw[0]) & (
            jnp.arange(w, dtype=jnp.int32)[None, :] < chw[1]
        )
        return (
            (prob * 255.0).astype(jnp.uint8) > jnp.uint8(int(det_thresh * 255))
        ) & m

    def p_cc_cur(u8):
        prob = p_det(u8)
        return jax.vmap(lambda p, c: _connected_components(fg_of(p, c)))(
            prob, content
        )

    def p_cc_hillis(u8):
        prob = p_det(u8)
        return jax.vmap(lambda p, c: cc_hillis(fg_of(p, c)))(prob, content)

    t_det = onchip_ms(p_det, img)
    t_cur = onchip_ms(p_cc_cur, img)
    t_hil = onchip_ms(p_cc_hillis, img)
    print(f"det forward      : {t_det:7.3f} ms")
    print(f"cc assoc_scan    : {t_cur:7.3f}  (marginal {t_cur - t_det:+.3f})")
    print(f"cc hillis-steele : {t_hil:7.3f}  (marginal {t_hil - t_det:+.3f})")

    a = jax.device_get(jax.jit(p_cc_cur)(jnp.asarray(img)))
    b = jax.device_get(jax.jit(p_cc_hillis)(jnp.asarray(img)))
    print("labels equal:", np.array_equal(a, b))


if __name__ == "__main__":
    main()
