"""Sub-component profile of _blob_stats + candidate reformulations.

Splits the 0.74 ms blob-stats marginal into: area scatter, top_k over
H*W bins, membership-mask bbox reductions, f32-matvec psum — then times
matmul-centric / hierarchical-top-k alternatives on the chip with the
dependent-loop protocol (see profile_fused.onchip_ms).

Usage: python scripts/profile_blob_stats.py
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
from ppocr_tpu.pipeline.fused import _blob_stats, _connected_components  # noqa: E402
from ppocr_tpu.utils import enable_persistent_cache  # noqa: E402

from profile_fused import onchip_ms  # noqa: E402


def main():
    enable_persistent_cache()
    cfg = PipelineConfig.serving()
    engine = OCREngine("/root/reference/models", cfg)
    fused = engine.fused_ocr()
    K = fused.max_boxes
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
    print(f"canvas {bh}x{bw}, content {rh}x{rw}, K={K}, device {jax.devices()[0]}")

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

    def labels_of(u8):
        prob = p_det(u8)
        return jax.vmap(lambda p, c: _connected_components(fg_of(p, c)))(
            prob, content
        ), prob

    # ---- sub-component bodies (each includes det+cc; report marginals) ----

    def p_cc(u8):
        return labels_of(u8)[0]

    def p_area(u8):
        labels, _ = labels_of(u8)

        def g(lab):
            h, w = lab.shape
            n = h * w
            flat = lab.reshape(-1)
            area = jnp.zeros((n + 1,), jnp.float32).at[flat].add(1.0)
            return area.at[n].set(0.0)

        return jax.vmap(g)(labels)

    def p_topk(u8):
        labels, _ = labels_of(u8)

        def g(lab):
            h, w = lab.shape
            n = h * w
            flat = lab.reshape(-1)
            area = jnp.zeros((n + 1,), jnp.float32).at[flat].add(1.0)
            area = area.at[n].set(0.0)
            return lax.top_k(area[:n], K)

        return jax.vmap(g)(labels)

    def p_topk_hier(u8):
        # hierarchical top-K: top-K per row, then global top-K of the K*H
        # candidates. Exact: a blob in the global top-K has at most K-1
        # same-row roots with >= area, so it survives the row pass.
        labels, _ = labels_of(u8)

        def g(lab):
            h, w = lab.shape
            n = h * w
            flat = lab.reshape(-1)
            area = jnp.zeros((n + 1,), jnp.float32).at[flat].add(1.0)
            area = area.at[n].set(0.0)
            a2 = area[:n].reshape(h, w)
            rv, ri = lax.top_k(a2, K)  # [H, K]
            cand = rv.reshape(-1)
            cidx = (ri + (jnp.arange(h, dtype=jnp.int32) * w)[:, None]).reshape(-1)
            tv, ti = lax.top_k(cand, K)
            return tv, cidx[ti]

        return jax.vmap(g)(labels)

    def p_bbox(u8):
        labels, _ = labels_of(u8)

        def g(lab):
            h, w = lab.shape
            n = h * w
            flat = lab.reshape(-1)
            area = jnp.zeros((n + 1,), jnp.float32).at[flat].add(1.0)
            area = area.at[n].set(0.0)
            top_area, top_idx = lax.top_k(area[:n], K)
            member = lab[None] == top_idx[:, None, None].astype(jnp.int32)
            big = jnp.float32(1e9)
            rowp = jnp.any(member, axis=2)
            colp = jnp.any(member, axis=1)
            iy = jnp.arange(h, dtype=jnp.float32)[None, :]
            ix = jnp.arange(w, dtype=jnp.float32)[None, :]
            y0 = jnp.min(jnp.where(rowp, iy, big), axis=1)
            y1 = jnp.max(jnp.where(rowp, iy, -big), axis=1)
            x0 = jnp.min(jnp.where(colp, ix, big), axis=1)
            x1 = jnp.max(jnp.where(colp, ix, -big), axis=1)
            return top_area, x0, x1, y0, y1

        return jax.vmap(g)(labels)

    def p_full_cur(u8):
        labels, prob = labels_of(u8)
        return jax.vmap(lambda l, p: _blob_stats(l, p, K))(labels, prob)

    def p_full_matmul(u8):
        # candidate: bf16 one-hot; psum + bbox presence as MXU contractions
        labels, prob = labels_of(u8)

        def g(lab, p):
            h, w = lab.shape
            n = h * w
            flat = lab.reshape(-1)
            area = jnp.zeros((n + 1,), jnp.float32).at[flat].add(1.0)
            area = area.at[n].set(0.0)
            a2 = area[:n].reshape(h, w)
            rv, ri = lax.top_k(a2, K)
            cand = rv.reshape(-1)
            cidx = (ri + (jnp.arange(h, dtype=jnp.int32) * w)[:, None]).reshape(-1)
            top_area, ti = lax.top_k(cand, K)
            top_idx = cidx[ti]
            mb = (lab[None] == top_idx[:, None, None]).astype(jnp.bfloat16)
            ones_w = jnp.ones((w,), jnp.bfloat16)
            ones_h = jnp.ones((h,), jnp.bfloat16)
            rowc = jnp.einsum(
                "khw,w->kh", mb, ones_w, preferred_element_type=jnp.float32
            )
            colc = jnp.einsum(
                "khw,h->kw", mb, ones_h, preferred_element_type=jnp.float32
            )
            psum = jnp.einsum(
                "khw,hw->k",
                mb,
                p.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            big = jnp.float32(1e9)
            rowp = rowc > 0.5
            colp = colc > 0.5
            iy = jnp.arange(h, dtype=jnp.float32)[None, :]
            ix = jnp.arange(w, dtype=jnp.float32)[None, :]
            y0 = jnp.min(jnp.where(rowp, iy, big), axis=1)
            y1 = jnp.max(jnp.where(rowp, iy, -big), axis=1)
            x0 = jnp.min(jnp.where(colp, ix, big), axis=1)
            x1 = jnp.max(jnp.where(colp, ix, -big), axis=1)
            return top_area, psum, x0, x1, y0, y1

        return jax.vmap(g)(labels, prob)

    def p_full_scatter(u8):
        # candidate: everything per-bin via one fused scatter pass, no
        # [K,H,W] mask at all
        labels, prob = labels_of(u8)

        def g(lab, p):
            h, w = lab.shape
            n = h * w
            flat = lab.reshape(-1)
            xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), (h,))
            ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
            area = jnp.zeros((n + 1,), jnp.float32).at[flat].add(1.0)
            psum = jnp.zeros((n + 1,), jnp.float32).at[flat].add(p.reshape(-1))
            x0b = jnp.full((n + 1,), 1e9, jnp.float32).at[flat].min(xs)
            x1b = jnp.full((n + 1,), -1e9, jnp.float32).at[flat].max(xs)
            y0b = jnp.full((n + 1,), 1e9, jnp.float32).at[flat].min(ys)
            y1b = jnp.full((n + 1,), -1e9, jnp.float32).at[flat].max(ys)
            area = area.at[n].set(0.0)
            top_area, top_idx = lax.top_k(area[:n], K)
            return (
                top_area,
                psum[top_idx],
                x0b[top_idx],
                x1b[top_idx],
                y0b[top_idx],
                y1b[top_idx],
            )

        return jax.vmap(g)(labels, prob)

    t_cc = onchip_ms(p_cc, img)
    t_area = onchip_ms(p_area, img)
    t_topk = onchip_ms(p_topk, img)
    t_topkh = onchip_ms(p_topk_hier, img)
    t_bbox = onchip_ms(p_bbox, img)
    t_cur = onchip_ms(p_full_cur, img)
    t_mm = onchip_ms(p_full_matmul, img)
    t_sc = onchip_ms(p_full_scatter, img)

    print(f"det+cc baseline         : {t_cc:7.3f} ms")
    print(f"+ area scatter          : {t_area:7.3f}  (marginal {t_area - t_cc:+.3f})")
    print(f"+ top_k flat 262k       : {t_topk:7.3f}  (marginal {t_topk - t_area:+.3f})")
    print(f"+ top_k hierarchical    : {t_topkh:7.3f}  (marginal {t_topkh - t_area:+.3f})")
    print(f"+ bbox mask reductions  : {t_bbox:7.3f}  (marginal {t_bbox - t_topk:+.3f})")
    print(f"current _blob_stats     : {t_cur:7.3f}  (marginal {t_cur - t_cc:+.3f})")
    print(f"matmul+hier candidate   : {t_mm:7.3f}  (marginal {t_mm - t_cc:+.3f})")
    print(f"all-scatter candidate   : {t_sc:7.3f}  (marginal {t_sc - t_cc:+.3f})")

    # equivalence check (same top-K set; order may differ on area ties)
    cur = jax.device_get(jax.jit(p_full_cur)(jnp.asarray(img)))
    mm = jax.device_get(jax.jit(p_full_matmul)(jnp.asarray(img)))
    sc = jax.device_get(jax.jit(p_full_scatter)(jnp.asarray(img)))
    print("hier top_k area set == flat:", np.array_equal(np.sort(cur["area"]), np.sort(mm[0])))
    print(
        "matmul bbox == current:",
        all(
            np.allclose(np.sort(cur[k]), np.sort(v), atol=0.5)
            for k, v in zip(["x0", "x1", "y0", "y1"], mm[2:6])
        ),
    )
    print(
        "scatter bbox == current:",
        all(
            np.allclose(np.sort(cur[k]), np.sort(v))
            for k, v in zip(["x0", "x1", "y0", "y1"], sc[2:6])
        ),
    )
    print(
        "matmul psum vs current (bf16 rel err):",
        float(
            np.max(
                np.abs(np.sort(mm[1]) - np.sort(cur["score"] * cur["area"]))
                / np.maximum(np.sort(cur["score"] * cur["area"]), 1e-6)
            )
        ),
    )


if __name__ == "__main__":
    main()
