"""On-chip component breakdown of the fused OCR step (VERDICT r1 #2).

Measurement protocol (the only one the axon tunnel can't distort): run the
component under test N times as a *dependent in-graph loop* inside one
dispatch, sync with device_get, and subtract a 1-iteration dispatch of the
same shape. The tunnel's speculator replays identical (exe, args) pairs and
block_until_ready can complete early, so every timed call uses novel args
and device_get.

Usage: python scripts/profile_fused.py [--trace /tmp/fused-trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from ppocr_tpu.models.det_db import det_forward  # noqa: E402
from ppocr_tpu.models.rec_svtr import rec_forward  # noqa: E402
from ppocr_tpu.ops import det_resize  # noqa: E402
from ppocr_tpu.ops.normalize import (  # noqa: E402
    IMAGENET_MEAN,
    IMAGENET_SCALE,
)
from ppocr_tpu.pipeline import OCREngine, PipelineConfig  # noqa: E402
from ppocr_tpu.pipeline.config import pick_bucket  # noqa: E402
from ppocr_tpu.pipeline.fused import (  # noqa: E402
    _blob_stats,
    _connected_components,
    build_fused_parts,
    fused_part_kwargs,
)
from ppocr_tpu.utils import enable_persistent_cache  # noqa: E402

N = int(os.environ.get("PROFILE_N", "33"))


def onchip_ms(body, img, reps=2):
    """True on-chip ms/iter of body(img_u8_variant) via an N-vs-1 in-graph
    dependent loop (novel args each call, device_get sync)."""

    def make(n):
        @jax.jit
        def looped(x):
            def it(i, acc):
                v = (x + i.astype(jnp.uint8)).astype(jnp.uint8)
                out = body(v)
                leaves = [l.astype(jnp.float32).sum() for l in jax.tree_util.tree_leaves(out)]
                return acc + sum(leaves)

            return lax.fori_loop(0, n, it, jnp.float32(0))

        return looped

    l1, ln = make(1), make(N)
    jax.device_get(l1(img))  # compile
    jax.device_get(ln(img))

    def best(loop, salt):
        ts = []
        for i in range(reps):
            v = img.copy()
            v[0, 9, 9, 1] = salt + i
            t0 = time.perf_counter()
            jax.device_get(loop(v))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    d1 = best(l1, 41)
    dn = best(ln, 171)
    return (dn - d1) / (N - 1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument(
        "--batch-tiers",
        type=int,
        default=None,
        help="override cfg.fused_batch_tiers (A/B the batch-count tiers)",
    )
    args = ap.parse_args()

    enable_persistent_cache()
    cfg = PipelineConfig.serving()
    if args.batch_tiers is not None:
        cfg.fused_batch_tiers = args.batch_tiers
    engine = OCREngine("/root/reference/models", cfg)
    fused = engine.fused_ocr()

    image = cv2.imread("/root/reference/images/card-jd.jpg")
    resized, _, _ = det_resize(image, cfg.det.limit_type, cfg.det.limit_side_len)
    rh, rw = resized.shape[:2]
    bh = pick_bucket(cfg.det.shape_buckets, rh)
    bw = pick_bucket(cfg.det.shape_buckets, rw)
    img = np.zeros((1, bh, bw, 3), np.uint8)
    img[0, :rh, :rw] = resized
    content = jnp.asarray(np.array([[rh, rw]], np.int32))
    print(f"canvas {bh}x{bw}, content {rh}x{rw}, device {jax.devices()[0]}, N={N}")

    dtype = engine.dtype
    det_thresh = cfg.det.thresh
    K = fused.max_boxes
    dp, rp = engine.det_params, engine.rec_params
    step = fused._step

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

    def p_cc(u8):
        prob = p_det(u8)
        return jax.vmap(lambda p, c: _connected_components(fg_of(p, c)))(
            prob, content
        )

    def p_stats(u8):
        prob = p_det(u8)

        def g(p, c):
            labels = _connected_components(fg_of(p, c))
            return _blob_stats(labels, p, K)

        return jax.vmap(g)(prob, content)

    def p_stats_pallas(u8):
        prob = p_det(u8)

        def g(p, c):
            labels = _connected_components(fg_of(p, c))
            return _blob_stats(labels, p, K, use_pallas=True)

        return jax.vmap(g)(prob, content)

    part_kw = fused_part_kwargs(engine, K)
    prep_fn, _rec_fn = build_fused_parts(
        use_pallas=engine._pallas_ok(), **part_kw
    )

    def p_prep(u8):
        # det + geometry + crop sampling + normalize (no rec): isolates the
        # interpolation-matmul crop cost from the recognizer forward
        return prep_fn(dp, None, u8, content)

    def p_rec_nodecode(u8):
        # prep + rec forward at the base width (the tier the card takes),
        # WITHOUT the CTC top-k: marginal vs p_prep is the recognizer
        # forward; p_full minus this is decode + tier-switch overhead
        crops_n = prep_fn(dp, None, u8, content)[0]
        return rec_forward(rp, crops_n[:, :, : cfg.rec.img_w])

    def p_full(u8):
        return step.__wrapped__(dp, rp, None, u8, content)

    t_det = onchip_ms(p_det, img)
    t_cc = onchip_ms(p_cc, img)
    t_stats = onchip_ms(p_stats, img)
    t_stats_k = onchip_ms(p_stats_pallas, img)
    t_prep = onchip_ms(p_prep, img)
    t_recf = onchip_ms(p_rec_nodecode, img)
    t_full = onchip_ms(p_full, img)

    print(f"det forward            : {t_det:7.3f} ms")
    print(f"+ connected components : {t_cc:7.3f} ms  (marginal {t_cc - t_det:+.3f})")
    print(f"+ blob stats           : {t_stats:7.3f} ms  (marginal {t_stats - t_cc:+.3f})")
    print(
        f"+ blob stats [pallas]  : {t_stats_k:7.3f} ms  "
        f"(marginal {t_stats_k - t_cc:+.3f}; vs XLA {t_stats_k - t_stats:+.3f})"
    )
    print(f"+ crop sampling        : {t_prep:7.3f} ms  (marginal {t_prep - t_stats:+.3f})")
    print(
        f"+ rec fwd (w={cfg.rec.img_w})     : {t_recf:7.3f} ms  "
        f"(marginal {t_recf - t_prep:+.3f})"
    )
    print(
        f"full fused step        : {t_full:7.3f} ms  "
        f"(ctc+switch {t_full - t_recf:+.3f})"
    )

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = step(dp, rp, None, img, np.asarray(content))
            jax.device_get(out)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
