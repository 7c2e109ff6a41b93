"""Rec-forward scaling: on-chip ms vs batch size and width.

Decides whether fused batch-count tiers (running the recognizer on a
compacted power-of-two slice of the 32 crop slots) would pay: if the
forward is latency-bound by its ~100 small layers rather than FLOPs,
time is flat in batch and tiers buy nothing.

Usage: python scripts/profile_rec_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from ppocr_tpu.models.rec_svtr import rec_forward  # noqa: E402
from ppocr_tpu.pipeline import OCREngine, PipelineConfig  # noqa: E402
from ppocr_tpu.utils import enable_persistent_cache  # noqa: E402

N = int(os.environ.get("PROFILE_N", "33"))


def onchip_ms(body, img):
    def make(n):
        @jax.jit
        def looped(x):
            def it(i, acc):
                v = x + i.astype(x.dtype) * 1e-3
                out = body(v)
                return acc + out.astype(jnp.float32).sum()

            return lax.fori_loop(0, n, it, jnp.float32(0))

        return looped

    l1, ln = make(1), make(N)
    jax.device_get(l1(img))
    jax.device_get(ln(img))
    ts = []
    for i in range(2):
        v = img.copy()
        v[0, 0, 0, 0] = 0.01 * (i + 1)
        t0 = time.perf_counter()
        jax.device_get(ln(v))
        t1 = time.perf_counter()
        jax.device_get(l1(v))
        t2 = time.perf_counter()
        ts.append(((t1 - t0) - (t2 - t1)) / (N - 1) * 1e3)
    return min(ts)


def main():
    enable_persistent_cache()
    cfg = PipelineConfig.serving()
    engine = OCREngine("/root/reference/models", cfg)
    rp = engine.rec_params
    h = cfg.rec.img_h
    dt = engine.dtype
    print(f"device {jax.devices()[0]}, h={h}, dtype={dt.__name__}, N={N}")
    for w in (192, 384):
        for b in (4, 8, 16, 32):
            img = np.zeros((b, h, w, 3), np.float32).astype(dt)
            t = onchip_ms(lambda c: rec_forward(rp, c), img)
            print(f"rec_forward b={b:3d} w={w:3d}: {t:7.3f} ms")


if __name__ == "__main__":
    main()
