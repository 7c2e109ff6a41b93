"""Cross-chip pipeline staging: det/geometry on one chip, rec on another
(SURVEY §2.4 pipeline-parallel row — the reference runs det→cls→rec
sequentially on one thread, ocr_worker.cpp:233-289; here the two stages
live on different devices with a device-to-device crops handoff).

Stage 1 (chip A): det forward → connected components → blob boxes →
(optional in-graph cls) → rec-input crop sampling — ``prep`` from
``pipeline.fused.build_fused_parts``.
Stage 2 (chip B): recognizer forward + CTC top-k — ``rec``.

The handoff tensor is the bf16 [B·K, h, w, 3] normalized crop batch,
moved A→B with ``jax.device_put`` (ICI on real multi-chip hardware; the
prob map, 4× larger, never leaves chip A). JAX's async dispatch gives
request-level overlap for free: stage 1 of request n+1 executes on chip A
while stage 2 of request n still runs on chip B — the host only blocks on
final fetches.

Latency note: through a per-dispatch-taxed link (the dev tunnel) this is
2 dispatches vs the fused step's 1, so it is a *throughput* mode for real
multi-chip topologies, not a tunnel-latency win (docs/PERF.md).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np


class CrossChipFusedOCR:
    """Two-stage fused pipeline over an explicit (det_device, rec_device)
    pair, sharing an OCREngine's params/config/postprocessing."""

    def __init__(self, engine, det_device, rec_device, max_boxes: Optional[int] = None):
        from ..pipeline.fused import (
            FusedOCR,
            build_fused_parts,
            fused_part_kwargs,
        )

        cfg = engine.config
        self.engine = engine
        self.det_device = det_device
        self.rec_device = rec_device
        self.max_boxes = max_boxes or cfg.fused_max_boxes
        # shared config plumbing with the single-chip FusedOCR — ONE
        # source of build kwargs so the paths cannot drift (review r3:
        # the hand-copied version silently dropped use_dilation)
        kw = fused_part_kwargs(engine, self.max_boxes)
        self.rec_img_h = kw["rec_img_h"]
        self.rec_img_w = kw["rec_img_w"]
        self.with_cls = kw["cls_shape"] is not None
        self.decode = kw["decode"]
        self.beam_size = cfg.rec.beam_size
        self.rotated = kw["rotated"]
        self.crop_src_mult = kw["crop_src_mult"]
        prep, rec = build_fused_parts(
            # stages run single-device (committed inputs), so the pallas
            # paths are safe whenever the stage's platform is a TPU
            use_pallas=rec_device.platform in ("tpu", "axon"),
            blob_kernel=bool(
                getattr(cfg, "fused_blob_kernel", False)
                and det_device.platform in ("tpu", "axon")
                and not kw["rotated"]
            ),
            **kw,
        )
        self._prep = jax.jit(prep)
        self._rec = jax.jit(rec)
        # per-stage param replicas on their own chips
        self.det_params = jax.device_put(engine.det_params, det_device)
        self.cls_params = (
            jax.device_put(engine.cls_params, det_device)
            if self.with_cls
            else None
        )
        self.rec_params = jax.device_put(engine.rec_params, rec_device)
        # words_from_outputs is shared with the single-chip fused wrapper
        self._words = FusedOCR._words_from_outputs

    # -- core two-stage dispatch -------------------------------------------

    def _dispatch(
        self,
        canvas: np.ndarray,
        content_hw: np.ndarray,
        src: Optional[np.ndarray] = None,
    ):
        """Dispatch both stages for one padded [1,H,W,3] canvas (plus the
        m×-resolution crop source when ``fused_crop_src_mult > 1``);
        returns lazy (boxes, quads, valid, score, roots, idx, val, blank)
        device futures."""
        img = jax.device_put(canvas, self.det_device)
        chw = jax.device_put(content_hw, self.det_device)
        if self.crop_src_mult > 1:
            src_dev = jax.device_put(src, self.det_device)
            crops_n, boxes, quads, valid, score, roots, tier = self._prep(
                self.det_params, self.cls_params, img, chw, src_dev
            )
        else:
            crops_n, boxes, quads, valid, score, roots, tier = self._prep(
                self.det_params, self.cls_params, img, chw
            )
        crops_b = jax.device_put(crops_n, self.rec_device)  # ★ d2d handoff
        tier_b = jax.device_put(tier, self.rec_device)
        idx, val, blank = self._rec(self.rec_params, crops_b, tier_b)
        return boxes, quads, valid, score, roots, idx, val, blank

    def process_stream(
        self, images: Sequence[np.ndarray], request_ids: Sequence[int],
        worker_id: int = 0,
    ) -> List[Dict]:
        """Pipelined processing: all stage-1 dispatches are issued eagerly
        (async), so det(n+1) on chip A overlaps rec(n) on chip B; results
        are fetched in order at the end."""
        import time

        from ..ops import det_fit_cap, det_resize
        from ..pipeline.config import pick_bucket
        from ..pipeline.fused import FusedOutputs

        cfg = self.engine.config
        if len(images) != len(request_ids):
            # zip() below would silently drop dispatched work (the same
            # truncation class FusedOCR.process_batch guards against)
            raise ValueError(
                f"{len(images)} images for {len(request_ids)} request_ids"
            )
        pending = []
        for image in images:
            t_dispatch = time.perf_counter()
            resized, ratio_h, ratio_w = det_resize(
                image, cfg.det.limit_type, cfg.det.limit_side_len
            )
            resized, ratio_h, ratio_w = det_fit_cap(
                resized, ratio_h, ratio_w, cfg.det.shape_buckets[-1]
            )
            rh, rw = resized.shape[:2]
            bh = pick_bucket(cfg.det.shape_buckets, rh)
            bw = pick_bucket(cfg.det.shape_buckets, rw)
            canvas = np.zeros((1, bh, bw, 3), np.uint8)
            canvas[0, :rh, :rw] = resized
            src = None
            m = self.crop_src_mult
            if m > 1:
                import cv2

                src = np.zeros((1, bh * m, bw * m, 3), np.uint8)
                src[0, : rh * m, : rw * m] = cv2.resize(
                    image, (rw * m, rh * m), interpolation=cv2.INTER_LINEAR
                )
            futures = self._dispatch(
                canvas, np.array([[rh, rw]], np.int32), src
            )
            pending.append((futures, (ratio_h, ratio_w), image.shape, t_dispatch))

        results = []
        for rid, (futures, (ratio_h, ratio_w), shape, t_dispatch) in zip(
            request_ids, pending
        ):
            boxes, quads, valid, score, roots, idx, val, blank = (
                jax.device_get(futures)
            )
            t = idx.shape[1]
            out = FusedOutputs(
                boxes,
                valid,
                score,
                idx.reshape((1, self.max_boxes) + idx.shape[1:]),
                val.reshape((1, self.max_boxes) + val.shape[1:]),
                roots,
                blank.reshape(1, self.max_boxes, t)
                if blank is not None
                else None,
                quads,
            )
            words = self._words(
                self, out, 0, ratio_h, ratio_w, shape[1], shape[0]
            )
            results.append(
                {
                    "request_id": int(rid),
                    "width": int(shape[1]),
                    "height": int(shape[0]),
                    "success": True,
                    # per-request: this item's dispatch → its own fetch
                    # (the reference reports per-request worker time,
                    # ocr_worker.cpp:214 — not cumulative stream time)
                    "processing_time_ms": (time.perf_counter() - t_dispatch)
                    * 1e3,
                    "worker_id": worker_id,
                    "words": words,
                }
            )
        return results

    def process(
        self, image_bgr: np.ndarray, request_id: int = 0, worker_id: int = 0
    ) -> Dict:
        return self.process_stream(
            [image_bgr], [request_id], worker_id=worker_id
        )[0]

    def warmup(self):
        """Main-thread precompile of both stages for every det bucket."""
        buckets = self.engine.config.det.shape_buckets
        m = self.crop_src_mult
        for h in buckets:
            for w in buckets:
                jax.device_get(
                    self._dispatch(
                        np.zeros((1, h, w, 3), np.uint8),
                        np.array([[h, w]], np.int32),
                        np.zeros((1, h * m, w * m, 3), np.uint8)
                        if m > 1
                        else None,
                    )
                )
