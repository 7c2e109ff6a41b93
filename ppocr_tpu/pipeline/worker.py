"""Pipeline orchestration: the det → crop → cls → rec request processor.

Behavioral mirror of OCRWorker::processRequest + its JSON serialization
(ocr_worker.cpp:150-311), producing the exact response schema:

    {"request_id", "width", "height", "success", "processing_time_ms",
     "worker_id", "words": [{"text", "confidence", "box": [[x,y]×4]}]}
    / {"request_id", "success": false, "error", "worker_id", ...}

Preserved quirks (SURVEY.md §2.1):
  * crops are axis-aligned cv::boundingRect rects, not perspective warps;
  * cls rotates on label==1 alone, ignoring cls_thresh and score;
  * empty detection → success with an empty words list.

Deviation (documented): when a degenerate crop is dropped, the reference
misaligns texts and boxes (text_images index vs det_boxes index,
ocr_worker.cpp:255-301); here box/text pairs stay attached.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import cv2
import numpy as np

from ..ops import bounding_crop, get_rotate_crop_image
from .engine import OCREngine


class OCRWorker:
    """A logical worker bound to an engine (device-resident models).

    Unlike the reference — where each of the N workers owns a private trio
    of predictors (N× memory) — workers share one engine; the engine's
    batched device steps provide the parallelism.
    """

    def __init__(self, engine: OCREngine, worker_id: int = 0):
        self.engine = engine
        self.worker_id = worker_id
        # fused step is engine-owned so all workers share one compiled set
        if engine.config.fast_path:
            self._fused = (
                engine.cross_chip_ocr()
                if getattr(engine.config, "cross_chip", False)
                else engine.fused_ocr()
            )
        else:
            self._fused = None

    def process(
        self, image_bgr: Optional[np.ndarray], request_id: int
    ) -> Dict:
        # ONE response skeleton for every branch (fused/staged × empty/
        # error) — the schema lives here and nowhere else
        base = {
            "request_id": int(request_id),
            "width": 0,
            "height": 0,
            "success": False,
            "processing_time_ms": 0.0,
            "worker_id": self.worker_id,
        }
        if image_bgr is None or image_bgr.size == 0:
            return {**base, "error": "Empty image data provided"}
        base["width"] = int(image_bgr.shape[1])
        base["height"] = int(image_bgr.shape[0])
        start = time.perf_counter()
        if self._fused is not None:
            try:
                return self._fused.process(
                    image_bgr, request_id, worker_id=self.worker_id
                )
            except Exception as e:
                # error dict (not a raise) so the dispatcher's device-loss
                # check sees it and can reload+retry — previously only the
                # staged branch converted exceptions (ADVICE r2 medium)
                return {
                    **base,
                    "processing_time_ms": (time.perf_counter() - start) * 1e3,
                    "error": str(e),
                }
        try:

            boxes, det_times = self.engine.detect(image_bgr)
            stage_times = {"det_ms": det_times.as_list()}
            if not boxes:
                base["processing_time_ms"] = (time.perf_counter() - start) * 1e3
                return {**base, "success": True, "words": [], "stage_times": stage_times}

            crops: List[np.ndarray] = []
            kept_boxes: List[np.ndarray] = []
            for box in boxes:
                crop = (
                    get_rotate_crop_image(image_bgr, box)
                    if self.engine.config.crop_mode == "perspective"
                    else bounding_crop(image_bgr, box)
                )
                if crop.shape[0] > 0 and crop.shape[1] > 0:
                    crops.append(crop)
                    kept_boxes.append(box)
            if not crops:
                base["processing_time_ms"] = (time.perf_counter() - start) * 1e3
                return {**base, "success": True, "words": [], "stage_times": stage_times}

            if self.engine.config.enable_cls and self.engine.cls_params is not None:
                labels, scores, cls_times = self.engine.classify(crops)
                stage_times["cls_ms"] = cls_times.as_list()
                for i, label in enumerate(labels):
                    # quirk preserved: rotate purely on label==1, the
                    # configured cls_thresh is never consulted
                    if label == 1:
                        crops[i] = cv2.rotate(crops[i], cv2.ROTATE_180)

            texts, confs, rec_times = self.engine.recognize(crops)
            stage_times["rec_ms"] = rec_times.as_list()

            words = [
                {
                    "text": texts[i],
                    "confidence": float(confs[i]),
                    "box": [[int(x), int(y)] for x, y in kept_boxes[i]],
                }
                for i in range(len(crops))
            ]
            base["processing_time_ms"] = (time.perf_counter() - start) * 1e3
            return {**base, "success": True, "words": words, "stage_times": stage_times}
        except Exception as e:  # error path: ocr_worker.cpp:192-206
            base["processing_time_ms"] = (time.perf_counter() - start) * 1e3
            return {**base, "error": str(e)}
