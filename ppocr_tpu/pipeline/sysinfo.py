"""Deployment sizing advice — the OCRWorker::getWorkerRecommendation analog
(ocr_worker.cpp:313-395), restated for the TPU serving model.

The reference sizes thread-pool workers against CPU cores because each
worker owns private model replicas. Here one engine owns the models on the
accelerator; "workers" are host-side request handlers whose job is to keep
the device queue full, so the recommendation keys on device count and
expected host pre/post cost instead.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class WorkerRecommendation:
    devices: int
    platform: str
    cpu_cores: int
    recommended_workers: int
    est_device_mem_mb: int
    notes: str

    def pretty(self) -> str:
        return (
            f"Platform: {self.platform} ({self.devices} device(s)), "
            f"{self.cpu_cores} host core(s)\n"
            f"Recommended workers: {self.recommended_workers}\n"
            f"Estimated device memory: ~{self.est_device_mem_mb} MB "
            f"(det+cls+rec weights are <15 MB; activations dominate)\n"
            f"{self.notes}"
        )


def worker_recommendation(enable_cls: bool = False) -> WorkerRecommendation:
    import jax

    devices = jax.devices()
    cpu = os.cpu_count() or 1
    # 2 host workers per device hides host pre/post (~2 ms) behind device
    # dispatch (~1 ms on-chip); more only helps if image decode dominates
    workers = max(2 * len(devices), 2)
    workers = min(workers, max(cpu, 2))
    est_mem = 64 + (16 if enable_cls else 0)
    return WorkerRecommendation(
        devices=len(devices),
        platform=devices[0].platform,
        cpu_cores=cpu,
        recommended_workers=workers,
        est_device_mem_mb=est_mem,
        notes=(
            "Unlike the reference (one model replica per worker thread, "
            "~150 MB RAM each), all workers share one device-resident "
            "model set; scale across chips with ppocr_tpu.parallel."
        ),
    )
