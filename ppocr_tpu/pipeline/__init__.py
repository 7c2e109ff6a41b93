"""The det → crop → cls → rec pipeline (SURVEY.md §7 step 3)."""

from .charset import load_charset
from .config import ClsConfig, DetConfig, PipelineConfig, RecConfig
from .engine import OCREngine, StageTimes
from .sysinfo import WorkerRecommendation, worker_recommendation
from .worker import OCRWorker

__all__ = [
    "ClsConfig",
    "DetConfig",
    "OCREngine",
    "OCRWorker",
    "PipelineConfig",
    "RecConfig",
    "StageTimes",
    "WorkerRecommendation",
    "load_charset",
    "worker_recommendation",
]
