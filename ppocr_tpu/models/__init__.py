"""Hand-written NHWC JAX implementations of the PP-OCR networks.

Three models (SURVEY.md §2.2), each a pure function over a nested param
pytree, plus converters from Paddle inference weights:

  * :mod:`.det_db`   — PP-LCNet + RSE-FPN + DB head text detector
  * :mod:`.cls_mv3`  — MobileNetV3-small ×0.35 orientation classifier
  * :mod:`.rec_svtr` — PP-LCNetV3 + SVTR + CTC recognizer

Numerics are validated against the paddle_compat graph executor (NCHW
parity path) in tests/test_models.py.
"""

from .cls_mv3 import CLS_BLOCKS, cls_forward, init_cls_params
from .convert import convert_cls_params, convert_det_params, convert_rec_params
from .det_db import DET_BLOCKS, det_forward, init_det_params
from .layers import cast_tree
from .rec_svtr import REC_BLOCKS, REC_NUM_CLASSES, init_rec_params, rec_forward

__all__ = [
    "CLS_BLOCKS",
    "DET_BLOCKS",
    "REC_BLOCKS",
    "REC_NUM_CLASSES",
    "cast_tree",
    "cls_forward",
    "convert_cls_params",
    "convert_det_params",
    "convert_rec_params",
    "det_forward",
    "init_cls_params",
    "init_det_params",
    "init_rec_params",
    "rec_forward",
]
