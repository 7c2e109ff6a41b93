"""Paddle inference-artifact compatibility layer (pure Python + JAX).

Replaces the reference's vendored Paddle Inference runtime (SURVEY.md L1,
/root/reference/include/paddle_inference/) with:

  * :mod:`.program` — hand-rolled decoder for ``inference.pdmodel``
    (ProgramDesc protobuf, no protoc / no paddle dependency),
  * :mod:`.params` — reader for combined ``inference.pdiparams`` files,
  * :mod:`.executor` — compiles the op graph into a pure JAX function that
    XLA jits onto the TPU MXU.
"""

from .executor import build_forward, init_random_params
from .params import load_params, read_combined_params
from .program import ProgramDesc, load_program, parse_program

__all__ = [
    "ProgramDesc",
    "build_forward",
    "init_random_params",
    "load_params",
    "load_program",
    "parse_program",
    "read_combined_params",
]
