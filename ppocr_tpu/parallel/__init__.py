"""Multi-chip scaling via jax.sharding (SURVEY.md §2.4).

The reference's only parallelism is thread-level replica parallelism on one
host. The TPU-native equivalents here:

  * data parallelism — batch-sharded jitted steps over a ``Mesh`` ("data"
    axis); XLA inserts the collectives, they ride ICI.
  * tensor parallelism — the 6,625-way CTC projection and logits shard
    over the "model" axis (the only weight matrix big enough to matter).
  * pipeline parallelism — det/geometry on one chip, rec on another with a
    device-to-device crops handoff (pipeline_stage.CrossChipFusedOCR).

Single-chip serving needs none of this; these utilities light up when the
engine is given a multi-device mesh (and are exercised on a virtual CPU
mesh in tests — SURVEY.md §4).
"""

from .mesh import (
    make_mesh,
    shard_batch,
    sharded_rec_infer,
)
from .pipeline_stage import CrossChipFusedOCR

__all__ = [
    "CrossChipFusedOCR",
    "make_mesh",
    "shard_batch",
    "sharded_rec_infer",
]
