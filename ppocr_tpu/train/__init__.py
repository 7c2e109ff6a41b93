"""Training support (beyond the reference, which is inference-only).

The recognizer is the retrainable component: a CTC-loss train step over a
("data", "model") mesh — data-parallel batches, tensor-parallel CTC
projection — built with optax. This is what ``__graft_entry__.
dryrun_multichip`` compiles over the virtual mesh, and the starting point
for fine-tuning rec on custom charsets/fonts.
"""

from .trainer import TrainState, ctc_train_loss, make_train_step

__all__ = ["TrainState", "ctc_train_loss", "make_train_step"]
