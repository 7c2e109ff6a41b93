"""Training support (beyond the reference, which is inference-only).

Two trainable components close the accuracy loop end to end:
  * the recognizer — CTC loss over a ("data", "model") mesh (data-parallel
    batches, tensor-parallel CTC projection);
  * the detector — balanced BCE on the DB shrink mask, data-parallel.
This is what ``__graft_entry__.dryrun_multichip`` compiles over the virtual
mesh, and the starting point for fine-tuning on custom charsets/fonts.
"""

from .trainer import (
    TrainState,
    ctc_train_loss,
    det_train_loss,
    make_det_train_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "ctc_train_loss",
    "det_train_loss",
    "make_det_train_step",
    "make_train_step",
]
