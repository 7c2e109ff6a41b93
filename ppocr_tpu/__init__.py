"""tpu-paddle-ocr: a TPU-native JAX OCR serving framework.

A ground-up rebuild of the capabilities of ``sssxyd/cpp-paddle-ocr`` (the
PP-OCR det→cls→rec pipeline behind a JSON IPC service) designed for TPU:
JAX/XLA executes the conv backbones on the MXU, preprocessing and decode are
fused into jitted functions with static width-bucketed shapes, and the
Windows named-pipe worker pool becomes a host dispatcher feeding a
device-resident pipeline. See SURVEY.md for the structural map of the
reference this framework rebuilds.
"""

__version__ = "0.1.0"
