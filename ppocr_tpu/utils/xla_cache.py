"""Persistent XLA compilation cache.

The TPU-native analog of the reference's TensorRT dynamic-shape cache files
(`./trt_{det,cls,rec}_shape.txt`, ocr_det.cpp:58-62): compiled executables
for every (model, shape-bucket) variant are cached on disk, so a service
restart skips the multi-second per-bucket compiles.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently point JAX at an on-disk compilation cache."""
    global _enabled
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "ppocr-tpu",
            "xla",
        )
    )
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return cache_dir
