"""Persistent XLA compilation cache.

The TPU-native analog of the reference's TensorRT dynamic-shape cache files
(`./trt_{det,cls,rec}_shape.txt`, ocr_det.cpp:58-62): compiled executables
for every (model, shape-bucket) variant are cached on disk, so a service
restart skips the multi-second per-bucket compiles.
"""

from __future__ import annotations

import os

_active_dir: str | None = None


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently point JAX at an on-disk compilation cache. Returns
    the ACTIVE cache dir — a second call with a different explicit path
    warns and keeps the first (JAX's cache dir is process-global; the
    old code silently returned the ignored new path as if active)."""
    global _active_dir
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
    if _active_dir is None:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _active_dir = cache_dir
    elif path is not None and path != _active_dir:
        import warnings

        warnings.warn(
            f"persistent XLA cache already active at {_active_dir}; "
            f"ignoring new path {path}",
            stacklevel=2,
        )
    return _active_dir
