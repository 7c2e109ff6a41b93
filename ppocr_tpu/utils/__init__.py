"""Shared runtime utilities."""

from .xla_cache import enable_persistent_cache

__all__ = ["enable_persistent_cache"]
