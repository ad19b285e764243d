"""Utilities: platform setup, profiling, config."""

from .platform import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
