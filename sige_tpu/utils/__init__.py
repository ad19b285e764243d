"""Utilities: platform setup, profiling, config."""

from .platform import device_sync, enable_compilation_cache, timed_loop

__all__ = ["enable_compilation_cache", "device_sync", "timed_loop"]
