"""Utilities: platform setup, profiling, config."""

from .platform import (bf16_conv_kernels, device_sync,
                       enable_compilation_cache, on_tpu, timed_loop)

__all__ = ["enable_compilation_cache", "device_sync", "timed_loop",
           "bf16_conv_kernels", "on_tpu"]
