"""Utilities: platform setup, profiling, config."""

from .platform import (bf16_conv_kernels, compiled_hbm_breakdown,
                       compiled_hbm_mb, device_sync,
                       enable_compilation_cache, on_tpu, scan_timed, tree_mb,
                       timed_loop, traced_macs)

__all__ = ["enable_compilation_cache", "device_sync", "timed_loop",
           "scan_timed", "bf16_conv_kernels", "on_tpu", "traced_macs",
           "compiled_hbm_mb", "compiled_hbm_breakdown", "tree_mb"]
