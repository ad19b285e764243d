"""sige_tpu — a TPU-native Spatially Incremental Generative Engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lmxyy/sige
(Spatially Sparse Inference for generative image editing, NeurIPS 2022):
the user edits a small region of an image; we compute a difference mask,
reduce it to active tile indices per feature resolution, gather only the
activation tiles covering the edit, run dense convs on the tiny tile batch
(MXU-friendly), and scatter results back into cached activations of the
original image.

Architecture (TPU-first, not a port):
  * NHWC layout everywhere; channels ride the 128-lane axis.
  * Static shapes under jit: active indices live in fixed-capacity padded
    buffers (bucketed to bound recompilation).
  * Scatter is reformulated as a deterministic gather through a precomputed
    ownership map (owner = highest covering tile), replacing the reference's
    benign write races (reference: sige/cuda/scatter_kernel.cu).
  * State is explicit: full-mode caches and planning metadata thread through
    flax.linen mutable collections instead of hidden module attributes
    (reference: sige/nn/base.py).
  * Planning (mask -> indices/maps) happens host-side in numpy once per
    edit; the denoising hot loop is fully jitted.
"""

__version__ = "0.1.0"

from . import core, nn, ops

__all__ = ["core", "nn", "ops", "__version__"]
