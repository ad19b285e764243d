"""Headline benchmark: SIGE sparse vs dense DDPM church256 U-Net forward
latency at a ~1.2% edit on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N}

``vs_baseline`` is the achieved speedup divided by the 4.0x target from
BASELINE.json (>= 1.0 means target met). The reference's own profile
harness times the sparse forward alone with device sync per iteration
(reference: diffusion/runner.py:214-246); we do the same for both modes.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--edit_pct", type=float, default=1.2)
    parser.add_argument("--warmup", type=int, default=10)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--resolution", type=int, default=256)
    args = parser.parse_args()

    from sige_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from sige_tpu.models.ddpm import DDPMUNetConfig
    from sige_tpu.nn.module import SIGECtx
    from sige_tpu.runners import DiffusionRunConfig, DiffusionRunner

    model_cfg = DDPMUNetConfig(resolution=args.resolution)
    run_cfg = DiffusionRunConfig()
    runner = DiffusionRunner(model_cfg, run_cfg, seed=0)

    R = args.resolution
    rng = np.random.default_rng(0)
    original = rng.random((R, R, 3)).astype(np.float32)
    edited = original.copy()
    side = int(round((args.edit_pct / 100.0 * R * R) ** 0.5))
    r0, c0 = R // 2 - side // 2, R // 2 - side // 2
    edited[r0 : r0 + side, c0 : c0 + side] = rng.random((side, side, 3))

    sparse = runner.profile(original, edited, warmup=args.warmup, iters=args.iters)
    dense = runner.profile(
        original, edited, warmup=args.warmup, iters=args.iters, mode="dense")

    speedup = dense["latency_ms"] / sparse["latency_ms"]
    result = {
        "metric": "ddpm_church256_sparse_fwd_speedup_at_1.2pct_edit",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 4.0, 3),
        "detail": {
            "dense_ms": round(dense["latency_ms"], 3),
            "sparse_ms": round(sparse["latency_ms"], 3),
            "dense_gmacs": round(dense["macs_g"], 1),
            "sparse_gmacs": round(sparse["macs_g"], 1),
            "macs_reduction": round(dense["macs_g"] / max(sparse["macs_g"], 1e-9), 2),
            "edit_ratio_pct": round(100 * sparse["edit_ratio"], 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
