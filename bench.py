"""Headline benchmark: SIGE sparse vs dense Stable Diffusion U-Net forward
latency at a ~1.2% edit (512x512 image, 64x64 latents, CFG batch 2) on one
TPU chip — the reference's own headline benchmark
(reference: stable-diffusion/README.md:97-110, dense 368.6 ms -> SIGE
95.0 ms on an RTX 3090).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N}

``vs_baseline`` is the achieved speedup divided by the 4.0x target from
BASELINE.json. Detail includes the DDPM church256 suite and MACs.
"""

import argparse
import json

import numpy as np


def _timeit(f, *args, iters=30, batches=3):
    """Min-of-batches average via a forced host sync (block_until_ready
    does NOT wait on remote-dispatch backends; see utils.timed_loop)."""
    from sige_tpu.utils import timed_loop

    return timed_loop(f, args, warmup=3, iters=iters, batches=batches)


def _edit_mask(R, pct=1.2, dilate=5):
    from sige_tpu.core.masks import dilate_mask

    mask = np.zeros((R, R), bool)
    side = int(round((pct / 100.0 * R * R) ** 0.5))
    r = R // 2 - side // 2
    mask[r : r + side, r : r + side] = True
    return dilate_mask(mask, dilate)


def bench_sd_unet(iters, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from sige_tpu.core.masks import downsample_mask
    from sige_tpu.models.sd import SDUNetConfig, SIGESDUNet
    from sige_tpu.nn import SIGEModel
    from sige_tpu.nn.module import SIGECtx

    dt = jnp.dtype(dtype)
    cfg = SDUNetConfig()
    model = SIGEModel(SIGESDUNet(cfg=cfg))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 4)).astype(np.float32))
    t = jnp.full((2,), 17.0, jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, 77, 768)).astype(np.float32))
    model.init(jax.random.key(0), x, t, c)
    model.full(x, t, c)
    mask = _edit_mask(512)
    model.set_masks(downsample_mask(mask, min_res=8))

    def cast(tree):
        return jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, tree)

    cb = c.astype(dt)
    fs = jax.jit(lambda v, x: model.module.apply(v, x, t, cb, ctx=SIGECtx(mode="sparse")))
    fd = jax.jit(lambda p, x: model.module.apply({"params": p}, x, t, cb, ctx=SIGECtx(mode="dense")))
    v = {"params": cast(model.params), "cache": cast(model.cache), "sige": model.plan}
    xb = x.astype(dt)
    sparse_ms = _timeit(fs, v, xb, iters=iters)
    dense_ms = _timeit(fd, cast(model.params), xb, iters=iters)

    def macs(mode):
        variables = {"params": model.params, "cache": model.cache,
                     "sige": model.plan}
        _, mut = jax.jit(lambda v, x: model.module.apply(
            v, x, t, c, ctx=SIGECtx(mode=mode),
            mutable=["profile", "cache", "meta"]))(variables, x)
        return float(sum(np.sum(np.asarray(l))
                         for l in jax.tree.leaves(mut["profile"])))

    return {
        "dense_ms": round(dense_ms, 2),
        "sparse_ms": round(sparse_ms, 2),
        "dense_gmacs": round(macs("dense") / 1e9, 1),
        "sparse_gmacs": round(macs("sparse") / 1e9, 1),
        "edit_ratio_pct": round(100 * float(_edit_mask(512, dilate=0).mean()), 2),
        "dtype": str(dtype),
    }


def bench_ddpm(iters):
    from sige_tpu.models.ddpm import DDPMUNetConfig
    from sige_tpu.nn.module import SIGECtx
    from sige_tpu.runners import DiffusionRunConfig, DiffusionRunner

    runner = DiffusionRunner(DDPMUNetConfig(), DiffusionRunConfig(), seed=0)
    rng = np.random.default_rng(0)
    original = rng.random((256, 256, 3)).astype(np.float32)
    edited = original.copy()
    side = int(round((0.012 * 256 * 256) ** 0.5))
    r = 128 - side // 2
    edited[r : r + side, r : r + side] = rng.random((side, side, 3))
    sparse = runner.profile(original, edited, warmup=5, iters=iters)
    dense = runner.profile(original, edited, warmup=5, iters=iters, mode="dense")
    return {
        "dense_ms": round(dense["latency_ms"], 2),
        "sparse_ms": round(sparse["latency_ms"], 2),
        "dense_gmacs": round(dense["macs_g"], 1),
        "sparse_gmacs": round(sparse["macs_g"], 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        help="bench dtype for BOTH modes (fair comparison)")
    parser.add_argument("--skip_ddpm", action="store_true")
    args = parser.parse_args()

    from sige_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    sd = bench_sd_unet(args.iters, args.dtype)
    detail = {"sd_unet_512": sd, "device": str(jax.devices()[0])}
    if not args.skip_ddpm:
        detail["ddpm_church256"] = bench_ddpm(args.iters)

    speedup = sd["dense_ms"] / sd["sparse_ms"]
    result = {
        "metric": "sd_unet512_sparse_fwd_speedup_at_1.2pct_edit",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 4.0, 3),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
