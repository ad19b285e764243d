"""Headline benchmark: SIGE sparse vs dense Stable Diffusion U-Net forward
latency at a ~1.2% edit (512x512 image, 64x64 latents, CFG batch 2) on one
TPU chip — the reference's own headline benchmark
(reference: stable-diffusion/README.md:97-110, dense 368.6 ms -> SIGE
95.0 ms on an RTX 3090).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x", "vs_baseline": N}

``vs_baseline`` is the achieved speedup divided by the 4.0x target from
BASELINE.json. Detail includes the DDPM church256 suite and MACs.

Methodology: per-step device time measured inside a fused lax.scan
trajectory (utils.scan_timed) with forced host sync — the samplers
dispatch whole trajectories as one scan, so production pays per-step
device time; single-dispatch timing through this environment's remote
tunnel adds a ~0.7 ms host floor per call that generation never pays.
Both modes are measured identically.
"""

import argparse
import json

import numpy as np


def _timeit(f, v, x, iters=30):
    """Per-step device time inside a fused lax.scan trajectory — the
    samplers' execution model (one dispatch per trajectory, not per
    step), with forced host sync (block_until_ready does NOT wait on
    remote-dispatch backends). See utils.scan_timed."""
    from sige_tpu.utils import scan_timed

    return scan_timed(f, v, x, warmup=3, iters=max(iters // 8, 4))


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
    # window layout: the compact bench edit rides the window-resident
    # chains (resblocks, skips, resamples, masked stale-K/V transformers)
    model = SIGEModel(SIGESDUNet(cfg=cfg), layout="window")
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
    fs = lambda v, x: model.module.apply(v, x, t, cb, ctx=SIGECtx(mode="sparse"))
    fd = lambda p, x: model.module.apply({"params": p}, x, t, cb, ctx=SIGECtx(mode="dense"))
    v = {"params": cast(model.params), "cache": cast(model.cache), "sige": model.plan}
    xb = x.astype(dt)
    sparse_ms = _timeit(fs, v, xb, iters=iters)
    dense_ms = _timeit(fd, cast(model.params), xb, iters=iters)

    # peak HBM of the compiled single-step programs (XLA buffer
    # assignment: args + outputs + temps at high-water; the counter that
    # works through the remote tunnel — memory_stats() is None there)
    hbm = _hbm_pair(fd, fs, cast(model.params), v, xb)

    def macs(mode):
        from sige_tpu.utils import traced_macs

        variables = {"params": model.params, "cache": model.cache,
                     "sige": model.plan}
        return traced_macs(model.module, variables, x, t, c,
                           ctx=SIGECtx(mode=mode))

    return {
        "dense_ms": round(dense_ms, 2),
        "sparse_ms": round(sparse_ms, 2),
        "dense_gmacs": round(macs("dense") / 1e9, 1),
        "sparse_gmacs": round(macs("sparse") / 1e9, 1),
        "edit_ratio_pct": round(100 * float(_edit_mask(512, dilate=0).mean()), 2),
        "dtype": str(dtype),
        **hbm,
    }


def bench_vae_decoder(iters, dtype="bfloat16"):
    """SD VAE decoder @512, dilate-40 decode mask (the reference's decoder
    benchmark; reference: stable-diffusion/README.md:104-110)."""
    import jax
    import jax.numpy as jnp

    from sige_tpu.core.masks import dilate_mask, downsample_mask
    from sige_tpu.models.sd import SDVAEConfig, SIGEDecoder
    from sige_tpu.nn import SIGEModel
    from sige_tpu.nn.module import SIGECtx

    dt = jnp.dtype(dtype)
    dec = SIGEModel(SIGEDecoder(cfg=SDVAEConfig(resolution=512)),
                    layout="window")
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 64, 64, 4)).astype(np.float32))
    dec.init(jax.random.key(0), z)
    dec.full(z)
    mask = _edit_mask(512, dilate=0)
    dec.set_masks(downsample_mask(dilate_mask(mask, 40), min_res=(4, 4),
                                  dilation=0))
    cast = lambda tr: jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, tr)
    v = {"params": cast(dec.params), "cache": cast(dec.cache),
         "sige": dec.plan}
    zb = z.astype(dt)
    fs = lambda v, x: dec.module.apply(v, x, ctx=SIGECtx(mode="sparse"))
    fd = lambda p, x: dec.module.apply({"params": p}, x,
                                       ctx=SIGECtx(mode="dense"))
    out = {
        "dense_ms": round(_timeit(fd, cast(dec.params), zb, iters=iters), 2),
        "sparse_ms": round(_timeit(fs, v, zb, iters=iters), 2),
        "dense_gmacs": round(_model_macs(dec, z, "dense") / 1e9, 1),
        "sparse_gmacs": round(_model_macs(dec, z, "sparse") / 1e9, 1),
        "dtype": str(dtype),
    }
    out.update(_hbm_pair(fd, fs, cast(dec.params), v, zb))
    return out


def _hbm_pair(fd, fs, dense_args, sparse_vars, x):
    """hbm_{dense,sparse}_mb + the resident-arg split for a bench entry."""
    from sige_tpu.utils import compiled_hbm_breakdown, tree_mb

    hd = compiled_hbm_breakdown(fd, dense_args, x)
    hs = compiled_hbm_breakdown(fs, sparse_vars, x)
    out = {}
    if hd:
        out["hbm_dense_mb"] = hd["peak_mb"]
        out["hbm_dense"] = hd
    if hs:
        out["hbm_sparse_mb"] = hs["peak_mb"]
        hs["params_mb"] = tree_mb(sparse_vars["params"])
        hs["cache_mb"] = tree_mb(sparse_vars.get("cache", ()))
        hs["plan_mb"] = tree_mb(sparse_vars.get("sige", ()))
        out["hbm_sparse"] = hs
    return out


def _model_macs(model, x, mode):
    """Traced MACs of a SIGEModel-wrapped module with no extra args."""
    from sige_tpu.nn.module import SIGECtx
    from sige_tpu.utils import traced_macs

    variables = {"params": model.params, "cache": model.cache,
                 "sige": model.plan}
    return traced_macs(model.module, variables, x, ctx=SIGECtx(mode=mode))


def bench_vae_encoder(iters, dtype="bfloat16"):
    """SD VAE encoder @512 (reference reports UNet/encoder/decoder
    triplets; stable-diffusion/README.md:210-239)."""
    import jax
    import jax.numpy as jnp

    from sige_tpu.core.masks import dilate_mask, downsample_mask
    from sige_tpu.models.sd import SDVAEConfig, SIGEEncoder
    from sige_tpu.nn import SIGEModel
    from sige_tpu.nn.module import SIGECtx

    dt = jnp.dtype(dtype)
    enc = SIGEModel(SIGEEncoder(cfg=SDVAEConfig(resolution=512)),
                    layout="window")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 512, 512, 3)).astype(np.float32))
    enc.init(jax.random.key(0), img)
    enc.full(img)
    enc.set_masks(downsample_mask(_edit_mask(512), min_res=8))
    cast = lambda tr: jax.tree.map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, tr)
    v = {"params": cast(enc.params), "cache": cast(enc.cache),
         "sige": enc.plan}
    xb = img.astype(dt)
    fs = lambda v, x: enc.module.apply(v, x, ctx=SIGECtx(mode="sparse"))
    fd = lambda p, x: enc.module.apply({"params": p}, x,
                                       ctx=SIGECtx(mode="dense"))
    out = {
        "dense_ms": round(_timeit(fd, cast(enc.params), xb, iters=iters), 2),
        "sparse_ms": round(_timeit(fs, v, xb, iters=iters), 2),
        "dense_gmacs": round(_model_macs(enc, img, "dense") / 1e9, 1),
        "sparse_gmacs": round(_model_macs(enc, img, "sparse") / 1e9, 1),
        "dtype": str(dtype),
    }
    out.update(_hbm_pair(fd, fs, cast(enc.params), v, xb))
    return out


def bench_gaugan(iters):
    """GauGAN 512x256 fused SPADE at a ~1.4% semantic edit (fp32 — the
    reference's gaugan suite precision)."""
    from sige_tpu.models.gaugan import SPADEGenConfig
    from sige_tpu.runners import GauGANRunConfig, GauGANRunner

    runner = GauGANRunner(SPADEGenConfig())  # library defaults
    rng = np.random.default_rng(0)
    H, W = 256, 512
    l0 = rng.integers(0, 34, (H, W))
    l1 = l0.copy()
    side = int(round((0.012 * H * W) ** 0.5))
    l1[H // 3: H // 3 + side, W // 3: W // 3 + side] = 34
    s0 = runner.preprocess_input(l0, l0)
    s1 = runner.preprocess_input(l1, l1)
    sparse = runner.profile(s0, s1, warmup=5, iters=iters)
    dense = runner.profile(s0, s1, warmup=5, iters=iters, mode="dense")
    return {
        "dense_ms": round(dense["latency_ms"], 2),
        "sparse_ms": round(sparse["latency_ms"], 2),
        "dense_gmacs": round(dense["macs_g"], 1),
        "sparse_gmacs": round(sparse["macs_g"], 1),
        **({"hbm_dense_mb": dense["hbm"]["peak_mb"],
            "hbm_dense": dense["hbm"]} if dense.get("hbm") else {}),
        **({"hbm_sparse_mb": sparse["hbm"]["peak_mb"],
            "hbm_sparse": sparse["hbm"]} if sparse.get("hbm") else {}),
    }


def bench_gaugan_gc(iters):
    """GauGAN + GAN Compression (sub-mobile SPADE, the reference's shipped
    ``--config_str 32_32_32_48_32_24_24_32 --num_sparse_layers 4``) at the
    same ~1.2% semantic edit — the reference's biggest headline multiplier
    (47x MACs reduction; reference: README.md:12,37, gaugan/README.md:139-143)."""
    from sige_tpu.models.gaugan import (SIGESubMobileSPADEGenerator,
                                        SPADEGenConfig, decode_config)
    from sige_tpu.runners import GauGANRunner

    cfg = SPADEGenConfig(num_sparse_layers=4)
    channels = tuple(decode_config("32_32_32_48_32_24_24_32"))
    module = SIGESubMobileSPADEGenerator(cfg=cfg, channels=channels)
    runner = GauGANRunner(cfg, module=module)
    rng = np.random.default_rng(0)
    H, W = 256, 512
    l0 = rng.integers(0, 34, (H, W))
    l1 = l0.copy()
    side = int(round((0.012 * H * W) ** 0.5))
    l1[H // 3: H // 3 + side, W // 3: W // 3 + side] = 34
    s0 = runner.preprocess_input(l0, l0)
    s1 = runner.preprocess_input(l1, l1)
    sparse = runner.profile(s0, s1, warmup=5, iters=iters)
    dense = runner.profile(s0, s1, warmup=5, iters=iters, mode="dense")
    return {
        "dense_ms": round(dense["latency_ms"], 2),
        "sparse_ms": round(sparse["latency_ms"], 2),
        "dense_gmacs": round(dense["macs_g"], 1),
        "sparse_gmacs": round(sparse["macs_g"], 1),
        **({"hbm_dense_mb": dense["hbm"]["peak_mb"],
            "hbm_dense": dense["hbm"]} if dense.get("hbm") else {}),
        **({"hbm_sparse_mb": sparse["hbm"]["peak_mb"],
            "hbm_sparse": sparse["hbm"]} if sparse.get("hbm") else {}),
    }


def bench_pd(iters):
    """PD church256 at a ~1.2% edit (fp32)."""
    from sige_tpu.models.pd import PDUNetConfig
    from sige_tpu.runners import PDRunner

    runner = PDRunner(PDUNetConfig())  # library defaults
    rng = np.random.default_rng(0)
    original = rng.random((256, 256, 3)).astype(np.float32)
    edited = original.copy()
    side = int(round((0.012 * 256 * 256) ** 0.5))
    r = 128 - side // 2
    edited[r: r + side, r: r + side] = rng.random((side, side, 3))
    sparse = runner.profile(original, edited, warmup=5, iters=iters)
    dense = runner.profile(original, edited, warmup=5, iters=iters,
                           mode="dense")
    return {
        "dense_ms": round(dense["latency_ms"], 2),
        "sparse_ms": round(sparse["latency_ms"], 2),
        "dense_gmacs": round(dense["macs_g"], 1),
        "sparse_gmacs": round(sparse["macs_g"], 1),
        **({"hbm_dense_mb": dense["hbm"]["peak_mb"],
            "hbm_dense": dense["hbm"]} if dense.get("hbm") else {}),
        **({"hbm_sparse_mb": sparse["hbm"]["peak_mb"],
            "hbm_sparse": sparse["hbm"]} if sparse.get("hbm") else {}),
    }


def bench_ddpm(iters):
    from sige_tpu.models.ddpm import DDPMUNetConfig
    from sige_tpu.nn.module import SIGECtx
    from sige_tpu.runners import DiffusionRunConfig, DiffusionRunner

    runner = DiffusionRunner(DDPMUNetConfig(),  # library defaults
                             DiffusionRunConfig(), seed=0)
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
        **({"hbm_dense_mb": dense["hbm"]["peak_mb"],
            "hbm_dense": dense["hbm"]} if dense.get("hbm") else {}),
        **({"hbm_sparse_mb": sparse["hbm"]["peak_mb"],
            "hbm_sparse": sparse["hbm"]} if sparse.get("hbm") else {}),
    }


def bench_serving(iters, cfg=None, resolution=256, sessions=4):
    """Multi-user serving: S sessions with DIFFERENT edit masks served
    by ONE vmapped sparse step (parallel.SessionServer) on one chip —
    a regime the reference cannot express (one process per user).
    Reported as per-step latency for the whole session batch and
    aggregate sessions/sec."""
    import jax
    import jax.numpy as jnp

    from sige_tpu.core.masks import dilate_mask, downsample_mask
    from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
    from sige_tpu.nn import SIGEModel
    from sige_tpu.parallel import SessionServer, make_mesh
    from sige_tpu.utils import scan_timed

    R = resolution
    if cfg is None:
        cfg = DDPMUNetConfig()
    module = SIGEFusedUNet(cfg=cfg)
    model = SIGEModel(module)
    rng = np.random.default_rng(0)
    S = sessions
    x0 = rng.standard_normal((S, 1, R, R, 3)).astype(np.float32)
    x1 = x0.copy()
    tb = jnp.zeros((S, 1), jnp.float32)
    side = int(round((0.012 * R * R) ** 0.5))
    min_res = R // (2 ** (len(cfg.ch_mult) - 1))
    masks = []
    for i in range(S):  # a different edit per session
        m = np.zeros((R, R), bool)
        r, c = (R // 4 + i * R // 8) % (R - side), (R // 3 + i * R // 16) % (R - side)
        m[r: r + side, c: c + side] = True
        x1[i] += rng.standard_normal((1, R, R, 3)).astype(np.float32) \
            * m[None, :, :, None]
        masks.append(downsample_mask(dilate_mask(m, 5), min_res=min_res))
    model.init(jax.random.key(0), jnp.asarray(x0[0]), tb[0])

    server = SessionServer(module, model.params, mesh=make_mesh(1, tp=1))
    server.prime(jnp.asarray(x0), tb)
    for i in range(S):
        server.set_masks(i, masks[i])
    plan = server._stacked_plan()

    def f(v, x):
        return server._vsparse(v["p"], v["c"], v["pl"], x, (v["t"],))

    v = {"p": server.params, "c": server.cache, "pl": plan, "t": tb}
    ms = scan_timed(f, v, server._shard(jnp.asarray(x1)),
                    warmup=3, iters=max(iters // 8, 4))
    return {
        "sessions": S,
        "batch_step_ms": round(ms, 2),
        "session_steps_per_s": round(S / (ms / 1e3), 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        help="bench dtype for BOTH modes (fair comparison)")
    parser.add_argument("--families", type=str,
                        default="ddpm,decoder,encoder,gaugan,gc,pd,serving",
                        help="extra per-family details (comma list of "
                             "ddpm,decoder,encoder,gaugan,gc,pd,serving; "
                             "empty = SD UNet only)")
    args = parser.parse_args()

    from sige_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    def reclaim():
        # each family measures in isolation: dropping the previous
        # family's compiled programs and HBM-resident buffers avoids
        # cross-family interference (ddpm measured 2.4 ms standalone vs
        # 3.7 ms after the SD model's ~5GB stayed resident)
        import gc

        gc.collect()
        jax.clear_caches()
        gc.collect()

    sd = bench_sd_unet(args.iters, args.dtype)
    detail = {"sd_unet_512": sd, "device": str(jax.devices()[0])}
    fams = {f for f in args.families.split(",") if f}
    runners = [
        ("ddpm", "ddpm_church256", lambda: bench_ddpm(args.iters)),
        ("decoder", "sd_vae_decoder_512",
         lambda: bench_vae_decoder(args.iters, args.dtype)),
        ("encoder", "sd_vae_encoder_512",
         lambda: bench_vae_encoder(args.iters, args.dtype)),
        ("gaugan", "gaugan_512x256", lambda: bench_gaugan(args.iters)),
        ("gc", "gaugan_gc_512x256", lambda: bench_gaugan_gc(args.iters)),
        ("pd", "pd_church256", lambda: bench_pd(args.iters)),
        ("serving", "serving_4_sessions",
         lambda: bench_serving(args.iters)),
    ]
    for fam, key, fn in runners:
        if fam not in fams:
            continue
        reclaim()
        try:
            detail[key] = fn()
        except Exception as e:  # a detail family must never sink the headline
            import sys
            import traceback

            traceback.print_exc()
            print(f"[bench] family {fam} failed: {e}", file=sys.stderr)
            detail[key] = {"error": str(e)[:200]}

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
