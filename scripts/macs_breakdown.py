"""Per-module MACs breakdown for any bench family (VERDICT r4 item 2).

Runs one apply with the "profile" collection mutable and prints the
per-module-path analytic MACs for dense AND sparse mode side by side —
the tool the reference gets from torchprofile's traced table
(reference: diffusion/runner.py --mode profile), here exact at trace
time (sige_tpu.nn.module.sow_macs).

Usage:
    python scripts/macs_breakdown.py --family pd [--top 40]
"""

from __future__ import annotations

import argparse

import numpy as np


def _collect(module, variables, args, ctx):
    import jax

    def f(v, a):
        return module.apply(v, *a, ctx=ctx,
                            mutable=["profile", "cache", "meta"])

    _, mut = jax.jit(f)(variables, args)
    rows = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            rows[path] = rows.get(path, 0.0) + float(np.sum(np.asarray(node)))

    walk(mut["profile"], ())
    return rows


def _family(name):
    """Returns (module, variables, args) with a planned ~1.2% edit."""
    import jax
    import jax.numpy as jnp

    from sige_tpu.core.masks import dilate_mask, downsample_mask
    from sige_tpu.nn import SIGEModel

    rng = np.random.default_rng(0)

    def edit_mask(R, pct=1.2, dilate=5):
        mask = np.zeros((R, R), bool)
        side = int(round((pct / 100.0 * R * R) ** 0.5))
        r = R // 2 - side // 2
        mask[r:r + side, r:r + side] = True
        return dilate_mask(mask, dilate) if dilate else mask

    if name in ("pd", "ddpm"):
        if name == "pd":
            from sige_tpu.models.pd import PDUNetConfig, SIGEPDUNet

            cfg = PDUNetConfig()
            module = SIGEPDUNet(cfg=cfg)
        else:
            from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet

            cfg = DDPMUNetConfig()
            module = SIGEFusedUNet(cfg=cfg)
        model = SIGEModel(module, layout="window")
        R = cfg.resolution
        x = jnp.asarray(rng.standard_normal((1, R, R, 3)).astype(np.float32))
        t = jnp.zeros((1,), jnp.float32)
        model.init(jax.random.key(0), x, t)
        model.full(x, t)
        min_res = R // (2 ** (len(cfg.ch_mult) - 1))
        model.set_masks(downsample_mask(edit_mask(R), min_res=min_res))
        return model, (x, t)
    if name == "sd":
        from sige_tpu.models.sd import SDUNetConfig, SIGESDUNet

        cfg = SDUNetConfig()
        model = SIGEModel(SIGESDUNet(cfg=cfg), layout="window")
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 4)).astype(np.float32))
        t = jnp.full((2,), 17.0, jnp.float32)
        c = jnp.asarray(rng.standard_normal((2, 77, 768)).astype(np.float32))
        model.init(jax.random.key(0), x, t, c)
        model.full(x, t, c)
        model.set_masks(downsample_mask(edit_mask(512), min_res=8))
        return model, (x, t, c)
    raise SystemExit(f"unknown family {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="pd", choices=["pd", "ddpm", "sd"])
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()

    from sige_tpu.nn.module import SIGECtx

    model, fargs = _family(args.family)
    variables = {"params": model.params, "cache": model.cache,
                 "sige": model.plan}
    dense = _collect(model.module, variables, fargs, SIGECtx(mode="dense"))
    sparse = _collect(model.module, variables, fargs, SIGECtx(mode="sparse"))

    # group per top-level block path (drop the trailing sow leaf name)
    def group(rows, depth=3):
        out = {}
        for path, v in rows.items():
            key = "/".join(p for p in path[:-1] if p != "macs")[:90] or "root"
            out[key] = out.get(key, 0.0) + v
        return out

    gd, gs = group(dense), group(sparse)
    keys = sorted(set(gd) | set(gs), key=lambda k: -(gd.get(k, 0.0)))
    print(f"{'module path':70s} {'dense G':>10s} {'sparse G':>10s} {'ratio':>7s}")
    shown = 0
    for k in keys:
        d, s = gd.get(k, 0.0) / 1e9, gs.get(k, 0.0) / 1e9
        if shown < args.top:
            r = (d / s) if s else float("inf")
            print(f"{k:70s} {d:10.2f} {s:10.2f} {r:7.1f}")
            shown += 1
    print(f"{'TOTAL':70s} {sum(gd.values())/1e9:10.2f} "
          f"{sum(gs.values())/1e9:10.2f} "
          f"{sum(gd.values())/max(sum(gs.values()),1):7.1f}")


if __name__ == "__main__":
    main()
