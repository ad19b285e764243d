"""Per-op device-time attribution for one family's sparse (or dense) step.

VERDICT r3 weak-3: sparse wall speedups lag the MACs ratios — this tool
names where the non-MXU time goes. It builds a family exactly like
bench.py, runs the jitted step under ``jax.profiler.trace``, parses the
captured xplane with ``jax.profiler.ProfileData`` (no tensorboard
needed), and prints the top ops on the device plane grouped by HLO
category (convolution / fusion / dynamic-(update-)slice / gather /
copy / ...).

    python scripts/profile_sparse.py --family ddpm [--mode sparse]
    python scripts/profile_sparse.py --family sd --top 30

Steps are dispatched individually (not inside a scan) so per-op events
attribute to one step; the reported per-step total therefore includes
the remote-dispatch floor that scan_timed subtracts — use bench.py for
wall numbers, this tool for *relative* attribution only.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(family, dtype):
    """Returns (step, args) — a jittable step closed over nothing big,
    plus its operands, mirroring bench.py's setup for the family."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as B
    from sige_tpu.nn.module import SIGECtx

    if family in ("sd", "decoder", "encoder"):
        from sige_tpu.models.sd import (SDUNetConfig, SDVAEConfig,
                                        SIGEDecoder, SIGEEncoder, SIGESDUNet)
        from sige_tpu.core.masks import dilate_mask, downsample_mask
        from sige_tpu.nn import SIGEModel

        dt = jnp.dtype(dtype)
        rng = np.random.default_rng(0)
        cast = lambda tr: jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, tr)
        if family == "sd":
            model = SIGEModel(SIGESDUNet(cfg=SDUNetConfig()), layout="window")
            x = jnp.asarray(rng.standard_normal((2, 64, 64, 4)).astype(np.float32))
            t = jnp.full((2,), 17.0, jnp.float32)
            c = jnp.asarray(rng.standard_normal((2, 77, 768)).astype(np.float32))
            model.init(jax.random.key(0), x, t, c)
            model.full(x, t, c)
            model.set_masks(downsample_mask(B._edit_mask(512), min_res=8))
            cb = c.astype(dt)
            v = {"params": cast(model.params), "cache": cast(model.cache),
                 "sige": model.plan}
            step = lambda v, x: model.module.apply(v, x, t, cb,
                                                   ctx=SIGECtx(mode="sparse"))
            dense = lambda v, x: model.module.apply(
                {"params": v["params"]}, x, t, cb, ctx=SIGECtx(mode="dense"))
            return step, dense, v, x.astype(dt)
        cls = SIGEDecoder if family == "decoder" else SIGEEncoder
        mdl = SIGEModel(cls(cfg=SDVAEConfig(resolution=512, sige_tail=True)),
                        layout="window")
        if family == "decoder":
            x = jnp.asarray(rng.standard_normal((1, 64, 64, 4)).astype(np.float32))
            mdl.init(jax.random.key(0), x)
            mdl.full(x)
            mdl.set_masks(downsample_mask(
                dilate_mask(B._edit_mask(512, dilate=0), 40), min_res=(4, 4),
                dilation=0))
        else:
            x = jnp.asarray(rng.standard_normal((1, 512, 512, 3)).astype(np.float32))
            mdl.init(jax.random.key(0), x)
            mdl.full(x)
            mdl.set_masks(downsample_mask(B._edit_mask(512), min_res=8))
        v = {"params": cast(mdl.params), "cache": cast(mdl.cache),
             "sige": mdl.plan}
        step = lambda v, x: mdl.module.apply(v, x, ctx=SIGECtx(mode="sparse"))
        dense = lambda v, x: mdl.module.apply({"params": v["params"]}, x,
                                              ctx=SIGECtx(mode="dense"))
        return step, dense, v, x.astype(dt)

    if family in ("ddpm", "pd"):
        if family == "ddpm":
            from sige_tpu.models.ddpm import DDPMUNetConfig
            from sige_tpu.runners import DiffusionRunConfig, DiffusionRunner
            runner = DiffusionRunner(DDPMUNetConfig(sige_tail=True),
                                     DiffusionRunConfig(), seed=0)
            t_args = (jnp.zeros((1,), jnp.float32),)
        else:
            from sige_tpu.models.pd import PDUNetConfig
            from sige_tpu.samplers.pd import logsnr_schedule
            from sige_tpu.runners import PDRunner
            runner = PDRunner(PDUNetConfig(sige_tail=True))
            rc = runner.run_cfg
            t_args = (logsnr_schedule(
                jnp.full((1,), rc.noise_level / rc.total_steps)),)
        rng = np.random.default_rng(0)
        original = rng.random((256, 256, 3)).astype(np.float32)
        edited = original.copy()
        side = int(round((0.012 * 256 * 256) ** 0.5))
        r = 128 - side // 2
        edited[r:r + side, r:r + side] = rng.random((side, side, 3))
        x0, x1, _ = runner.preprocess(original, edited)
        v = {"params": runner.model.params, "cache": runner.model.cache,
             "sige": runner.model.plan}
        mod = runner.module
        step = lambda v, x: mod.apply(v, x, *t_args,
                                      ctx=SIGECtx(mode="sparse"))
        dense = lambda v, x: mod.apply({"params": v["params"]}, x, *t_args,
                                       ctx=SIGECtx(mode="dense"))
        return step, dense, v, x1

    if family == "gaugan":
        from sige_tpu.runners import GauGANRunner
        runner = GauGANRunner()
        rng = np.random.default_rng(0)
        H, W = 256, 512
        l0 = rng.integers(0, 34, (H, W))
        l1 = l0.copy()
        side = int(round((0.012 * H * W) ** 0.5))
        l1[H // 3:H // 3 + side, W // 3:W // 3 + side] = 34
        x0, x1, _ = runner.preprocess(runner.preprocess_input(l0, l0),
                                      runner.preprocess_input(l1, l1))
        v = {"params": runner.model.params, "cache": runner.model.cache,
             "sige": runner.model.plan}
        mod = runner.module
        step = lambda v, x: mod.apply(v, x, ctx=SIGECtx(mode="sparse"))
        dense = lambda v, x: mod.apply({"params": v["params"]}, x,
                                       ctx=SIGECtx(mode="dense"))
        return step, dense, v, x1

    raise SystemExit(f"unknown family {family}")


_CATS = (
    # Fusions whose operands include a [kh,kw,Cin,Cout] conv weight ARE
    # the convolutions (XLA lowers small-window convs to select/bitcast
    # matmul fusions on TPU); without this they miscategorize as
    # copy/transpose via the "bitcast" in their fused op name — the
    # round-4 "69% copy" red herring.
    ("convolution", re.compile(
        r"convolution|conv(?:\d|_)|%conv"
        r"|fusion\((?:bf16|f32)\[[13],[13],\d+,\d+\]")),
    ("matmul/dot", re.compile(r"\bdot\b|dot_general|einsum")),
    ("dynamic-slice", re.compile(r"dynamic.slice(?!.*update)|dynamic_slice(?!_update)")),
    ("dynamic-update-slice", re.compile(r"dynamic.update.slice|dynamic_update_slice")),
    ("gather/take", re.compile(r"gather")),
    ("scatter", re.compile(r"scatter")),
    ("copy/transpose", re.compile(r"\bcopy\b|transpose|bitcast")),
    ("reduce", re.compile(r"reduce")),
    ("fusion(elementwise)", re.compile(r"fusion|fused")),
    ("infeed/outfeed", re.compile(r"infeed|outfeed|transfer")),
)


def _categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in _CATS:
        if pat.search(low):
            return cat
    return "other"


def profile(step, v, x, iters, outdir, top):
    import jax

    from sige_tpu.utils import device_sync

    device_sync(step(v, x))  # compile outside the trace
    with jax.profiler.trace(outdir):
        y = None
        for _ in range(iters):
            y = step(v, x)
        device_sync(y)
    _report(outdir, iters, top)


def profile_scan(step, v, x, length, iters, outdir, top):
    """Trace the step inside a fused lax.scan trajectory — the bench /
    production execution model (utils.scan_timed). Loop-invariant work
    (weight relayout copies, plan uploads) hoists OUT of the loop here,
    exactly as it does in the wall numbers; per-step attribution divides
    by length*iters, so hoisted ops show at their amortized cost."""
    import jax
    import jax.numpy as jnp

    from sige_tpu.utils import device_sync

    def scanned(v, x):
        def body(acc, _):
            out = step(v, x + acc.astype(x.dtype))
            leaf = jax.tree.leaves(out)[0]
            return (jnp.float32(1e-30)
                    * jnp.mean(leaf).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
        return acc

    f = jax.jit(scanned)
    device_sync(f(v, x))  # compile outside the trace
    with jax.profiler.trace(outdir):
        y = None
        for _ in range(iters):
            y = f(v, x)
        device_sync(y)
    _report(outdir, length * iters, top)


def _report(outdir, iters, top):
    import jax  # noqa: F401

    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no xplane captured under {outdir} — the "
                         "remote-dispatch backend may not return device "
                         "traces; see STATUS perf notes")
    from jax.profiler import ProfileData

    data = ProfileData.from_file(max(files, key=os.path.getmtime))
    # A device plane carries several LINES: "XLA Modules" (one event per
    # program execution), "XLA Ops" (the sync per-op busy line — THE line
    # to attribute against), plus async activity lines (DMA/copy-start
    # offload queues) that overlap compute. Summing across lines double
    # counts; aggregate the "XLA Ops" line only and report the module
    # line as program wall (round-4 lesson: async prefetches look huge
    # but overlap — see STATUS perf notes).
    rows = []  # (plane, line_name, agg, cnt)
    for plane in data.planes:
        is_dev = ("TPU" in plane.name or "/device" in plane.name.lower()
                  or "xla" in plane.name.lower())
        if not is_dev:
            continue
        for line in plane.lines:
            agg = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                agg[ev.name] += ev.duration_ns
                cnt[ev.name] += 1
            if agg:
                rows.append((plane.name, line.name, agg, cnt))
    if not rows:
        names = [p.name for p in data.planes]
        raise SystemExit(f"no device plane with events; planes = {names}")
    for plane_name, line_name, agg, cnt in rows:
        total = sum(agg.values())
        if "ops" not in line_name.lower():
            print(f"\n== plane {plane_name} line '{line_name}': "
                  f"{total/1e6/iters:.3f} ms/step over {iters} steps "
                  f"({sum(cnt.values())//iters} events/step) — not "
                  f"attributed (module/async line) ==")
            continue
        print(f"\n== plane: {plane_name} line '{line_name}'  total "
              f"{total/1e6:.2f} ms over "
              f"{iters} steps ({total/1e6/iters:.3f} ms/step) ==")
        bycat = collections.Counter()
        for name, ns in agg.items():
            bycat[_categorize(name)] += ns
        print("-- by category --")
        for cat, ns in bycat.most_common():
            print(f"  {ns/1e6/iters:8.3f} ms/step  {100*ns/total:5.1f}%  {cat}")
        print(f"-- top {top} ops --")
        for name, ns in agg.most_common(top):
            print(f"  {ns/1e6/iters:8.3f} ms/step  {100*ns/total:5.1f}%  "
                  f"x{cnt[name]//iters:<4d} {name[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="ddpm",
                   choices=["ddpm", "pd", "gaugan", "sd", "decoder",
                            "encoder"])
    p.add_argument("--mode", default="sparse", choices=["sparse", "dense"])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--scan", type=int, default=0, metavar="LEN",
                   help="trace inside a lax.scan trajectory of LEN steps "
                        "(the bench execution model) instead of "
                        "individual dispatches")
    p.add_argument("--outdir", default=None)
    args = p.parse_args()

    from sige_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    step, dense, v, x = _build(args.family, args.dtype)
    fn = jax.jit(step if args.mode == "sparse" else dense)
    outdir = args.outdir or tempfile.mkdtemp(prefix=f"sige_prof_{args.family}_")
    print(f"trace dir: {outdir}")
    if args.scan:
        profile_scan(step if args.mode == "sparse" else dense, v, x,
                     args.scan, max(args.iters // args.scan, 1), outdir,
                     args.top)
    else:
        profile(fn, v, x, args.iters, outdir, args.top)


if __name__ == "__main__":
    main()
