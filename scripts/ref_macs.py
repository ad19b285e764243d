"""Count the REFERENCE implementation's own MACs at the bench edit.

VERDICT r4 item 2 asked whether PD's 2.7x sparse-MACs ratio is a gap in
this repo or a property of the architecture the reference shares. This
script answers it from the horse's mouth: it instantiates the reference
models (torch CPU, random weights — MACs are weight-independent) at the
REAL bench configs, runs the reference's own 3-phase protocol with the
same centered ~1.2% edit bench.py uses, and counts MACs in the
reference's "profile" mode (dummy gather outputs sized by the active
block count — reference: sige/nn/gather.py:59-70) exactly the way
torchprofile would: Conv2d = out_elems * cin/groups * kh * kw,
Linear = out_elems * in_features, bmm = b*n*m*p (torchprofile isn't in
this image; these are its handler formulas).

Usage: python scripts/ref_macs.py [--family pd|ddpm] [--res 256]
Requires the reference CPU extension to build (tests/ref_oracle.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

from ref_oracle import import_suite_module, install_reference  # noqa: E402

from sige_tpu.utils.config import AttrDict  # noqa: E402


class MacCounter:
    """Forward hooks on Conv2d/Linear + a torch.bmm patch."""

    def __init__(self, model):
        self.total = 0
        self.rows = {}
        self.handles = []
        names = {m: n for n, m in model.named_modules()}

        def conv_hook(mod, inp, out):
            kh, kw = mod.kernel_size
            n = out.numel() * (mod.in_channels // mod.groups) * kh * kw
            self._add(names.get(mod, "?"), n)

        def lin_hook(mod, inp, out):
            self._add(names.get(mod, "?"), out.numel() * mod.in_features)

        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                self.handles.append(m.register_forward_hook(conv_hook))
            elif isinstance(m, nn.Linear):
                self.handles.append(m.register_forward_hook(lin_hook))

    def _add(self, name, n):
        self.total += n
        self.rows[name] = self.rows.get(name, 0) + n

    def __enter__(self):
        self._bmm = torch.bmm

        def bmm(a, b, **kw):
            self._add("bmm", a.shape[0] * a.shape[1] * a.shape[2] * b.shape[2])
            return self._bmm(a, b, **kw)

        torch.bmm = bmm
        return self

    def __exit__(self, *exc):
        torch.bmm = self._bmm
        for h in self.handles:
            h.remove()


def _bench_mask(R, pct=1.2, dilate=5):
    from sige_tpu.core.masks import dilate_mask

    mask = np.zeros((R, R), bool)
    side = int(round((pct / 100.0 * R * R) ** 0.5))
    r = R // 2 - side // 2
    mask[r:r + side, r:r + side] = True
    return dilate_mask(mask, dilate)


PD_CFG = {
    "data": {"image_size": 256},
    "model": {
        "ch": 64, "ch_mult": [1, 1, 2, 4, 6, 8], "num_res_blocks": 3,
        "attn_resolutions": [8, 16, 32], "in_ch": 3, "out_ch": 6,
        "temb_ch": 768, "head_dim": 64, "num_heads": None,
        "logsnr_input_type": "inv_cos",
        "sige_block_size": {"normal": 6, "instance": 4},
        "sparse_resolution_threshold": 64,
    },
}

DDPM_CFG = {
    "data": {"image_size": 256},
    "model": {
        "ch": 128, "ch_mult": [1, 1, 2, 2, 4, 4], "num_res_blocks": 2,
        "attn_resolutions": [16], "in_ch": 3, "out_ch": 3,
        "resamp_with_conv": True,
        "sige_block_size": {"normal": 6, "instance": 4},
        "sparse_resolution_threshold": 64,
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="pd", choices=["pd", "ddpm"])
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    import time
    t0 = time.time()
    def _p(msg):
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)
    _p("installing reference (builds the CPU extension on first use)")
    sige = install_reference("diffusion")
    _p("reference installed")
    if args.family == "pd":
        RefUNet = import_suite_module(
            "diffusion", "models.pd_arch.sige_unet").SIGEUNet
        cfg = PD_CFG
        t = torch.zeros(1, dtype=torch.float32)
    else:
        RefUNet = import_suite_module(
            "diffusion", "models.ddpm_arch.sige_fused_unet").SIGEFusedUNet
        cfg = DDPM_CFG
        t = torch.zeros(1, dtype=torch.long)
    cfg["data"]["image_size"] = args.res

    torch.manual_seed(0)
    model = RefUNet(None, AttrDict.convert(cfg)).eval()
    R = args.res
    x = torch.randn(1, 3, R, R)

    mask = _bench_mask(R)
    tmask = sige.utils.downsample_mask(
        torch.from_numpy(np.asarray(mask)), min_res=R // 32, dilation=1)

    torch.set_num_threads(max(os.cpu_count() or 1, 1))
    with torch.no_grad():
        model.set_mode("full")
        _p("full pass (fills caches)")
        model(x, t)
        _p("full pass done")
        if args.family == "ddpm":
            for m in model.modules():
                if type(m).__name__ == "SIGEFusedAttnBlock" and isinstance(
                        getattr(m, "scales", None), torch.Tensor):
                    m.scales = {m.cache_id: m.scales}
                    m.shifts = {m.cache_id: m.shifts}
        _p("set_masks")
        model.set_masks(tmask)
        _p("profile pass")

        model.set_mode("profile")
        with MacCounter(model) as sparse_c:
            model(x, t)

        # dense MACs: the plain full forward counts every op at full res
        _p("dense count pass")
        model.set_mode("full")
        with MacCounter(model) as dense_c:
            model(x, t)
        _p("done")

    print(f"reference {args.family}{R}: dense {dense_c.total/1e9:.1f} G, "
          f"sparse(profile) {sparse_c.total/1e9:.1f} G, "
          f"ratio {dense_c.total/max(sparse_c.total,1):.2f}x "
          f"(edit {100*float(np.asarray(mask).mean()):.2f}% incl. dilation)")
    rows = sorted(sparse_c.rows.items(), key=lambda kv: -kv[1])[:args.top]
    print("top sparse-mode sites:")
    for name, n in rows:
        print(f"  {name:60s} {n/1e9:8.2f} G  (dense "
              f"{dense_c.rows.get(name, 0)/1e9:.2f} G)")


if __name__ == "__main__":
    main()
