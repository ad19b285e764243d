"""SIGE-TPU walkthrough: the 3-phase protocol on a real model, step by step.

The runnable analogue of the reference's notebooks (reference:
example.ipynb, diffusion/ddpm.ipynb): it narrates exactly what happens
when you serve an interactive edit with Spatially Incremental Generative
Engine semantics on TPU —

  phase 1  FULL    dense pass on the original input; every Scatter module
                   caches its activation map, every Gather records its
                   planning geometry into the "meta" collection.
  phase 2  PLAN    host-side: the edit mask pyramid is reduced to packed
                   tile indices / canonical windows (numpy, off-device,
                   ~ms) and shipped as the "sige" collection.
  phase 3  SPARSE  the edited input runs through gathered tiles/windows
                   only; scatters overlay the fresh pixels onto the cached
                   maps. Two contracts hold (the same ones the reference's
                   deep U-Nets satisfy): sparse on the ORIGINAL input is
                   exact (~1e-4) for any mask, and sparse on an EDIT tracks
                   the dense forward of the edited input up to
                   receptive-field truncation at the mask boundary — at a
                   fraction of the MACs. (The exact-on-edits 1e-4 contract
                   of reference example.py:94-95 is a single-block-deep
                   model property; see examples/minimal.py for that one.)

The edit region is the reference's published golden mask
(reference: assets/mask.npy — the exact mask example.py:57-95 runs its
equivalence contract on) when available, else a synthetic square.

Run: python examples/walkthrough.py            (full-size: ch=128)
     python examples/walkthrough.py --small    (CI-size:   ch=32)
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_MASK = os.environ.get("SIGE_REFERENCE_MASK",
                             "/root/reference/assets/mask.npy")


def load_edit_mask(res: int = 256) -> np.ndarray:
    if os.path.isfile(GOLDEN_MASK):
        mask = np.load(GOLDEN_MASK)
        if mask.shape == (res, res):
            print(f"[mask] reference golden mask {GOLDEN_MASK} "
                  f"({100 * mask.mean():.2f}% of {mask.shape[0]}x{mask.shape[1]})")
            return mask
    mask = np.zeros((res, res), bool)
    side = int(round((0.02 * res * res) ** 0.5))
    mask[res // 3: res // 3 + side, res // 2: res // 2 + side] = True
    print(f"[mask] synthetic {side}x{side} square "
          f"({100 * mask.mean():.2f}% of {res}x{res})")
    return mask


def main(small: bool = False) -> float:
    from sige_tpu.core.masks import (compute_difference_mask, dilate_mask,
                                     downsample_mask)
    from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
    from sige_tpu.nn import SIGEModel
    from sige_tpu.nn.module import SIGECtx
    from sige_tpu.utils import traced_macs

    print(f"devices: {jax.devices()}")
    res = 256
    if small:  # CI-size: same wiring, 4 levels, thin channels
        cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                             attn_resolutions=(16,), resolution=res,
                             sparse_resolution_threshold=64)
    else:      # the published church256 architecture
        cfg = DDPMUNetConfig(ch=128, ch_mult=(1, 1, 2, 2, 4, 4),
                             num_res_blocks=2, attn_resolutions=(16,),
                             resolution=res, sparse_resolution_threshold=64)
    min_res = res // (2 ** (len(cfg.ch_mult) - 1))

    # --- inputs: an original image and an edit confined to the mask ------
    rng = np.random.default_rng(0)
    edit_region = load_edit_mask(res)
    x0 = rng.standard_normal((1, res, res, 3)).astype(np.float32)
    x1 = x0 + 0.5 * rng.standard_normal(x0.shape).astype(np.float32) \
        * edit_region[None, :, :, None]
    x0j, x1j = jnp.asarray(x0), jnp.asarray(x1)
    t = jnp.array([421], jnp.int32)

    # --- model: layout="auto" picks windows for compact edits, tiles for
    # scattered ones, per edit (nn/planner.py choose_layout) -------------
    model = SIGEModel(SIGEFusedUNet(cfg=cfg), layout="auto")
    model.init(jax.random.key(0), x0j, t)

    # --- phase 1: FULL ----------------------------------------------------
    print("\n[phase 1: full] dense pass on the ORIGINAL input "
          "(fills caches, records planning geometry)")
    y_full_orig = model.full(x0j, t)
    print(f"  cached activation maps: "
          f"{len(jax.tree.leaves(model.cache))} arrays, "
          f"{sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(model.cache)) / 1e6:.1f} MB")

    # --- phase 2: PLAN (host) ----------------------------------------------
    # the demo derives the mask from the actual image difference, exactly
    # like the reference (sige/utils.py compute_difference_mask)
    mask = compute_difference_mask(x0, x1)
    assert (mask == edit_region).all() or mask.sum() > 0
    masks = downsample_mask(dilate_mask(mask, 5), min_res=min_res, dilation=1)
    print(f"\n[phase 2: plan] mask pyramid at "
          f"{sorted(masks.keys(), reverse=True)}")
    model.set_masks(masks)
    print(f"  layout chosen: {model.active_layout}")
    stats = model.stats()
    for name, s in list(stats.items())[:4]:
        print(f"  {name}: {s['tiles']} tiles of {s['block_size']} "
              f"at {s['resolution']} (capacity {s['capacity']})")
    if len(stats) > 4:
        print(f"  ... and {len(stats) - 4} more gathers")

    # --- phase 3: SPARSE ----------------------------------------------------
    print("\n[phase 3: sparse] edited input through gathered regions only")
    # contract 1 (exact): sparse on the ORIGINAL input reproduces the full
    # pass to ~1e-4 — every gathered tile recomputes exactly what the cache
    # already holds, so scatters are identity overlays.
    y_sparse_orig = model.sparse(x0j, t)
    exact = float(jnp.abs(y_sparse_orig - y_full_orig).max())
    print(f"  max |sparse(original) - full(original)| = {exact:.2e} "
          "(exact contract, must be ~1e-4)")
    assert exact < 5e-4, "sparse-on-original diverged from full"

    # contract 2 (tracking): sparse on the EDIT tracks dense-on-edited up
    # to receptive-field truncation at the dilated mask boundary (the deep
    # U-Net propagates the edit wider than any fixed per-level dilation;
    # the reference's SIGE U-Nets make the same approximation).
    y_sparse = model.sparse(x1j, t)
    y_dense_edit = model.module.apply({"params": model.params}, x1j, t,
                                      ctx=SIGECtx(mode="dense"))
    abserr = jnp.abs(y_sparse - y_dense_edit)
    err, p99 = float(abserr.max()), float(jnp.percentile(abserr, 99))
    moved = float(jnp.abs(y_sparse - y_full_orig).max())
    print(f"  max |sparse(edit) - dense(edit)| = {err:.2e}, p99 = {p99:.2e} "
          "(tracking contract: boundary truncation only)")
    print(f"  max |sparse(edit) - full(original)| = {moved:.2e}  "
          "(the edit landed)")
    assert err < 0.3 and p99 < 0.1, "sparse lost track of the dense forward"
    assert moved > 1e-3, "the edit had no effect?"

    # --- the point: MACs ----------------------------------------------------
    variables = {"params": model.params, "cache": model.cache,
                 "sige": model.plan}
    dense_macs = traced_macs(model.module, variables, x0j, t,
                             ctx=SIGECtx(mode="dense"))
    sparse_macs = traced_macs(model.module, variables, x1j, t,
                              ctx=SIGECtx(mode="sparse"))
    print(f"\n[MACs] dense {dense_macs / 1e9:.1f} G -> "
          f"sparse {sparse_macs / 1e9:.1f} G "
          f"({dense_macs / sparse_macs:.1f}x reduction at "
          f"{100 * edit_region.mean():.1f}% edit)")
    return exact


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true",
                   help="CI-size model (ch=32, 4 levels)")
    main(small=p.parse_args().small)
