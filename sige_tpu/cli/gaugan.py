"""GauGAN suite CLI (reference: gaugan/test.py).

  python -m sige_tpu.cli.gaugan --netG sige_fused_spade --mode profile --synthetic
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_args():
    p = argparse.ArgumentParser(description="SIGE-TPU GauGAN benchmarks")
    p.add_argument("--netG", type=str, default="sige_fused_spade",
                   choices=("spade", "fused_spade", "sige_fused_spade",
                            "sub_mobile_spade", "fused_sub_mobile_spade",
                            "sige_fused_sub_mobile_spade"))
    p.add_argument("--restore_from", type=str, default=None,
                   help="reference .pth checkpoint to convert, or a native "
                        "checkpoint dir written by --save_converted")
    p.add_argument("--save_converted", type=str, default=None,
                   help="write the (converted) params as a native orbax "
                        "checkpoint dir — later runs load it without torch")
    p.add_argument("--mode", choices=("generate", "profile"), default="generate")
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--input_nc", type=int, default=35)
    p.add_argument("--num_upsampling_layers", type=str, default="more")
    p.add_argument("--config_str", type=str, default=None,
                   help="sub-mobile channel config, e.g. 32_32_32_48_32_24_24_32")
    p.add_argument("--main_block_size", type=int, default=6)
    p.add_argument("--shortcut_block_size", type=int, default=4)
    p.add_argument("--num_sparse_layers", type=int, default=5)
    p.add_argument("--mask_dilate_radius", type=int, default=1)
    p.add_argument("--downsample_dilate_radius", type=int, default=2)
    p.add_argument("--data_root", type=str, default="database/cityscapes-edit")
    p.add_argument("--crop_size", type=int, default=512)
    p.add_argument("--aspect_ratio", type=float, default=2.0)
    p.add_argument("--no_instance", action="store_true")
    p.add_argument("--no_symmetric_editing", action="store_true")
    p.add_argument("--image_ids", type=int, nargs="+", default=None)
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--warmup_times", type=int, default=20)
    p.add_argument("--test_times", type=int, default=100)
    p.add_argument("--trace", type=str, default=None,
                   help="write a jax.profiler trace of the run "
                        "to this directory (tensorboard-compatible)")
    return p.parse_args()


def main():
    args = get_args()
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    from ..models.gaugan import (
        SIGESubMobileSPADEGenerator,
        SPADEGenConfig,
        decode_config,
    )
    from ..runners.gaugan_runner import GauGANRunConfig, GauGANRunner

    semantic_nc = args.input_nc + (0 if args.no_instance else 1)
    dense = not args.netG.startswith("sige")
    model_cfg = SPADEGenConfig(
        ngf=args.ngf, semantic_nc=semantic_nc, crop_size=args.crop_size,
        aspect_ratio=args.aspect_ratio,
        num_upsampling_layers=args.num_upsampling_layers,
        main_block_size=None if dense else args.main_block_size,
        shortcut_block_size=None if dense else args.shortcut_block_size,
        num_sparse_layers=0 if dense else args.num_sparse_layers,
    )
    run_cfg = GauGANRunConfig(
        input_nc=args.input_nc, use_instance=not args.no_instance,
        mask_dilate_radius=args.mask_dilate_radius,
        downsample_dilate_radius=args.downsample_dilate_radius,
    )
    # The engine always drives the fused archs; unfused checkpoints
    # ("spade" / "sub_mobile_spade") go through the mlp concatenation
    # surgery (reference: fused_spade_generator.py:72-160,
    # fused_sub_mobile_spade_generator.py:77-133).
    params = None
    module = None
    if args.restore_from:
        from ..utils.checkpoint import maybe_load_native

        params = maybe_load_native(args.restore_from)
    if "sub_mobile" in args.netG:
        assert args.config_str, "--config_str required for sub-mobile nets"
        channels = tuple(decode_config(args.config_str))
        module = SIGESubMobileSPADEGenerator(cfg=model_cfg, channels=channels)
        if args.restore_from and params is None:
            from ..utils.convert import (convert_gaugan_sub_mobile_spade,
                                         load_torch_state_dict)

            params = convert_gaugan_sub_mobile_spade(
                load_torch_state_dict(args.restore_from), channels=channels,
                ngf=args.ngf, fused_ckpt="fused" in args.netG)
    elif args.restore_from and params is None:
        from ..utils.convert import (convert_gaugan_fused_spade,
                                     convert_gaugan_spade,
                                     load_torch_state_dict)

        sd = load_torch_state_dict(args.restore_from)
        params = (convert_gaugan_fused_spade(sd, args.num_upsampling_layers)
                  if "fused" in args.netG else
                  convert_gaugan_spade(sd, args.num_upsampling_layers,
                                       fuse=True))
    runner = GauGANRunner(model_cfg, run_cfg, params=params, seed=args.seed,
                          module=module)
    if args.save_converted:
        from ..utils.checkpoint import save_params

        print("saved native checkpoint:",
              save_params(args.save_converted, runner.model.params))

    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        H = round(args.crop_size / args.aspect_ratio)
        l0 = rng.integers(0, args.input_nc - 1, (H, args.crop_size))
        l1 = l0.copy()
        side = max(4, int(round((0.012 * H * args.crop_size) ** 0.5)))
        l1[H // 3 : H // 3 + side, args.crop_size // 3 : args.crop_size // 3 + side] = args.input_nc - 1
        items = [{"name": "synthetic", "original_label": l0,
                  "original_instance": l0, "edited_label": l1,
                  "edited_instance": l1}]
    else:
        from ..data import CityscapesEditDataset

        items = list(CityscapesEditDataset(
            args.data_root, symmetric=not args.no_symmetric_editing,
            image_ids=args.image_ids))

    import contextlib

    import jax

    trace_cm = (jax.profiler.trace(args.trace)
                if getattr(args, "trace", None) else contextlib.nullcontext())
    with trace_cm:
        _run_items(args, runner, items, dense)
    if getattr(args, "trace", None):
        print(f"profiler trace written to {args.trace}")


def _run_items(args, runner, items, dense):
    for item in items:
        s0 = runner.preprocess_input(item["original_label"], item["original_instance"])
        s1 = runner.preprocess_input(item["edited_label"], item["edited_instance"])
        if args.mode == "profile":
            stats = runner.profile(s0, s1, warmup=args.warmup_times,
                                   iters=args.test_times,
                                   mode="dense" if dense else "sparse")
            print(f"Image {item['name']}: "
                  f"Sparsity {100 * stats['edit_ratio']:.2f}%    "
                  f"MACs {stats['macs_g']:.3f}G    "
                  f"Avg Time {stats['latency_ms']:.3f}ms")
        else:
            out = runner.generate(s0, s1)
            stats = runner.model.stats()
            print(f"Image {item['name']}: Edit Ratio "
                  f"{100 * runner.last_edit_ratio:.2f}%    Tiles "
                  f"{sum(v['tiles'] for v in stats.values())}/"
                  f"{sum(v['capacity'] for v in stats.values())}")
            if args.save_dir:
                from ..data import save_image

                path = os.path.join(args.save_dir, f"{item['name']}.png")
                save_image(path, (out + 1.0) / 2.0)
                print(f"saved {path}")


if __name__ == "__main__":
    main()
