"""Quality-metric dispatcher (reference: diffusion/get_metric.py,
gaugan/get_metric.py).

  python -m sige_tpu.cli.get_metric --metric psnr \
      --root results/ --gt_root database/gt/ [--mask_root masks/]
  python -m sige_tpu.cli.get_metric --metric fid --root a/ --gt_root b/ \
      --inception_weights path.pth
  python -m sige_tpu.cli.get_metric --metric lpips --root a/ --gt_root b/ \
      --vgg_weights vgg16.pth --lpips_weights lpips_vgg.pth
  python -m sige_tpu.cli.get_metric --metric miou --root preds/ --gt_root gts/

Images are matched by filename between --root and --gt_root; mIoU expects
.npy label maps (raw Cityscapes ids are mapped to trainIds).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _pairs(root, gt_root, exts=(".png", ".jpg", ".npy")):
    names = sorted(
        f for f in os.listdir(root) if os.path.splitext(f)[1] in exts)
    for name in names:
        stem = os.path.splitext(name)[0]
        for ext in (os.path.splitext(name)[1], ".npy", ".png", ".jpg"):
            gt = os.path.join(gt_root, stem + ext)
            if os.path.exists(gt):
                yield name, os.path.join(root, name), gt
                break


def _load(path):
    if path.endswith(".npy"):
        return np.load(path)
    from ..data import load_image

    return load_image(path) * 255.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--metric", required=True,
                   choices=("psnr", "lpips", "fid", "miou"))
    p.add_argument("--root", required=True, help="generated results dir")
    p.add_argument("--gt_root", required=True, help="ground-truth dir")
    p.add_argument("--mask_root", default=None,
                   help="optional .npy masks restricting PSNR/LPIPS/mIoU")
    p.add_argument("--inception_weights", default=None,
                   help="local torchvision inception_v3 state dict (FID)")
    p.add_argument("--backbone_weights", "--vgg_weights", dest="backbone_weights",
                   default=None,
                   help="local torchvision alexnet state dict (LPIPS)")
    p.add_argument("--lpips_weights", default=None,
                   help="the lpips package's alex.pth lin heads")
    p.add_argument("--drn_weights", default=None,
                   help="local drn-d-105_ms_cityscapes.pth; with it, mIoU "
                        "segments the images in --root instead of reading "
                        "precomputed .npy predictions")
    args = p.parse_args()

    from .. import metrics

    def mask_for(name):
        if args.mask_root is None:
            return None
        path = os.path.join(args.mask_root,
                            os.path.splitext(name)[0] + ".npy")
        return np.load(path) if os.path.exists(path) else None

    if args.metric == "psnr":
        vals = [metrics.psnr(_load(a), _load(b), mask=mask_for(n))
                for n, a, b in _pairs(args.root, args.gt_root)]
        print(f"PSNR: {np.mean(vals):.4f} over {len(vals)} images")
    elif args.metric == "lpips":
        lp = metrics.LPIPS(args.backbone_weights, args.lpips_weights)
        vals = [lp(_load(a) / 255.0, _load(b) / 255.0, mask=mask_for(n))
                for n, a, b in _pairs(args.root, args.gt_root)]
        print(f"LPIPS: {np.mean(vals):.4f} over {len(vals)} images")
    elif args.metric == "fid":
        feat = metrics.fid.make_inception_feature_fn(args.inception_weights)
        a = np.stack([_load(a) / 255.0
                      for _, a, _ in _pairs(args.root, args.gt_root)])
        b = np.stack([_load(b) / 255.0
                      for _, _, b in _pairs(args.root, args.gt_root)])
        print(f"FID: {metrics.compute_fid(a, b, feat):.4f}")
    else:  # miou
        seg = None
        if args.drn_weights:
            import torch

            from ..metrics.backbones import CityscapesSegmenter

            sd = torch.load(args.drn_weights, map_location="cpu")
            sd = {k: v.numpy() if hasattr(v, "numpy") else v
                  for k, v in sd.items()}
            seg = CityscapesSegmenter(sd)
        conf = np.zeros((19, 19), np.int64)
        n = 0
        exts = (".png", ".jpg") if seg else (".npy",)
        for name, a, b in _pairs(args.root, args.gt_root, exts=exts):
            if seg is not None:
                pred = seg(_load(a) / 255.0)  # already trainIds
            else:
                pred = metrics.to_train_ids(np.load(a))
            gt = metrics.to_train_ids(np.load(b))
            conf += metrics.confusion_matrix(pred, gt, mask=mask_for(name))
            n += 1
        print(f"mIoU: {metrics.mean_iou(conf):.4f} over {n} maps")


if __name__ == "__main__":
    main()
