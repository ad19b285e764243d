"""LPIPS perceptual distance (reference: diffusion/metrics/lpips_score.py
wraps the `lpips` package in spatial mode with optional mask restriction).

The metric: unit-normalize backbone features at several layers, take
channel-weighted squared differences, average spatially, and sum layers.
The backbone (AlexNet/VGG) and the learned per-channel weights must come
from local files (no network egress); the math + mask handling live here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def normalize_tensor(feat: np.ndarray, eps: float = 1e-10) -> np.ndarray:
    """Unit-normalize along the channel axis (last)."""
    norm = np.sqrt((feat**2).sum(axis=-1, keepdims=True))
    return feat / (norm + eps)


def lpips_from_features(
    feats_a: Sequence[np.ndarray],
    feats_b: Sequence[np.ndarray],
    lin_weights: Sequence[np.ndarray],
    mask: Optional[np.ndarray] = None,
) -> float:
    """LPIPS given per-layer features [H_l, W_l, C_l] and per-channel
    linear weights [C_l]. With ``mask`` ([H, W] bool at image resolution),
    each layer's spatial map is averaged over the (resized) masked region
    only — the reference's spatial-mode mask restriction."""
    total = 0.0
    for fa, fb, w in zip(feats_a, feats_b, lin_weights):
        da = normalize_tensor(fa) - normalize_tensor(fb)
        dist = (da**2 * np.asarray(w)).sum(axis=-1)  # [H_l, W_l]
        if mask is not None:
            m = _resize_mask(np.asarray(mask, np.float32), dist.shape)
            denom = m.sum()
            total += float((dist * m).sum() / max(denom, 1e-8))
        else:
            total += float(dist.mean())
    return total


def _resize_mask(mask: np.ndarray, hw) -> np.ndarray:
    H, W = mask.shape
    oh, ow = hw
    rows = (np.arange(oh) * H) // oh
    cols = (np.arange(ow) * W) // ow
    return mask[rows][:, cols]


class LPIPS:
    """Torch-backed LPIPS with local weights.

    ``backbone_path``: torchvision vgg16/alexnet state dict.
    ``lin_path``: LPIPS linear-layer state dict (the `lpips` package's
    .pth for the matching net).
    """

    VGG_SLICES = (4, 9, 16, 23, 30)  # relu1_2 ... relu5_3 boundaries

    def __init__(self, backbone_path: str, lin_path: str, net: str = "vgg"):
        import torch
        import torchvision

        if net != "vgg":
            raise NotImplementedError("only the vgg backbone is wired")
        vgg = torchvision.models.vgg16(weights=None)
        vgg.load_state_dict(torch.load(backbone_path, map_location="cpu"))
        self.features = vgg.features.eval()
        lin_sd = torch.load(lin_path, map_location="cpu")
        # lpips lin layers: lins.{i}.model.1.weight [C,1,1,1]
        self.lin_weights = []
        for i in range(5):
            key = f"lin{i}.model.1.weight"
            if key not in lin_sd:
                key = f"lins.{i}.model.1.weight"
            self.lin_weights.append(
                lin_sd[key].squeeze().numpy())  # [C]
        self._torch = torch

    def _extract(self, img: np.ndarray):
        """img [H, W, 3] in [0, 1] -> list of [H_l, W_l, C_l] features."""
        torch = self._torch
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = (np.asarray(img, np.float32) - mean) / std
        x = torch.from_numpy(x.transpose(2, 0, 1))[None]
        feats, start = [], 0
        with torch.no_grad():
            for end in self.VGG_SLICES:
                for layer in self.features[start:end]:
                    x = layer(x)
                start = end
                feats.append(x[0].permute(1, 2, 0).numpy())
        return feats

    def __call__(self, a: np.ndarray, b: np.ndarray,
                 mask: Optional[np.ndarray] = None) -> float:
        return lpips_from_features(
            self._extract(a), self._extract(b), self.lin_weights, mask)
