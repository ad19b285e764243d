"""AlexNet feature backbone + LPIPS heads (Flax).

The reference computes LPIPS with the ``lpips`` package's AlexNet in
spatial mode (reference: diffusion/metrics/lpips_score.py:26). Weights
come from local files (no egress): the torchvision ``alexnet`` state
dict for the backbone and the lpips ``alex.pth`` lin heads.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# lpips's input scaling layer constants (public; lpips/networks_basic.py)
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet ``features`` trunk; returns the five ReLU tap
    activations LPIPS uses (channels 64/192/384/256/256)."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        x = nn.Conv(64, (11, 11), strides=4, padding=2, name="conv0")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=2, name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=1, name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=1, name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


def convert_alexnet(sd: Mapping[str, np.ndarray]) -> Dict:
    """torchvision ``alexnet`` state dict -> :class:`AlexNetFeatures`
    params (features.{0,3,6,8,10} convs)."""
    import flax

    flat = {}
    for i, idx in enumerate((0, 3, 6, 8, 10)):
        flat[(f"conv{i}", "kernel")] = np.transpose(
            np.asarray(sd[f"features.{idx}.weight"]), (2, 3, 1, 0))
        flat[(f"conv{i}", "bias")] = np.asarray(sd[f"features.{idx}.bias"])
    return flax.traverse_util.unflatten_dict(flat)


def convert_lpips_lins(sd: Mapping[str, np.ndarray]) -> List[np.ndarray]:
    """lpips ``alex.pth`` -> per-layer [C] channel weights
    (keys lin{i}.model.1.weight, shape [1, C, 1, 1])."""
    return [np.asarray(sd[f"lin{i}.model.1.weight"]).reshape(-1)
            for i in range(5)]


class LPIPSAlex:
    """images in [-1, 1] NHWC -> LPIPS features/distance
    (plugs into :func:`sige_tpu.metrics.lpips.lpips_from_features`)."""

    def __init__(self, alexnet_sd: Optional[Mapping[str, np.ndarray]],
                 lpips_sd: Optional[Mapping[str, np.ndarray]]):
        import jax

        self.module = AlexNetFeatures()
        if alexnet_sd is None:
            # UNTRAINED backbone: pipeline dry-runs only
            self.params = self.module.init(
                jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
        else:
            self.params = convert_alexnet(alexnet_sd)
        if lpips_sd is None:
            taps = self.module.apply(
                {"params": self.params}, jnp.zeros((1, 64, 64, 3)))
            self.lins = [np.ones((t.shape[-1],), np.float32) / t.shape[-1]
                         for t in taps]
        else:
            self.lins = convert_lpips_lins(lpips_sd)
        self._features = jax.jit(
            lambda p, x: self.module.apply({"params": p}, x))

    def features(self, img: np.ndarray) -> List[np.ndarray]:
        x = (np.asarray(img, np.float32) - LPIPS_SHIFT) / LPIPS_SCALE
        if x.ndim == 3:
            x = x[None]
        taps = self._features(self.params, jnp.asarray(x))
        return [np.asarray(t[0]) for t in taps]

    def __call__(self, a: np.ndarray, b: np.ndarray, mask=None) -> float:
        from ..lpips import lpips_from_features

        return lpips_from_features(self.features(a), self.features(b),
                                   self.lins, mask=mask)
