"""InceptionV3 pool-feature extractor for FID (Flax).

The reference computes FID via clean-fid's InceptionV3 pool3 features
(reference: diffusion/metrics/fid_score.py:1-10). This is the
torchvision ``inception_v3`` trunk (BasicConv2d = conv(no bias) +
BatchNorm(eps 1e-3), Mixed_5b..7c) up to the global average pool — 2048
features. Weights load from a local torchvision state dict.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: int = 1
    padding: Sequence = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        x = nn.Conv(self.features, tuple(self.kernel), strides=self.strides,
                    padding=((pad[0], pad[0]), (pad[1], pad[1])),
                    use_bias=False, name="conv")(x)
        mean = self.param("running_mean", nn.initializers.zeros_init(),
                          (self.features,))
        var = self.param("running_var", nn.initializers.ones_init(),
                         (self.features,))
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        x = (x - mean) / jnp.sqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool_3_1_1(x):
    # torch avg_pool2d(3, stride 1, pad 1) with count_include_pad=True
    s = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    count_include_pad=True)
    return s


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool_3_1_1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool_3_1_1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool_3_1_1(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """[B, 299, 299, 3] in [-1, 1] -> [B, 2048] pool features."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(pool_features=32, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(c7=128, name="Mixed_6b")(x)
        x = InceptionC(c7=160, name="Mixed_6c")(x)
        x = InceptionC(c7=160, name="Mixed_6d")(x)
        x = InceptionC(c7=192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # global average pool -> [B, 2048]


def convert_inception_v3(sd: Mapping[str, np.ndarray]) -> Dict:
    """torchvision ``inception_v3`` state dict ->
    :class:`InceptionV3Features` params (BasicConv2d key layout:
    ``<block>.conv.weight`` + ``<block>.bn.{weight,bias,running_*}``;
    AuxLogits/fc ignored)."""
    import flax

    flat = {}
    for key, v in sd.items():
        if key.startswith(("AuxLogits", "fc.")):
            continue
        v = np.asarray(v)
        parts = key.split(".")
        # <module path...>.conv.weight | .bn.{weight,bias,running_*}
        mod, leaf = parts[:-2], parts[-2:]
        path = tuple(mod)
        if leaf[0] == "conv":
            flat[path + ("conv", "kernel")] = np.transpose(v, (2, 3, 1, 0))
        elif leaf == ["bn", "weight"]:
            flat[path + ("scale",)] = v
        elif leaf == ["bn", "bias"]:
            flat[path + ("bias",)] = v
        elif leaf == ["bn", "running_mean"]:
            flat[path + ("running_mean",)] = v
        elif leaf == ["bn", "running_var"]:
            flat[path + ("running_var",)] = v
        # num_batches_tracked dropped
    return flax.traverse_util.unflatten_dict(flat)


class FIDInception:
    """images [N, H, W, 3] in [0, 1] -> [N, 2048] features (resized to
    299 bilinear, scaled to [-1, 1] — the pytorch-fid convention)."""

    def __init__(self, inception_sd: Optional[Mapping[str, np.ndarray]],
                 batch: int = 8):
        import jax

        self.module = InceptionV3Features()
        if inception_sd is None:
            # UNTRAINED backbone: pipeline dry-runs only (the metric
            # numbers are meaningless without the torchvision weights)
            self.params = self.module.init(
                jax.random.key(0), jnp.zeros((1, 299, 299, 3)))["params"]
        else:
            self.params = convert_inception_v3(inception_sd)
        self.batch = batch
        self._fwd = jax.jit(lambda p, x: self.module.apply({"params": p}, x))

    def __call__(self, images: np.ndarray) -> np.ndarray:
        import jax

        images = np.asarray(images, np.float32)
        feats = []
        for i in range(0, len(images), self.batch):
            x = jnp.asarray(images[i:i + self.batch])
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, 3), method="bilinear")
            feats.append(np.asarray(self._fwd(self.params, x * 2.0 - 1.0)))
        return np.concatenate(feats, axis=0)
