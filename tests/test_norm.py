"""Norm-folding tests: the affine (scale, shift) returned by each fold
must reproduce the normalized output when applied to the raw input —
the invariant the sparse epilogues rely on
(reference: diffusion/models/common.py:37-57)."""

import jax.numpy as jnp
import numpy as np
import torch

from sige_tpu.nn import (
    batch_norm_affine,
    group_norm_with_affine,
    instance_norm_with_affine,
)


def test_group_norm_fold_matches_affine(rng):
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    xn, scale, shift = group_norm_with_affine(
        jnp.asarray(x), 4, jnp.asarray(w), jnp.asarray(b))
    recon = x * np.asarray(scale)[:, None, None, :] + np.asarray(shift)[:, None, None, :]
    np.testing.assert_allclose(recon, np.asarray(xn), atol=1e-5)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    xn, _, _ = group_norm_with_affine(jnp.asarray(x), 4, jnp.asarray(w), jnp.asarray(b), eps=1e-6)
    gn = torch.nn.GroupNorm(4, 16, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(w))
        gn.bias.copy_(torch.from_numpy(b))
        ref = gn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(xn), ref, atol=1e-5)


def test_instance_norm_fold(rng):
    x = rng.standard_normal((2, 8, 8, 6)).astype(np.float32)
    xn, scale, shift = instance_norm_with_affine(jnp.asarray(x))
    recon = x * np.asarray(scale)[:, None, None, :] + np.asarray(shift)[:, None, None, :]
    np.testing.assert_allclose(recon, np.asarray(xn), atol=1e-5)
    # per-channel zero mean / unit var
    m = np.asarray(xn).mean(axis=(1, 2))
    np.testing.assert_allclose(m, 0, atol=1e-5)


def test_batch_norm_affine_matches_torch(rng):
    C = 10
    mean = rng.standard_normal(C).astype(np.float32)
    var = rng.random(C).astype(np.float32) + 0.5
    w = rng.standard_normal(C).astype(np.float32)
    b = rng.standard_normal(C).astype(np.float32)
    scale, shift = batch_norm_affine(
        jnp.asarray(mean), jnp.asarray(var), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    x = rng.standard_normal((1, 4, 4, C)).astype(np.float32)
    got = x * np.asarray(scale) + np.asarray(shift)
    bn = torch.nn.BatchNorm2d(C, eps=1e-5)
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
        bn.weight.copy_(torch.from_numpy(w))
        bn.bias.copy_(torch.from_numpy(b))
        bn.eval()
        ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-5)
