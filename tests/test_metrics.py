"""Metric tests: PSNR vs direct formula/skimage semantics, FID Gaussian
statistics, mIoU confusion math, LPIPS feature math."""

import numpy as np
import pytest

from sige_tpu.metrics import (
    confusion_matrix,
    frechet_distance,
    gaussian_stats,
    lpips_from_features,
    mean_iou,
    psnr,
    to_train_ids,
)


def test_psnr_basic(rng):
    a = rng.integers(0, 256, (16, 16, 3)).astype(np.float64)
    b = a + 4.0
    expect = 10 * np.log10(255**2 / 16.0)
    np.testing.assert_allclose(psnr(a, b), expect, rtol=1e-9)
    assert psnr(a, a) == float("inf")
    # mask restriction: error confined outside mask -> inf inside
    m = np.zeros((16, 16), bool)
    m[:4] = True
    b2 = a.copy()
    b2[8:] += 10
    assert psnr(a, b2, mask=m) == float("inf")


def test_frechet_distance_properties(rng):
    f1 = rng.standard_normal((500, 8))
    f2 = rng.standard_normal((500, 8)) + 1.0
    mu1, s1 = gaussian_stats(f1)
    mu2, s2 = gaussian_stats(f2)
    assert frechet_distance(mu1, s1, mu1, s1) < 1e-8
    d = frechet_distance(mu1, s1, mu2, s2)
    assert d > 0
    # identical distributions shifted by delta: d^2 ~ |delta|^2
    mu3 = mu1 + 3.0
    np.testing.assert_allclose(
        frechet_distance(mu1, s1, mu3, s1), 9.0 * 8, rtol=1e-6)


def test_miou(rng):
    gt = rng.integers(0, 19, (32, 32))
    conf = confusion_matrix(gt, gt)
    assert mean_iou(conf) == 1.0
    pred = (gt + 1) % 19
    assert mean_iou(confusion_matrix(pred, gt)) == 0.0
    # ignore label 255
    gt2 = gt.copy()
    gt2[:16] = 255
    conf2 = confusion_matrix(gt, gt2)
    assert conf2.sum() == 16 * 32
    # trainId mapping: road(7)->0, car(26)->13, void(0)->255
    ids = to_train_ids(np.array([[7, 26, 0]]))
    assert ids.tolist() == [[0, 13, 255]]


def test_lpips_feature_math(rng):
    feats_a = [rng.standard_normal((8, 8, 4)).astype(np.float32) for _ in range(3)]
    w = [np.abs(rng.standard_normal(4)).astype(np.float32) for _ in range(3)]
    assert lpips_from_features(feats_a, feats_a, w) == 0.0
    feats_b = [f + 1.0 for f in feats_a]
    d = lpips_from_features(feats_a, feats_b, w)
    assert d > 0
    # mask restriction changes the result
    m = np.zeros((8, 8), bool)
    m[:2, :2] = True
    dm = lpips_from_features(feats_a, feats_b, w, mask=m)
    assert dm != pytest.approx(d)
