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


def test_get_metric_cli_end_to_end(tmp_path, capsys, rng, monkeypatch):
    """The quality harness dry-run: one CLI per metric on synthetic data
    emits a number end-to-end (reference: diffusion/get_metric.py +
    gaugan/get_metric.py). FID/LPIPS run on untrained backbones — the
    numbers are meaningless but the full pipeline (load -> features ->
    statistics -> scalar) is exercised; with local weight files the same
    commands produce the real metrics."""
    import sys

    from sige_tpu.cli import get_metric
    from sige_tpu.data import save_image

    root, gt = tmp_path / "results", tmp_path / "gt"
    masks = tmp_path / "masks"
    seg_root, seg_gt = tmp_path / "seg", tmp_path / "seg_gt"
    for d in (root, gt, masks, seg_root, seg_gt):
        d.mkdir()
    for i in range(3):
        img = rng.random((32, 32, 3)).astype(np.float32)
        save_image(str(root / f"im{i}.png"), img)
        save_image(str(gt / f"im{i}.png"),
                   np.clip(img + 0.02 * rng.standard_normal(img.shape), 0, 1))
        m = np.zeros((32, 32), bool)
        m[4:20, 8:24] = True
        np.save(masks / f"im{i}.npy", m)
        np.save(seg_root / f"seg{i}.npy", rng.integers(0, 34, (32, 32)))
        np.save(seg_gt / f"seg{i}.npy", rng.integers(0, 34, (32, 32)))

    def run(*argv):
        monkeypatch.setattr(sys, "argv", ["get_metric", *argv])
        get_metric.main()
        return capsys.readouterr().out

    out = run("--metric", "psnr", "--root", str(root), "--gt_root", str(gt),
              "--mask_root", str(masks))
    assert "PSNR:" in out and "over 3 images" in out
    out = run("--metric", "lpips", "--root", str(root), "--gt_root", str(gt))
    assert "LPIPS:" in out
    out = run("--metric", "fid", "--root", str(root), "--gt_root", str(gt))
    assert "FID:" in out and np.isfinite(float(out.split("FID:")[1]))
    out = run("--metric", "miou", "--root", str(seg_root),
              "--gt_root", str(seg_gt))
    assert "mIoU:" in out and "over 3 maps" in out
