"""FID: Frechet distance between Gaussian fits of feature distributions
(reference: diffusion/metrics/fid_score.py wraps clean-fid; here the
statistics are self-contained and the feature extractor is pluggable —
pass any callable images -> [N, D] features, e.g. a torchvision
InceptionV3 restored from a local weights file)."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def gaussian_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an [N, D] feature matrix."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix via eigh."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = |mu1 - mu2|^2 + Tr(s1 + s2 - 2 sqrt(s1 s2))."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    # sqrt(s1 s2) computed via the symmetric form sqrt(sqrt(s1) s2 sqrt(s1))
    s1_half = _sqrtm_psd(sigma1 + eps * np.eye(sigma1.shape[0]))
    covmean = _sqrtm_psd(s1_half @ sigma2 @ s1_half)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def compute_fid(
    images_a: np.ndarray,
    images_b: np.ndarray,
    feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    batch_size: int = 32,
) -> float:
    """FID between two image sets using ``feature_fn`` (defaults to a local
    torchvision InceptionV3 if its weights are available)."""
    if feature_fn is None:
        feature_fn = make_inception_feature_fn()

    def feats(images):
        out = []
        for i in range(0, len(images), batch_size):
            out.append(np.asarray(feature_fn(images[i : i + batch_size])))
        return np.concatenate(out, axis=0)

    mu1, s1 = gaussian_stats(feats(images_a))
    mu2, s2 = gaussian_stats(feats(images_b))
    return frechet_distance(mu1, s1, mu2, s2)


def make_inception_feature_fn(weights_path: Optional[str] = None):
    """InceptionV3 pool3 features via the Flax backbone
    (:class:`sige_tpu.metrics.backbones.FIDInception`). Requires local
    weights — this environment has no network egress; pass
    ``weights_path`` to a locally stored torchvision ``inception_v3``
    state dict."""
    import torch

    from .backbones import FIDInception

    if weights_path is None:
        # UNTRAINED backbone: the FID number is meaningless, but the full
        # pipeline (features -> gaussian stats -> Frechet distance) runs —
        # the dry-run mode cli/get_metric.py uses when no weights exist
        return FIDInception(None)
    sd = torch.load(weights_path, map_location="cpu")
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return FIDInception(sd)
