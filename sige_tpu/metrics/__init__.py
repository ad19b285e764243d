"""Quality metrics: PSNR, LPIPS, FID, mIoU.

Mirrors the reference's metric harnesses (reference: diffusion/metrics/,
gaugan/metrics/). PSNR and the FID/mIoU statistics are self-contained;
LPIPS and the FID Inception features need pretrained weights, which are
loaded from a user-supplied path (this environment has no network egress).
"""

from .lpips import LPIPS, lpips_from_features
from .fid import compute_fid, frechet_distance, gaussian_stats
from .miou import CITYSCAPES_ID_TO_TRAIN_ID, confusion_matrix, mean_iou, to_train_ids
from .psnr import psnr

__all__ = [
    "psnr",
    "LPIPS",
    "lpips_from_features",
    "gaussian_stats",
    "frechet_distance",
    "compute_fid",
    "confusion_matrix",
    "mean_iou",
    "CITYSCAPES_ID_TO_TRAIN_ID",
    "to_train_ids",
]
