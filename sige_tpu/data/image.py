"""Image IO (PIL-backed, NHWC float arrays)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def load_image(path: str, size=None, mult_of: int | None = None) -> np.ndarray:
    """Load an image to [H, W, 3] float32 in [0, 1]. ``mult_of`` crops to a
    multiple (the reference loads SD inputs at multiples of 32;
    reference: stable-diffusion/utils.py load_img)."""
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    if mult_of:
        H, W = arr.shape[:2]
        arr = arr[: H - H % mult_of or H, : W - W % mult_of or W]
    return arr


def save_image(path: str, arr: np.ndarray) -> None:
    """Save [H, W, 3] float in [0, 1] (or uint8) as PNG."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(a).save(path)
