"""Stable Diffusion safety checker (CLIP-based NSFW screen).

The reference filters every saved sample through diffusers'
``StableDiffusionSafetyChecker`` + ``AutoFeatureExtractor`` loaded from
``CompVis/stable-diffusion-safety-checker`` (reference:
stable-diffusion/utils.py:16-19,94-100), and blacks out / replaces
flagged images before watermarking (reference:
stable-diffusion/runners/base_runner.py:87-93).

TPU-native split:
  * ``safety_head`` — the checker's decision math (cosine similarity of
    projected CLIP image embeddings against "concept" and "special
    care" embeddings with per-concept thresholds and the 0.01
    special-care adjustment) as a pure function, testable without
    weights.
  * ``preprocess_images`` — the CLIP feature-extractor transform
    (resize 224 bicubic + CLIP mean/std normalize) in jax.
  * ``SafetyChecker`` — the full pipeline, gated on a *local* snapshot
    of the safety-checker weights (no network egress here): the CLIP
    vision trunk runs as Flax on the TPU, the head weights come from
    the torch state dict via ``convert_safety_head``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def cosine_similarity(image_embeds: jnp.ndarray,
                      concept_embeds: jnp.ndarray) -> jnp.ndarray:
    """[B, D] x [C, D] -> [B, C] cosine similarity (diffusers calls this
    ``cosine_distance`` but computes similarity)."""
    a = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    b = concept_embeds / jnp.linalg.norm(concept_embeds, axis=-1,
                                         keepdims=True)
    return a @ b.T


def safety_head(image_embeds: jnp.ndarray,
                concept_embeds: jnp.ndarray,
                concept_thresholds: jnp.ndarray,
                special_embeds: jnp.ndarray,
                special_thresholds: jnp.ndarray) -> np.ndarray:
    """Return a [B] bool array: True where the image trips any concept.

    Mirrors the torch checker's forward: special-care cosine scores are
    thresholded first; if any special concept fires for an image, every
    nsfw-concept threshold for that image is lowered by 0.01
    (the checker's ``adjustment``). Scores are rounded to 3 decimals
    before comparison, as upstream does.
    """
    special_scores = jnp.round(
        cosine_similarity(image_embeds, special_embeds)
        - special_thresholds[None, :], 3)
    special_care = jnp.any(special_scores > 0, axis=1)
    adjustment = jnp.where(special_care, 0.01, 0.0)[:, None]
    concept_scores = jnp.round(
        cosine_similarity(image_embeds, concept_embeds)
        - concept_thresholds[None, :] + adjustment, 3)
    return np.asarray(jnp.any(concept_scores > 0, axis=1))


def preprocess_images(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[B, H, W, 3] floats in [0, 1] -> CLIP pixel_values [B, size, size, 3].

    Shortest-edge bicubic resize to ``size`` then center crop, matching
    the CLIP AutoFeatureExtractor the reference's safety checker runs
    (a direct aspect-distorting resize would flip safety decisions for
    non-square outputs, e.g. ``--H 512 --W 768``), then CLIP normalize."""
    import jax

    x = jnp.asarray(images, jnp.float32)
    B, H, W, C = x.shape
    if H != size or W != size:
        if H <= W:
            nh, nw = size, max(int(round(W * size / H)), size)
        else:
            nh, nw = max(int(round(H * size / W)), size), size
        x = jax.image.resize(x, (B, nh, nw, C), method="bicubic")
        r0 = (nh - size) // 2
        c0 = (nw - size) // 2
        x = x[:, r0 : r0 + size, c0 : c0 + size, :]
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def convert_safety_head(torch_state_dict) -> dict:
    """Extract the head weights from a torch
    ``StableDiffusionSafetyChecker`` state dict: the registered buffers
    ``concept_embeds``/``special_care_embeds`` (+ ``*_weights``
    thresholds) and the ``visual_projection`` linear (no bias)."""
    def get(k):
        v = torch_state_dict[k]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    return {
        "concept_embeds": get("concept_embeds"),
        "concept_thresholds": get("concept_embeds_weights"),
        "special_embeds": get("special_care_embeds"),
        "special_thresholds": get("special_care_embeds_weights"),
        "visual_projection": get("visual_projection.weight").T,  # [D, P]
    }


class SafetyChecker:
    """End-to-end checker. ``vision_fn`` maps preprocessed pixel values
    [B, 224, 224, 3] -> pooled CLIP features [B, D]; injectable for
    tests, loaded from a local torch safety-checker snapshot otherwise."""

    def __init__(self, head_params: dict, vision_fn=None,
                 model_path: Optional[str] = None):
        self.head = {k: jnp.asarray(v) for k, v in head_params.items()}
        if vision_fn is None:
            vision_fn = _load_flax_clip_vision(model_path)
        self.vision_fn = vision_fn

    @classmethod
    def from_pretrained(cls, model_path: str) -> "SafetyChecker":
        """Load from a local ``CompVis/stable-diffusion-safety-checker``
        snapshot (pytorch_model.bin + config.json)."""
        import os

        import torch

        bin_path = os.path.join(model_path, "pytorch_model.bin")
        sd = torch.load(bin_path, map_location="cpu")
        return cls(convert_safety_head(sd), model_path=model_path)

    def __call__(self, images: np.ndarray
                 ) -> Tuple[np.ndarray, List[bool]]:
        """images: [B, H, W, 3] floats in [0, 1]. Returns (checked,
        has_nsfw): flagged images are zeroed (the reference substitutes
        a replacement asset when present, else keeps the image with a
        warning; we black out, the diffusers default)."""
        pixel_values = preprocess_images(images)
        pooled = self.vision_fn(pixel_values)
        image_embeds = pooled @ self.head["visual_projection"]
        nsfw = safety_head(
            image_embeds, self.head["concept_embeds"],
            self.head["concept_thresholds"], self.head["special_embeds"],
            self.head["special_thresholds"])
        checked = np.asarray(images).copy()
        checked[nsfw] = 0.0
        return checked, [bool(b) for b in nsfw]


def _load_flax_clip_vision(model_path: Optional[str]):
    """Build the pooled-feature function from a local torch safety
    checker snapshot's ``vision_model.*`` weights."""
    if model_path is None:
        raise FileNotFoundError(
            "safety checker weights required: pass a local "
            "CompVis/stable-diffusion-safety-checker snapshot path "
            "(no network egress in this environment)")
    import os

    import torch
    from transformers import CLIPVisionConfig, FlaxCLIPVisionModel
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax)

    sd = torch.load(os.path.join(model_path, "pytorch_model.bin"),
                    map_location="cpu")
    prefix = "vision_model."
    pt = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    config = CLIPVisionConfig.from_pretrained(model_path)
    model = FlaxCLIPVisionModel(config, _do_init=True)
    model.params = convert_pytorch_state_dict_to_flax(
        {f"vision_model.{k}": v for k, v in pt.items()}, model)

    def vision_fn(pixel_values):
        # transformers' flax CLIP expects NCHW pixel_values
        out = model(pixel_values=jnp.transpose(pixel_values, (0, 3, 1, 2)))
        return out.pooler_output

    return vision_fn
