"""Frozen CLIP text encoder for Stable Diffusion conditioning.

The reference wraps HF transformers' torch CLIPTextModel
(reference: stable-diffusion/ldm/modules/encoders/modules.py
FrozenCLIPEmbedder); here the Flax variant runs natively on the TPU.
Weights must be local (no network egress in this environment) — point
``model_path`` at a downloaded ``openai/clip-vit-large-patch14`` snapshot.
"""

from __future__ import annotations

from typing import List, Union

import jax.numpy as jnp


class FrozenCLIPEmbedder:
    """text -> [B, 77, 768] embeddings (reference semantics: padded to
    max_length 77, last_hidden_state)."""

    def __init__(self, model_path: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77):
        from transformers import CLIPTokenizer, FlaxCLIPTextModel

        try:
            self.tokenizer = CLIPTokenizer.from_pretrained(
                model_path, local_files_only=True)
            self.model = FlaxCLIPTextModel.from_pretrained(
                model_path, local_files_only=True)
        except Exception as e:  # pragma: no cover - depends on local files
            raise FileNotFoundError(
                f"CLIP weights not found at {model_path}; download "
                "openai/clip-vit-large-patch14 locally (no network egress "
                "here) and pass its path") from e
        self.max_length = max_length

    def __call__(self, text: Union[str, List[str]]) -> jnp.ndarray:
        if isinstance(text, str):
            text = [text]
        batch = self.tokenizer(
            text, truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np")
        out = self.model(input_ids=batch["input_ids"])
        return jnp.asarray(out.last_hidden_state)
