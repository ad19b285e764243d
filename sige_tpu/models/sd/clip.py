"""Frozen CLIP text encoder for Stable Diffusion conditioning.

The reference wraps HF transformers' torch CLIPTextModel
(reference: stable-diffusion/ldm/modules/encoders/modules.py
FrozenCLIPEmbedder); here the Flax variant runs natively on the TPU.

Weight sources (no network egress in this environment):
  * a local ``openai/clip-vit-large-patch14`` snapshot (``model_path``), or
  * the ``cond_stage_model.transformer.*`` weights inside an sd-v1-4
    checkpoint (``sd_state_dict``) — then only the tokenizer files need a
    local snapshot.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np


def _model_from_sd_state_dict(sd_state_dict, dtype):
    """Build a FlaxCLIPTextModel from the CLIP weights embedded in an LDM
    checkpoint (keys ``cond_stage_model.transformer.*``; reference:
    stable-diffusion/utils.py:22-39 loads them into torch CLIPTextModel)."""
    import torch
    from transformers import CLIPTextConfig, FlaxCLIPTextModel
    from transformers.modeling_flax_pytorch_utils import (
        convert_pytorch_state_dict_to_flax)

    prefix = "cond_stage_model.transformer."
    pt = {k[len(prefix):]: torch.as_tensor(np.asarray(v))
          for k, v in sd_state_dict.items() if k.startswith(prefix)}
    if not pt:
        raise ValueError("no cond_stage_model.transformer.* keys found")
    # sd-v1 ships clip-vit-large-patch14 text dims
    config = CLIPTextConfig(
        hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12, max_position_embeddings=77,
        vocab_size=49408)
    model = FlaxCLIPTextModel(config, dtype=dtype, _do_init=True)
    model.params = convert_pytorch_state_dict_to_flax(pt, model)
    return model


class FrozenCLIPEmbedder:
    """text -> [B, 77, 768] embeddings (reference semantics: padded to
    max_length 77, last_hidden_state).

    ``tokenizer`` / ``model`` are injectable for testing; by default they
    load from ``model_path`` (and ``sd_state_dict`` for the model)."""

    def __init__(self, model_path: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77, sd_state_dict=None,
                 tokenizer=None, model=None, dtype=jnp.float32):
        self.max_length = max_length
        self.tokenizer = tokenizer
        self.model = model
        if self.tokenizer is None:
            from transformers import CLIPTokenizer

            try:
                self.tokenizer = CLIPTokenizer.from_pretrained(
                    model_path, local_files_only=True)
            except Exception as e:  # pragma: no cover - needs local files
                raise FileNotFoundError(
                    f"CLIP tokenizer not found at {model_path}; download "
                    "openai/clip-vit-large-patch14 locally (no network "
                    "egress here) and pass its path") from e
        if self.model is None:
            if sd_state_dict is not None:
                self.model = _model_from_sd_state_dict(sd_state_dict, dtype)
            else:
                from transformers import FlaxCLIPTextModel

                try:
                    self.model = FlaxCLIPTextModel.from_pretrained(
                        model_path, local_files_only=True, dtype=dtype)
                except Exception as e:  # pragma: no cover
                    raise FileNotFoundError(
                        f"CLIP weights not found at {model_path}; download "
                        "them locally or pass sd_state_dict") from e

    def __call__(self, text: Union[str, List[str]]) -> jnp.ndarray:
        if isinstance(text, str):
            text = [text]
        batch = self.tokenizer(
            text, truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np")
        ids = np.asarray(batch["input_ids"])
        if ids.shape[1] != self.max_length:  # stub tokenizers may underpad
            pad = np.zeros((ids.shape[0], self.max_length - ids.shape[1]),
                           ids.dtype)
            ids = np.concatenate([ids, pad], axis=1)
        out = self.model(input_ids=ids)
        return jnp.asarray(out.last_hidden_state)


def encode_prompts(prompts: List[str],
                   model_path: str = "openai/clip-vit-large-patch14",
                   sd_state_dict=None,
                   embedder: Optional[FrozenCLIPEmbedder] = None):
    """Encode a list of prompts; returns [len(prompts), 77, 768]. The CLI
    uses ``encode_prompts(["", prompt])`` for (uc, c) CFG conditioning
    (reference: stable-diffusion/run.py prompt handling)."""
    if embedder is None:
        embedder = FrozenCLIPEmbedder(model_path=model_path,
                                      sd_state_dict=sd_state_dict)
    return embedder(prompts)
