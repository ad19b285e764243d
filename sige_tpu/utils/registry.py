"""Pretrained-checkpoint registry: names, md5 checksums, and mirrors.

Metadata matches the reference's download helpers
(reference: diffusion/download_helper.py:8-20,
gaugan/download_helper.py:8-22, stable-diffusion README sd-v1-4). This
environment has no network egress, so :func:`fetch` only resolves/verifies
local files; the URLs document where a user obtains them.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict

from .convert import md5_file


@dataclasses.dataclass(frozen=True)
class CheckpointSpec:
    name: str
    md5: str
    url: str
    converter: str  # dotted path of the state-dict -> flax converter


_BASE_DIFFUSION = "https://www.cs.cmu.edu/~sige/resources/models/diffusion"
_BASE_GAUGAN = "https://www.cs.cmu.edu/~sige/resources/models/gaugan"

REGISTRY: Dict[str, CheckpointSpec] = {
    spec.name: spec
    for spec in [
        CheckpointSpec(
            "church256-ddpm-fused_unet.pth",
            "fb3e26e5e6be812d6bed5c48e5265506",
            f"{_BASE_DIFFUSION}/church256-ddpm-fused_unet.pth",
            "sige_tpu.utils.convert.convert_ddpm_fused_unet",
        ),
        CheckpointSpec(
            "church256-ddpm-unet.pth",
            "8fbd43a27e98e64b56453faca9be619e",
            f"{_BASE_DIFFUSION}/church256-ddpm-unet.pth",
            "sige_tpu.utils.convert.convert_ddpm_vanilla_unet",
        ),
        CheckpointSpec(
            "church128-pd-unet.pth",
            "8a2690eb25d1e2b5367e9574d7b73822",
            f"{_BASE_DIFFUSION}/church128-pd-unet.pth",
            "sige_tpu.utils.convert.convert_pd_unet",
        ),
        CheckpointSpec(
            "spade.pth",
            "21b8b5b29295b7208ba5cb48d818a367",
            f"{_BASE_GAUGAN}/spade.pth",
            "sige_tpu.utils.convert.convert_gaugan_spade",
        ),
        CheckpointSpec(
            "fused_spade.pth",
            "216677f8fe9e0c6564e3f17cbe55c695",
            f"{_BASE_GAUGAN}/fused_spade.pth",
            "sige_tpu.utils.convert.convert_gaugan_fused_spade",
        ),
        CheckpointSpec(
            "sub_mobile_spade-32_32_32_48_32_24_24_32.pth",
            "2f8373ff0433badbea664da90709ca3c",
            f"{_BASE_GAUGAN}/sub_mobile_spade-32_32_32_48_32_24_24_32.pth",
            "sige_tpu.utils.convert.convert_gaugan_sub_mobile_spade",
        ),
        CheckpointSpec(
            "fused_sub_mobile_spade-32_32_32_48_32_24_24_32.pth",
            "530ff557d614df1378d0613f7a0865dc",
            f"{_BASE_GAUGAN}/fused_sub_mobile_spade-32_32_32_48_32_24_24_32.pth",
            "sige_tpu.utils.convert.convert_gaugan_sub_mobile_spade",
        ),
    ]
}


def fetch(name: str, root: str = "pretrained", verify: bool = True) -> str:
    """Resolve a registered checkpoint to a local path, verifying its md5
    (the reference re-downloads on mismatch; here we raise with the URL)."""
    spec = REGISTRY[name]
    path = os.path.join(root, name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {name} not found at {path}; download it from "
            f"{spec.url} (no network egress in this environment)")
    if verify:
        got = md5_file(path)
        if got != spec.md5:
            raise ValueError(
                f"md5 mismatch for {path}: {got} != {spec.md5}; re-download "
                f"from {spec.url}")
    return path
