"""Metric feature backbones (Flax) + torch-state-dict converters.

No network egress here: weights come from local copies of the public
checkpoints (torchvision alexnet/inception_v3, lpips alex.pth,
drn-d-105_ms_cityscapes.pth)."""

from .alexnet import AlexNetFeatures, LPIPSAlex, convert_alexnet, convert_lpips_lins
from .drn import CityscapesSegmenter, DRNSeg, convert_drn_seg
from .inception import FIDInception, InceptionV3Features, convert_inception_v3

__all__ = [
    "AlexNetFeatures", "LPIPSAlex", "convert_alexnet", "convert_lpips_lins",
    "InceptionV3Features", "FIDInception", "convert_inception_v3",
    "DRNSeg", "CityscapesSegmenter", "convert_drn_seg",
]
