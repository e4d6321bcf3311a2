from .resnet import ResNet
from .fpn import FPN
from .neck3d import FastIndoorImVoxelNeck
from .heads import ScanNetImVoxelHeadV2
from .nerf_mlp import VanillaNeRFRadianceField
from . import losses

__all__ = [
    "ResNet",
    "FPN",
    "FastIndoorImVoxelNeck",
    "ScanNetImVoxelHeadV2",
    "VanillaNeRFRadianceField",
    "losses",
]
