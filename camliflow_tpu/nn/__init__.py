"""Neural building blocks (flax.linen, channel-last)."""

from .clfm import (
    CLFM,
    AddFusion,
    ConcatFusion,
    FusionAwareInterp,
    FusionAwareInterpCVPR,
    GatedFusion,
    SKFusion,
    fusion_interp_cache,
)
from .layers import MLP, Conv2dNormAct, DenseNormAct, InstanceNorm, Norm, apply_act
from .point_conv import PointConv, PointConvDW, PointNet2, paired_dw_conv
from .resnet import ResNetEncoder2D

__all__ = [
    "AddFusion",
    "CLFM",
    "ConcatFusion",
    "Conv2dNormAct",
    "DenseNormAct",
    "FusionAwareInterp",
    "FusionAwareInterpCVPR",
    "fusion_interp_cache",
    "GatedFusion",
    "InstanceNorm",
    "MLP",
    "Norm",
    "PointConv",
    "PointConvDW",
    "paired_dw_conv",
    "PointNet2",
    "ResNetEncoder2D",
    "SKFusion",
    "apply_act",
]
