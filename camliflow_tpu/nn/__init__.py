"""Neural building blocks (flax.linen, channel-last)."""

from .clfm import CLFM, FusionAwareInterp, AddFusion, ConcatFusion, GatedFusion, SKFusion
from .layers import MLP, Conv2dNormAct, DenseNormAct, InstanceNorm, Norm, apply_act
from .point_conv import PointConv, PointConvDW
from .resnet import ResNetEncoder2D

__all__ = [
    "AddFusion",
    "CLFM",
    "ConcatFusion",
    "Conv2dNormAct",
    "DenseNormAct",
    "FusionAwareInterp",
    "GatedFusion",
    "InstanceNorm",
    "MLP",
    "Norm",
    "PointConv",
    "PointConvDW",
    "ResNetEncoder2D",
    "SKFusion",
    "apply_act",
]
