"""Data layer: datasets, augmentation, codecs, loader."""

from . import io
from .augmentation import joint_augmentation
from .datasets import (
    FlyingThings3D,
    KITTI,
    KITTITest,
    Sintel,
    dataset_factory,
    depth2pc,
)
from .loader import DataLoader, collate

__all__ = [
    "DataLoader",
    "FlyingThings3D",
    "KITTI",
    "KITTITest",
    "Sintel",
    "collate",
    "dataset_factory",
    "depth2pc",
    "io",
    "joint_augmentation",
]
