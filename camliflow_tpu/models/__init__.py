"""Model families: CamLiRAFT, CamLiPWC, RAFT, PWC, and LiDAR-only variants."""

from . import losses, metrics
from .factory import ModelSpec, model_factory, optimizer_factory

__all__ = ["ModelSpec", "losses", "metrics", "model_factory", "optimizer_factory"]
