"""Flow visualisation helpers (demo.py:17-31 semantics)."""

from __future__ import annotations

import cv2
import numpy as np


def viz_optical_flow(flow: np.ndarray, max_flow: float = 512) -> np.ndarray:
    """HSV colour-wheel visualisation of a [H, W, 2] flow field -> RGB uint8."""
    n = 8
    u, v = flow[:, :, 0], flow[:, :, 1]
    mag = np.sqrt(np.square(u) + np.square(v))
    angle = np.arctan2(v, u)
    image_h = np.mod(angle / (2 * np.pi) + 1, 1)
    image_s = np.clip(mag * n / max_flow, a_min=0, a_max=1)
    image_v = np.ones_like(image_s)
    image_hsv = np.stack([image_h, image_s, image_v], axis=2)
    image_hsv = (image_hsv * 255).astype(np.uint8)
    return cv2.cvtColor(image_hsv, cv2.COLOR_HSV2RGB)
