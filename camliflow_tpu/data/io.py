"""File-format codecs and geometry lifting (pure NumPy / OpenCV, host-side).

Reference semantics: utils.py:182-360 — PFM, Middlebury .flo, KITTI 16-bit
flow/disparity PNGs, KITTI calibration files, zero-padding, disparity->point
cloud lifting, numpy camera projection.
"""

from __future__ import annotations

import re
from pathlib import Path

import cv2
import numpy as np


def load_pfm(path: str | Path) -> np.ndarray:
    """Load a PFM image (utils.py:182-209). Returns [H, W] or [H, W, 3] f32."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"Not a PFM file: {path}")
        dim_match = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dim_match:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dim_match.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    # PFM stores bottom-to-top
    return np.flipud(data.reshape(shape)).copy()


def save_pfm(path: str | Path, image: np.ndarray, scale: float = 1.0) -> None:
    image = np.flipud(image).astype(np.float32)
    color = image.ndim == 3 and image.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(b"%d %d\n" % (image.shape[1], image.shape[0]))
        if image.dtype.byteorder == "<" or (
            image.dtype.byteorder == "=" and np.little_endian
        ):
            scale = -scale
        f.write(b"%f\n" % scale)
        image.tofile(f)


def load_flow(path: str | Path) -> np.ndarray:
    """Load a Middlebury .flo file (utils.py:212-222). Returns [H, W, 2] f32."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if len(magic) == 0 or magic[0] != 202021.25:
            raise ValueError(f"Invalid .flo file: {path}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def save_flow(path: str | Path, flow: np.ndarray) -> None:
    """Save a Middlebury .flo file (utils.py:225-245 semantics)."""
    assert flow.ndim == 3 and flow.shape[2] == 2
    with open(path, "wb") as f:
        np.float32(202021.25).tofile(f)
        np.int32(flow.shape[1]).tofile(f)
        np.int32(flow.shape[0]).tofile(f)
        flow.astype(np.float32).tofile(f)


def load_flow_png(path: str | Path, scale: float = 64.0):
    """Load a KITTI 16-bit flow PNG (utils.py:223-233 semantics).

    Stored channel layout (as read by cv2, BGR): ch0 = validity, ch1 = v,
    ch2 = u; flow = (value - 32768) / scale. Returns (flow [H, W, 2] f32 as
    (u, v), valid_mask [H, W] bool).
    """
    flow_img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    flow = flow_img[:, :, 2:0:-1].astype(np.float32)  # (u, v)
    mask = flow_img[:, :, 0] > 0
    flow = (flow - 32768.0) / scale
    return flow, mask


def save_flow_png(path: str | Path, flow: np.ndarray, mask=None, scale: float = 64.0):
    """Save a KITTI 16-bit flow PNG (utils.py:248-266 semantics)."""
    assert flow.shape[2] == 2
    assert np.abs(flow).max() < 32767.0 / scale
    flow = flow * scale + 32768.0
    if mask is None:
        mask = np.ones_like(flow)[..., 0]
    else:
        mask = np.float32(mask > 0)
    flow_img = np.concatenate(
        [mask[..., None], flow[..., 1:2], flow[..., 0:1]], axis=-1
    ).astype(np.uint16)
    cv2.imwrite(str(path), flow_img)


def load_disp_png(path: str | Path):
    """Load a KITTI 16-bit disparity PNG (utils.py:268-275 semantics).

    Returns (disp [H, W] f32, valid_mask [H, W]). disp = value / 256; 0 means
    invalid.
    """
    array = cv2.imread(str(path), cv2.IMREAD_UNCHANGED).astype(np.float32)
    valid_mask = array > 0
    disp = array / 256.0
    disp[~valid_mask] = -1.0
    return disp, valid_mask


def save_disp_png(path: str | Path, disp: np.ndarray, mask=None):
    if mask is None:
        mask = disp > 0
    disp = np.clip(disp * 256.0, 0, 65535).astype(np.uint16)
    disp[~mask] = 0
    cv2.imwrite(str(path), disp)


def load_calib(path: str | Path) -> np.ndarray:
    """Parse a KITTI calib file, returning the P_rect_02 3x4 matrix
    (utils.py:284-297 semantics)."""
    with open(path) as f:
        for line in f.readlines():
            if line.startswith("P_rect_02") or line.startswith("P2:"):
                values = line.split()[1:]
                return np.array(values, dtype=np.float32).reshape(3, 4)
    raise ValueError(f"No P_rect_02 / P2 entry in {path}")


def zero_padding(array: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Zero-pad bottom/right to a fixed shape (utils.py:300-316 semantics:
    image content sits at the top-left)."""
    h, w = array.shape[:2]
    assert h <= target_h and w <= target_w
    out = np.zeros((target_h, target_w) + array.shape[2:], dtype=array.dtype)
    out[:h, :w] = array
    return out


def disp2pc(
    disp: np.ndarray,
    baseline: float,
    f: float,
    cx: float,
    cy: float,
    flow: np.ndarray | None = None,
) -> np.ndarray:
    """Lift a disparity map to a 3D point cloud (utils.py:319-339 semantics).

    Args:
      disp: [H, W] disparity; non-positive means invalid (z <= 0 downstream).
      baseline: stereo baseline in meters.
      f, cx, cy: intrinsics.
      flow: optional [H, W, 2] optical flow added to the pixel grid before
        unprojection (used to build pc2 from frame-1 disparity + flow).
    Returns:
      [H, W, 3] points; invalid entries have z <= 0.
    """
    height, width = disp.shape
    depth = baseline * f / (disp + 1e-5)

    xs = np.tile(np.arange(width, dtype=np.float32)[None, :], (height, 1))
    ys = np.tile(np.arange(height, dtype=np.float32)[:, None], (1, width))
    if flow is not None:
        xs = xs + flow[:, :, 0]
        ys = ys + flow[:, :, 1]

    pc_x = (xs - cx) * depth / f
    pc_y = (ys - cy) * depth / f
    return np.stack([pc_x, pc_y, depth], axis=-1)


def project_pc2image_np(pc: np.ndarray, image_h, image_w, f, cx=None, cy=None, clip=True):
    """Project [N, 3] points to pixel coords (utils.py:342-360 semantics)."""
    assert pc.shape[1] == 3
    cx = (image_w - 1) / 2 if cx is None else cx
    cy = (image_h - 1) / 2 if cy is None else cy
    pc_x, pc_y, depth = pc[:, 0], pc[:, 1], pc[:, 2]
    image_x = cx + (f / depth) * pc_x
    image_y = cy + (f / depth) * pc_y
    if clip:
        image_x = np.clip(image_x, a_min=0, a_max=image_w - 1)
        image_y = np.clip(image_y, a_min=0, a_max=image_h - 1)
    return np.stack([image_x, image_y], axis=-1)
