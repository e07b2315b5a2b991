"""2D image-space ops: mesh grid, backwarp, convex upsampling, flow resizing,
input padding. NHWC throughout.

Reference semantics: models/utils.py:7-20 (InputPadder), 162-173 (mesh_grid),
176-188 (backwarp_2d), 191-204 (convex_upsample), 207-231 (resize_flow2d /
resize_to_64x).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .gridsample import grid_sample_pixel, resize_bilinear_align_corners


def mesh_grid(batch: int, height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Pixel-coordinate grid, [B, H, W, 2] as (x, y)."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    grid_x, grid_y = jnp.meshgrid(xs, ys)
    grid = jnp.stack([grid_x, grid_y], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, height, width, 2))


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def backwarp_2d(x: jax.Array, flow12: jax.Array, padding_mode: str) -> jax.Array:
    """Warp image `x` backward by flow (sample frame-2 features at p + flow).

    Args:
      x: [B, H, W, C] features of frame 2.
      flow12: [B, H, W, 2] flow from frame 1 to frame 2.
      padding_mode: 'zeros' or 'border'.
    Returns:
      [B, H, W, C] warped features.
    """
    batch, height, width, _ = x.shape
    grid = mesh_grid(batch, height, width) + flow12.astype(jnp.float32)
    return grid_sample_pixel(x, grid, padding_mode=padding_mode)


@functools.partial(jax.jit, static_argnames=("scale_factor",))
def convex_upsample(flow: jax.Array, mask: jax.Array, scale_factor: int = 8) -> jax.Array:
    """RAFT-style convex-combination upsampling.

    Args:
      flow: [B, h, w, 2] coarse flow.
      mask: [B, h, w, 9 * s * s] logits; channel c = k*s*s + iy*s + ix where k
        is the 3x3 neighbour (row-major), (iy, ix) the sub-pixel offset.
      scale_factor: s.
    Returns:
      [B, h*s, w*s, 2] upsampled flow (already rescaled by s).
    """
    batch, h, w, _ = flow.shape
    s = scale_factor
    mask = mask.reshape(batch, h, w, 9, s, s).astype(jnp.float32)
    mask = jax.nn.softmax(mask, axis=3)

    flow = flow.astype(jnp.float32) * s
    padded = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighbourhood, row-major (dy-major) to match torch `unfold`.
    neighbors = jnp.stack(
        [
            padded[:, dy : dy + h, dx : dx + w, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # [B, h, w, 9, 2]

    up = jnp.einsum("bhwkyx,bhwkc->bhwyxc", mask, neighbors)  # [B, h, w, s, s, 2]
    up = up.transpose(0, 1, 3, 2, 4, 5)  # [B, h, s, w, s, 2]
    return up.reshape(batch, h * s, w * s, 2)


@functools.partial(jax.jit, static_argnames=("target_h", "target_w"))
def resize_flow2d(flow: jax.Array, target_h: int, target_w: int) -> jax.Array:
    """Bilinear-resize a flow field and rescale its magnitudes."""
    origin_h, origin_w = flow.shape[1:3]
    if (target_h, target_w) == (origin_h, origin_w):
        return flow
    flow = resize_bilinear_align_corners(flow, target_h, target_w)
    scale = jnp.array(
        [target_w / origin_w, target_h / origin_h], dtype=flow.dtype
    )
    return flow * scale


def resize_to_multiple(
    inputs: jax.Array, target: jax.Array | None, x: int = 64
) -> tuple[jax.Array, jax.Array | None]:
    """Bilinear-resize image (and optional flow target) up to a multiple of x."""
    _, h, w, _ = inputs.shape
    if h % x == 0 and w % x == 0:
        return inputs, target
    resized_h, resized_w = ((h + x - 1) // x) * x, ((w + x - 1) // x) * x
    inputs = resize_bilinear_align_corners(inputs, resized_h, resized_w)
    if target is not None:
        target = resize_bilinear_align_corners(target, resized_h, resized_w)
        scale = jnp.array([resized_w / w, resized_h / h], dtype=target.dtype)
        target = target * scale
    return inputs, target


class InputPadder:
    """Replicate-pad images so H and W are multiples of `x`.

    Pads (left, right) = split of pad_wd, (top, bottom) = (0, pad_ht), matching
    the reference exactly: models/utils.py:7-20. Operates on NHWC.
    """

    def __init__(self, dims, x: int = 8):
        self.ht, self.wd = dims[1:3]
        pad_ht = (((self.ht // x) + 1) * x - self.ht) % x
        pad_wd = (((self.wd // x) + 1) * x - self.wd) % x
        # (left, right, top, bottom)
        self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht)

    def pad(self, *inputs):
        left, right, top, bottom = self._pad
        return [
            jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="edge")
            for x in inputs
        ]

    def unpad(self, x):
        left, right, top, bottom = self._pad
        ht, wd = x.shape[1:3]
        return x[:, top : ht - bottom, left : wd - right, :]
