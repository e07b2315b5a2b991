"""Bilinear grid sampling with PyTorch `grid_sample` parity (align_corners=True).

JAX has no grid_sample; this implements it as gather + lerp, which XLA fuses.
Needed in four places (reference: raft_core.py:96-107 corr lookup,
models/utils.py:176-188 backwarp_2d, models/utils.py:262-269 CLFM point
sampling, and bilinear resizes). Exact semantics matter for checkpoint parity.

All images are NHWC; coordinates are *pixel* coordinates (x, y) — callers do
any [-1, 1] normalisation themselves in the reference, which we skip entirely
and sample at pixel coords directly (the normalise/unnormalise round-trip with
align_corners=True is the identity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def grid_sample_pixel(
    image: jax.Array, coords: jax.Array, padding_mode: str = "zeros"
) -> jax.Array:
    """Bilinear sample `image` at pixel coordinates.

    Args:
      image: [B, H, W, C].
      coords: [B, ..., 2] pixel coordinates as (x, y).
      padding_mode: 'zeros' (out-of-bounds contributes 0) or 'border' (the
        floating coordinate is clamped to the valid range before sampling) —
        matching torch.nn.functional.grid_sample with align_corners=True.
    Returns:
      [B, ..., C] sampled values, in the compute dtype of `image`.
    """
    batch, height, width, channels = image.shape
    out_shape = coords.shape[:-1] + (channels,)
    coords = coords.reshape(batch, -1, 2).astype(jnp.float32)
    x, y = coords[..., 0], coords[..., 1]

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, width - 1)
        y = jnp.clip(y, 0.0, height - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unknown padding_mode: {padding_mode}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(xi, yi, wx, wy):
        valid = (xi >= 0) & (xi <= width - 1) & (yi >= 0) & (yi <= height - 1)
        xc = jnp.clip(xi, 0, width - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, height - 1).astype(jnp.int32)
        flat_idx = yc * width + xc  # [B, P]
        vals = jnp.take_along_axis(
            image.reshape(batch, height * width, channels),
            flat_idx[..., None],
            axis=1,
        )
        w = (wx * wy * valid).astype(image.dtype)
        return vals * w[..., None]

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out.reshape(out_shape)


def grid_sample_points(feat_2d: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample image features at projected point locations (CLFM 2D->3D path).

    Args:
      feat_2d: [B, H, W, C] image features.
      uv: [B, N, 2] pixel coordinates.
    Returns:
      [B, N, C] sampled features, computed in f32 (the reference disables amp
      here — models/utils.py:262-269).
    """
    return grid_sample_pixel(feat_2d.astype(jnp.float32), uv, padding_mode="zeros")


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_align_corners(
    image: jax.Array, out_h: int, out_w: int
) -> jax.Array:
    """Bilinear resize with align_corners=True (torch `interpolate` parity)."""
    batch, in_h, in_w, _ = image.shape
    if (in_h, in_w) == (out_h, out_w):
        return image
    ys = jnp.linspace(0.0, in_h - 1.0, out_h)
    xs = jnp.linspace(0.0, in_w - 1.0, out_w)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # [out_h, out_w]
    coords = jnp.stack([grid_x, grid_y], axis=-1)  # [out_h, out_w, 2]
    coords = jnp.broadcast_to(coords[None], (batch, out_h, out_w, 2))
    return grid_sample_pixel(image, coords, padding_mode="border")
