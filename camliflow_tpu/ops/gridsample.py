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

    flat_idx, weights = bilinear_taps(x, y, height, width)
    flat = image.reshape(batch, height * width, channels)
    out = None
    for t in range(4):
        vals = jnp.take_along_axis(flat, flat_idx[..., t : t + 1], axis=1)
        vals = vals * weights[..., t].astype(image.dtype)[..., None]
        out = vals if out is None else out + vals
    return out.reshape(out_shape)


def bilinear_taps(x: jax.Array, y: jax.Array, height: int, width: int):
    """The 4-corner taps of a zeros-padded bilinear sample: flat row indices
    into the [H*W] plane plus lerp weights with out-of-bounds validity folded
    in, so `sample = sum_t flat_image[idx[..., t]] * w[..., t]`.

    Single source of truth for the corner/validity/clip semantics shared by
    `grid_sample_pixel` and the hoisted tap cache of the fused CLFM kernel
    (ops/pallas_clfm.py). Tap order: (x0,y0), (x1,y0), (x0,y1), (x1,y1).

    Returns:
      (flat_idx [..., 4] int32, weights [..., 4] f32).
    """
    x0, y0 = jnp.floor(x), jnp.floor(y)
    idxs, ws = [], []
    for xi, yi, wx, wy in (
        (x0, y0, 1.0 - (x - x0), 1.0 - (y - y0)),
        (x0 + 1.0, y0, x - x0, 1.0 - (y - y0)),
        (x0, y0 + 1.0, 1.0 - (x - x0), y - y0),
        (x0 + 1.0, y0 + 1.0, x - x0, y - y0),
    ):
        valid = (xi >= 0) & (xi <= width - 1) & (yi >= 0) & (yi <= height - 1)
        xc = jnp.clip(xi, 0, width - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, height - 1).astype(jnp.int32)
        idxs.append(yc * width + xc)
        ws.append(wx * wy * valid)
    return jnp.stack(idxs, axis=-1), jnp.stack(ws, axis=-1)


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
