"""Correlation / cost-volume ops for the 2D branches.

- `correlation2d`: PWC-style local cost volume over a (2d+1)^2 displacement
  window. Reference semantics: models/csrc/wrapper.py:40-57 and the CUDA
  kernel's channel order (correlation_forward_kernel.cu:30,44): channel
  tc = (ty_shift + d) * (2d+1) + (tx_shift + d), i.e. vertical-shift major.
  Out-of-bounds windows contribute 0 (zero padding). Implemented as an
  unrolled pad+slice loop; XLA fuses the 81 elementwise products and autodiff
  is free (no custom backward needed, unlike the CUDA version).

- `all_pairs_correlation_pyramid` + `corr_lookup_2d`: RAFT-style global cost
  volume with an avg-pooled pyramid and a bilinear windowed lookup.
  Reference semantics: models/raft_core.py:52-107.

NHWC throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .gridsample import grid_sample_pixel


@functools.partial(jax.jit, static_argnames=("max_displacement",))
def correlation2d(
    input1: jax.Array, input2: jax.Array, max_displacement: int
) -> jax.Array:
    """Local cost volume: mean-over-channels dot product at each displacement.

    Args:
      input1: [B, H, W, C] frame-1 features.
      input2: [B, H, W, C] frame-2 features.
      max_displacement: window radius d.
    Returns:
      [B, H, W, (2d+1)^2] cost volume, vertical-shift-major channel order.
    """
    d = max_displacement
    height, width = input1.shape[1:3]
    input1 = input1.astype(jnp.float32)
    input2 = jnp.pad(
        input2.astype(jnp.float32), ((0, 0), (d, d), (d, d), (0, 0))
    )
    costs = []
    for i in range(2 * d + 1):  # vertical shift (major)
        for j in range(2 * d + 1):  # horizontal shift (minor)
            shifted = input2[:, i : i + height, j : j + width, :]
            costs.append(jnp.mean(input1 * shifted, axis=-1))
    return jnp.stack(costs, axis=-1)


def all_pairs_correlation_pyramid(
    fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4
) -> list[jax.Array]:
    """RAFT all-pairs correlation volume + avg-pool pyramid.

    Args:
      fmap1, fmap2: [B, H, W, C] feature maps (already through the aligner).
      num_levels: pyramid depth.
    Returns:
      list of [B*H*W, H/2^i, W/2^i, 1] volumes (f32).

    Reference semantics: models/raft_core.py:52-68. The B*H*W leading axis is
    kept so level-i lookups are a plain batched grid sample.
    """
    batch, height, width, dim = fmap1.shape
    f1 = fmap1.reshape(batch, height * width, dim).astype(jnp.float32)
    f2 = fmap2.reshape(batch, height * width, dim).astype(jnp.float32)
    # f32-precision matmul: the reference builds cost volumes in fp32 with
    # autocast disabled (raft_core.py:53); neighbour ordering and lookup
    # values are numerically load-bearing.
    corr = jnp.einsum(
        "bnd,bmd->bnm",
        f1,
        f2,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    corr = corr / jnp.sqrt(jnp.float32(dim))
    corr = corr.reshape(batch * height * width, height, width, 1)

    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = jax.lax.reduce_window(
            corr,
            0.0,
            jax.lax.add,
            window_dimensions=(1, 2, 2, 1),
            window_strides=(1, 2, 2, 1),
            padding="VALID",
        ) * 0.25
        pyramid.append(corr)
    return pyramid


@functools.partial(jax.jit, static_argnames=("radius",))
def corr_lookup_2d(
    pyramid: list[jax.Array], coords: jax.Array, radius: int = 4
) -> jax.Array:
    """Bilinear windowed lookup into the all-pairs pyramid.

    Args:
      pyramid: output of `all_pairs_correlation_pyramid`.
      coords: [B, H, W, 2] target pixel coordinates in frame 2 (grid + flow).
      radius: window radius r; each level contributes (2r+1)^2 channels.
    Returns:
      [B, H, W, num_levels * (2r+1)^2] correlation features.

    Reference semantics: models/raft_core.py:70-107 (grid_sample with zeros
    padding, align_corners=True; delta window dy-major).
    """
    batch, height, width, _ = coords.shape
    r = radius
    span = 2 * r + 1
    dx = jnp.linspace(-r, r, span, dtype=jnp.float32)
    dy = jnp.linspace(-r, r, span, dtype=jnp.float32)
    # Reference quirk preserved for checkpoint parity: meshgrid(dy, dx) is
    # consumed as (x, y) offsets by the bilinear sampler
    # (raft_core.py:79-85 + 100-104), i.e. channel k = i*span + j samples the
    # offset (x + dy_i, y + dx_j). Symmetric in coverage, but the channel
    # order matters to the motion encoder's weights.
    delta = jnp.stack(
        jnp.meshgrid(dy, dx, indexing="ij"), axis=-1
    ).reshape(-1, 2)  # [span*span, 2] consumed as (x, y)

    coords_flat = coords.reshape(batch * height * width, 1, 2).astype(jnp.float32)
    out_pyramid = []
    for i, corr in enumerate(pyramid):
        coords_lvl = coords_flat / (2.0**i) + delta[None]  # [BHW, span^2, 2]
        sampled = grid_sample_pixel(corr, coords_lvl, padding_mode="zeros")
        out_pyramid.append(sampled.reshape(batch, height, width, span * span))
    return jnp.concatenate(out_pyramid, axis=-1)
