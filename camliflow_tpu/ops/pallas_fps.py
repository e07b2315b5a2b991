"""Pallas TPU kernel for furthest-point sampling.

FPS is inherently sequential (each selection depends on the running
min-distance field), so the XLA `fori_loop` pays per-iteration loop overhead
on thousands of tiny steps. This kernel keeps the whole state (points +
distance field) resident in VMEM and runs the loop on-core.

Mosaic cannot lower dynamic VMEM indexing at a traced offset, so both the
"read the selected point" and "record the selected index" steps are expressed
as one-hot lane selections — full-width VPU passes with no gathers or dynamic
stores.

Layout: points enter transposed [B, 3, N] so the cloud lies along lanes.
Semantics identical to ops.geometry.furthest_point_sampling (index-0 start,
first-max tie-break — reference models/csrc/wrapper.py:83-96).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, dist_ref, acc_ref, *, n_samples: int):
    """All batch rows advance together: the batch rides the sublane dim of
    every [B, N] op, so the 4096-step serial loop is paid once per cloud set
    instead of once per batch row."""
    x = x_ref[...]  # [B, N] each
    y = y_ref[...]
    z = z_ref[...]
    batch, n_points = x.shape
    dist_ref[...] = jnp.full_like(dist_ref, 1e10)
    lane_in = jax.lax.broadcasted_iota(jnp.int32, (batch, n_points), 1)
    lane_out = jax.lax.broadcasted_iota(jnp.int32, (batch, n_samples), 1)

    def body(i, farthest):  # farthest: [B, 1] int32
        # record the selection via a one-hot lane select
        acc_ref[...] = jnp.where(lane_out == i, farthest, acc_ref[...])
        # read the selected point via one-hot masked reductions
        sel = (lane_in == farthest).astype(jnp.float32)  # [B, N]
        cx = jnp.sum(x * sel, axis=1, keepdims=True)  # [B, 1]
        cy = jnp.sum(y * sel, axis=1, keepdims=True)
        cz = jnp.sum(z * sel, axis=1, keepdims=True)
        # same direct (p - cur)^2 form as the XLA fallback so rounding (and
        # thus tie behaviour) matches exactly
        dx = x - cx
        dy = y - cy
        dz = z - cz
        new_d = dx * dx + dy * dy + dz * dz  # [B, N]
        dist = jnp.minimum(dist_ref[...], new_d)
        dist_ref[...] = dist
        dmax = jnp.max(dist, axis=1, keepdims=True)
        return jnp.min(
            jnp.where(dist == dmax, lane_in, n_points), axis=1, keepdims=True
        ).astype(jnp.int32)

    jax.lax.fori_loop(0, n_samples, body, jnp.zeros((batch, 1), jnp.int32))
    out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("n_samples", "interpret"))
def furthest_point_sampling_pallas(
    xyz: jax.Array, n_samples: int, interpret: bool = False
) -> jax.Array:
    """[B, N, 3] points -> [B, n_samples] int32 indices."""
    batch, n_points, _ = xyz.shape
    xyz_t = xyz.astype(jnp.float32).transpose(0, 2, 1)  # [B, 3, N]
    coords = [xyz_t[:, c] for c in range(3)]  # 3 x [B, N]

    out = pl.pallas_call(
        functools.partial(_fps_kernel, n_samples=n_samples),
        out_shape=jax.ShapeDtypeStruct((batch, n_samples), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((batch, n_points), jnp.float32),
            pltpu.VMEM((batch, n_samples), jnp.int32),
        ],
        interpret=interpret,
    )(*coords)
    return out
