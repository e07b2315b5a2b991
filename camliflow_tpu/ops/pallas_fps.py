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


def _fps_kernel(xyz_ref, out_ref, dist_ref, acc_ref, *, n_samples: int):
    xyz = xyz_ref[0]  # [3, N]
    n_points = xyz.shape[1]
    dist_ref[...] = jnp.full_like(dist_ref, 1e10)
    lane_in = jax.lax.broadcasted_iota(jnp.int32, (1, n_points), 1)
    lane_out = jax.lax.broadcasted_iota(jnp.int32, (1, n_samples), 1)

    def body(i, farthest):
        # record the selection via a one-hot lane select
        acc_ref[...] = jnp.where(lane_out == i, farthest, acc_ref[...])
        # read the selected point via a one-hot masked reduction
        sel = (lane_in == farthest).astype(jnp.float32)  # [1, N]
        cur = jnp.sum(xyz * sel, axis=1, keepdims=True)  # [3, 1]
        diff = xyz - cur
        new_d = jnp.sum(diff * diff, axis=0, keepdims=True)  # [1, N]
        dist = jnp.minimum(dist_ref[...], new_d)
        dist_ref[...] = dist
        return jnp.argmax(dist[0]).astype(jnp.int32)

    jax.lax.fori_loop(0, n_samples, body, jnp.int32(0))
    out_ref[0] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("n_samples", "interpret"))
def furthest_point_sampling_pallas(
    xyz: jax.Array, n_samples: int, interpret: bool = False
) -> jax.Array:
    """[B, N, 3] points -> [B, n_samples] int32 indices."""
    batch, n_points, _ = xyz.shape
    xyz_t = xyz.astype(jnp.float32).transpose(0, 2, 1)  # [B, 3, N]

    out = pl.pallas_call(
        functools.partial(_fps_kernel, n_samples=n_samples),
        out_shape=jax.ShapeDtypeStruct((batch, 1, n_samples), jnp.int32),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, 3, n_points), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n_samples), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n_points), jnp.float32),
            pltpu.VMEM((1, n_samples), jnp.int32),
        ],
        interpret=interpret,
    )(xyz_t)
    return out[:, 0, :]
