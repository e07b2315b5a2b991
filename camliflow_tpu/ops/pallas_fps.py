"""Pallas TPU kernel for furthest-point sampling.

FPS is inherently sequential (each selection depends on the running
min-distance field), so the XLA `fori_loop` pays per-iteration loop overhead
on thousands of tiny steps. This kernel keeps the whole state (points +
distance field) resident in VMEM and runs the loop on-core.

Mosaic cannot lower dynamic VMEM indexing at a traced offset, so both the
"read the selected point" and "record the selected index" steps are expressed
as one-hot lane selections — full-width VPU passes with no gathers or dynamic
stores.

Layout: each batch row's N points are folded across 8 sublanes as [B, 8, N/8]
(row-major, so element (r, c) is original index r*(N/8) + c). The unfolded
[B, N] layout left 6 of 8 sublanes idle at the bench's B=2 (and 7 of 8 at
B=1) — every full-width VPU pass in the 4096-step serial loop ran at 25%
utilisation. Folding is bit-exact: the per-element arithmetic is unchanged
and the first-max tie-break uses the original-index grid.

Semantics identical to ops.geometry.furthest_point_sampling (index-0 start,
first-max tie-break — reference models/csrc/wrapper.py:83-96).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FOLD = 8  # sublane folding factor (full vreg sublane utilisation)


def fps_gather_enabled() -> bool:
    """Trace-time switch for the dynamic-gather coordinate read in the FPS
    kernel (~10 fewer VPU ops per serial step; the loop is step-latency
    bound). Hardware verdict 2026-08-19 (tools/probe_gather_matrix.py): this toolchain's Mosaic backend rejects EVERY dim-0 tpu.dynamic_gather (any dtype, any shape), so this kernel cannot compile on the current chip stack; the flag stays "0" until a toolchain upgrade (PERF.md round-4 gather-probe verdict).
    Export CAMLIFLOW_FPS_GATHER=1 to re-test after an upgrade."""
    return os.environ.get("CAMLIFLOW_FPS_GATHER", "0") != "0"


def _fps_kernel(
    x_ref, y_ref, z_ref, xyz_flat_ref, out_ref, dist_ref, acc_ref,
    *, n_samples: int, n_points: int, coord_gather: bool,
):
    """All batch rows and all 8 sublane folds advance together; the serial
    loop is paid once per cloud set."""
    x = x_ref[...]  # [B, F, C] each
    y = y_ref[...]
    z = z_ref[...]
    batch, folds, cols = x.shape
    # original point index of each (fold, col) slot; padded slots get an
    # index >= n_points so they can never match a selection
    idx_grid = (
        jax.lax.broadcasted_iota(jnp.int32, (batch, folds, cols), 1) * cols
        + jax.lax.broadcasted_iota(jnp.int32, (batch, folds, cols), 2)
    )
    # padded slots start at -inf distance: never the argmax
    dist_ref[...] = jnp.where(idx_grid < n_points, 1e10, -1e30)
    lane_out = jax.lax.broadcasted_iota(jnp.int32, (batch, n_samples), 1)

    row_base = (
        jax.lax.broadcasted_iota(jnp.int32, (batch, 1), 0) * folds * cols
    )

    def body(i, farthest):  # farthest: [B, 1] int32 original index
        # record the selection via a one-hot lane select
        acc_ref[...] = jnp.where(lane_out == i, farthest, acc_ref[...])
        if coord_gather:
            # read the selected point with ONE dynamic_gather from the flat
            # [B*Fold*Cols, 3] coordinate table (indices vary along sublanes,
            # lane-uniform — the supported tpu.dynamic_gather pattern) — ~10
            # fewer full-width VPU ops per serial step than the one-hot
            # masked reduction below
            col = jnp.broadcast_to(row_base + farthest, (batch, 3))
            c = jnp.take_along_axis(xyz_flat_ref[...], col, axis=0)  # [B, 3]
            cx = c[:, 0][:, None, None]
            cy = c[:, 1][:, None, None]
            cz = c[:, 2][:, None, None]
        else:
            # read the selected point via one-hot masked reductions
            # (two-stage single-axis reduces: Mosaic's layout inference
            # rejects multi-axis reduces over the [B, F, C] VMEM blocks)
            sel = (idx_grid == farthest[:, :, None]).astype(jnp.float32)
            cx = jnp.sum(jnp.sum(x * sel, axis=2), axis=1)[:, None, None]
            cy = jnp.sum(jnp.sum(y * sel, axis=2), axis=1)[:, None, None]
            cz = jnp.sum(jnp.sum(z * sel, axis=2), axis=1)[:, None, None]
        # same direct (p - cur)^2 form as the XLA fallback so rounding (and
        # thus tie behaviour) matches exactly
        dx = x - cx
        dy = y - cy
        dz = z - cz
        new_d = dx * dx + dy * dy + dz * dz  # [B, F, C]
        dist = jnp.minimum(dist_ref[...], new_d)
        dist_ref[...] = dist
        dmax = jnp.max(jnp.max(dist, axis=2), axis=1)[:, None, None]
        cand = jnp.min(
            jnp.where(dist == dmax, idx_grid, n_points), axis=2
        )  # [B, F]
        return jnp.min(cand, axis=1).astype(jnp.int32)[:, None]

    jax.lax.fori_loop(0, n_samples, body, jnp.zeros((batch, 1), jnp.int32))
    out_ref[...] = acc_ref[...]


def furthest_point_sampling_pallas(
    xyz: jax.Array, n_samples: int, interpret: bool = False
) -> jax.Array:
    """[B, N, 3] points -> [B, n_samples] int32 indices."""
    # the env gate must key the jit cache (tests flip it within a process)
    return _fps_pallas_impl(
        xyz, n_samples, interpret, fps_gather_enabled()
    )


@functools.partial(
    jax.jit, static_argnames=("n_samples", "interpret", "coord_gather")
)
def _fps_pallas_impl(
    xyz: jax.Array, n_samples: int, interpret: bool, coord_gather: bool
) -> jax.Array:
    batch, n_points, _ = xyz.shape
    cols = -(-n_points // _FOLD)
    pad = _FOLD * cols - n_points
    xyz_f32 = xyz.astype(jnp.float32)
    xyz_t = jnp.pad(
        xyz_f32.transpose(0, 2, 1), ((0, 0), (0, 0), (0, pad))
    )  # [B, 3, N_pad]
    # fold each row across sublanes, row-major: (f, c) <-> index f*cols + c
    coords = [
        xyz_t[:, c].reshape(batch, _FOLD, cols) for c in range(3)
    ]  # 3 x [B, F, C]
    # flat [B*N_pad, 3] coordinate table for the dynamic-gather variant
    # (row = b * N_pad + original index); a dummy row when the variant is
    # off so the default path doesn't pay the extra pad/copy/VMEM
    if coord_gather:
        xyz_flat = jnp.pad(
            xyz_f32, ((0, 0), (0, pad), (0, 0))
        ).reshape(batch * _FOLD * cols, 3)
    else:
        xyz_flat = jnp.zeros((8, 3), jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _fps_kernel, n_samples=n_samples, n_points=n_points,
            coord_gather=coord_gather,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n_samples), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((batch, _FOLD, cols), jnp.float32),
            pltpu.VMEM((batch, n_samples), jnp.int32),
        ],
        interpret=interpret,
    )(*coords, xyz_flat)
    return out
