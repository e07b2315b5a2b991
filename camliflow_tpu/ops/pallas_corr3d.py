"""Pallas TPU kernel for the Correlation3D neighbour selection + extraction.

Correlation3D (reference camliraft_l_core.py:40-101) runs every refinement
iteration: for each of 4 prefix-nested pyramid levels, select the k nearest
warped frame-2 points per query and gather (a) their relative positions and
(b) their cost-volume entries. The XLA formulation needs one distance matmul,
4 hierarchical top-k selections and 2 big gathers — ~20 small ops whose
intermediate [B, N, M] tensors each round-trip HBM.

This kernel does the whole selection in one VMEM-resident pass per query
tile: distance tile on the MXU, then for each level k unrolled exact
(min + first-index tie-break) selections on the VPU, extracting the selected
point's (dx, dy, dz, cost) payload directly via the selection mask — the
relative-position payload rides the MXU as a one-hot matmul, the per-row cost
as a masked reduction. No index tensors or gathers ever materialise.

Output: [B, N, L*k, 4] = (xyz2[sel] - xyz1, cost[sel]) grouped by level, each
level's neighbours in ascending-distance order with the same lowest-index
tie-break as `knn_from_dists` — so downstream (shared cost MLP + per-level
sum) is bit-compatible with the XLA path.

The selection is forward-only (no VJP): the refinement cores use it for
inference; training keeps the differentiable XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 128  # keeps kernel stack < the 16MB scoped-vmem limit at M0=2048


def _corr3d_kernel(
    xyz1_ref,
    xyz2_ref,
    pyr_ref,
    out_ref,
    dist_ref,
    acc_ref,
    *,
    level_sizes: tuple[int, ...],
    k: int,
):
    q = xyz1_ref[0].astype(jnp.float32)  # [T, 3]
    p = xyz2_ref[0].astype(jnp.float32)  # [M0, 3]

    # squared distances, same formulation as ops.geometry.squared_distance
    # (HIGHEST: Mosaic cannot lower 3-pass HIGH; full f32 costs the same at
    # this K=3 contraction and keeps selection parity with the XLA path)
    d_full = -2.0 * jax.lax.dot_general(
        q,
        p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d_full = d_full + jnp.sum(q * q, axis=-1)[:, None]
    d_full = d_full + jnp.sum(p * p, axis=-1)[None, :]
    dist_ref[...] = d_full

    # selections run inside fori_loops over scratch refs so Mosaic reuses one
    # set of buffers instead of stacking 4*k unrolled copies (VMEM-bound);
    # the per-j output lands in `acc_ref` via one-hot lane selects (dynamic
    # VMEM stores at traced offsets don't lower).
    # lane-major coordinate rows for the masked extractions, computed once
    # (loop-invariant; the relayout [M0, 3] -> 3 x [1, M0] is not free and
    # must not sit inside the fori_loop bodies)
    px = p[:, 0][None, :]
    py = p[:, 1][None, :]
    pz = p[:, 2][None, :]

    offset = 0
    for level, m_l in enumerate(level_sizes):
        pyr = pyr_ref[0, :, offset : offset + m_l].astype(jnp.float32)
        p_lt = (px[:, :m_l], py[:, :m_l], pz[:, :m_l])
        cols = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], m_l), 1)
        lane_out = jax.lax.broadcasted_iota(jnp.int32, (1, k * 4), 1)
        if level > 0:
            dist_ref[:, :m_l] = d_full[:, :m_l]

        def body(j, _, m_l=m_l, pyr=pyr, p_lt=p_lt, cols=cols, lane_out=lane_out):
            d = dist_ref[:, :m_l]
            dmin = jnp.min(d, axis=1, keepdims=True)  # [T, 1]
            # first-index tie-break, matching lax.top_k on negated distances
            idx = jnp.min(
                jnp.where(d == dmin, cols, m_l), axis=1, keepdims=True
            )  # [T, 1]
            mask = cols == idx  # [T, m_l]
            maskf = mask.astype(jnp.float32)
            # selected point coordinates + cost entry: masked reductions on
            # the VPU (exact — one term survives per row). A one-hot MXU
            # matmul here costs 6 HIGHEST passes per selection and dominates
            # the kernel; 4 masked reduces are ~8x cheaper.
            sel_x = jnp.sum(maskf * p_lt[0], axis=1, keepdims=True)
            sel_y = jnp.sum(maskf * p_lt[1], axis=1, keepdims=True)
            sel_z = jnp.sum(maskf * p_lt[2], axis=1, keepdims=True)
            sel_cost = jnp.sum(maskf * pyr, axis=1, keepdims=True)  # [T, 1]
            rel = (sel_x - q[:, 0:1], sel_y - q[:, 1:2], sel_z - q[:, 2:3])
            acc = acc_ref[...]
            for c in range(3):
                acc = jnp.where(lane_out == j * 4 + c, rel[c], acc)
            acc = jnp.where(lane_out == j * 4 + 3, sel_cost, acc)
            acc_ref[...] = acc
            dist_ref[:, :m_l] = jnp.where(mask, jnp.inf, d)
            return 0

        jax.lax.fori_loop(0, k, body, 0)
        out_ref[0, :, level * k * 4 : (level + 1) * k * 4] = acc_ref[...]
        offset += m_l


@functools.partial(
    jax.jit, static_argnames=("level_sizes", "k", "interpret")
)
def correlation3d_select_pallas(
    xyz1: jax.Array,
    xyz2_warp: jax.Array,
    pyramid_cat: jax.Array,
    level_sizes: tuple[int, ...],
    k: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused neighbour selection + payload extraction for Correlation3D.

    Args:
      xyz1: [B, N, 3] query points.
      xyz2_warp: [B, M0, 3] warped frame-2 points (finest level; coarser
        levels are row-prefixes).
      pyramid_cat: [B, N, sum(level_sizes)] cost-volume pyramid concatenated
        along columns.
      level_sizes: per-level prefix lengths, descending (e.g. (2048, 1024,
        512, 256)).
      k: neighbours per level.
    Returns:
      [B, N, len(level_sizes) * k, 4] float32: per selected neighbour
      (dx, dy, dz, cost), levels outermost, ascending distance within a level.
    """
    batch, n_queries, _ = xyz1.shape
    m0 = xyz2_warp.shape[1]
    m_total = pyramid_cat.shape[2]
    assert m_total == sum(level_sizes), (m_total, level_sizes)
    n_levels = len(level_sizes)

    pad_n = (-n_queries) % _TILE_N
    xyz1_p = jnp.pad(xyz1, ((0, 0), (0, pad_n), (0, 0)))
    pyr_p = jnp.pad(pyramid_cat, ((0, 0), (0, pad_n), (0, 0)))
    total_n = n_queries + pad_n
    n_tiles = total_n // _TILE_N
    out_cols = n_levels * k * 4

    out = pl.pallas_call(
        functools.partial(_corr3d_kernel, level_sizes=tuple(level_sizes), k=k),
        out_shape=jax.ShapeDtypeStruct((batch, total_n, out_cols), jnp.float32),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, _TILE_N, 3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, m0, 3), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _TILE_N, m_total),
                lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE_N, out_cols), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE_N, m0), jnp.float32),  # working distances
            pltpu.VMEM((_TILE_N, k * 4), jnp.float32),  # per-level payload
        ],
        interpret=interpret,
    )(xyz1_p, xyz2_warp, pyr_p)
    out = out[:, :n_queries]
    return out.reshape(batch, n_queries, n_levels * k, 4)
