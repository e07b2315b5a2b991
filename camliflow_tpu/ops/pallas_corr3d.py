"""Pallas TPU kernel for the Correlation3D neighbour selection.

Correlation3D (reference camliraft_l_core.py:40-101) runs every refinement
iteration: for each of 4 prefix-nested pyramid levels, select the k nearest
warped frame-2 points per query and gather (a) their relative positions and
(b) their cost-volume entries. The XLA selection path (dense distance matrix
+ 4 hierarchical lax.top_k) spends its time in top_k's sort network and the
[B, N, M] HBM round-trips.

This kernel does all 4 levels' selections in one VMEM-resident pass per
query tile: distance tile on the MXU (levels are column-prefixes of one
matrix), then per level k exact (min + first-index tie-break) extraction
passes on the VPU, landing indices in an accumulator via one-hot lane
selects. The (rel_xyz, cost) payload gathers stay in XLA — measured 2.6x
faster than extracting the payload in-kernel with masked reductions (the
extra in-kernel passes cost more than two batched XLA gathers).

Output: [B, N, L*k] int32 indices into the warped cloud, grouped by level,
each level's neighbours in ascending-distance order with the same
lowest-index tie-break as `knn_from_dists` — bit-compatible with the XLA
path.

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


def _corr3d_knn_kernel(
    xyz1_ref,
    xyz2_ref,
    pyr_ref,
    idx_out_ref,
    cost_out_ref,
    dist_ref,
    acc_ref,
    cost_acc_ref,
    *,
    level_sizes,
    k,
):
    q = xyz1_ref[0].astype(jnp.float32)  # [T, 3]
    p = xyz2_ref[0].astype(jnp.float32)  # [M0, 3]
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

    offset = 0
    for level, m_l in enumerate(level_sizes):
        pyr = pyr_ref[0, :, offset : offset + m_l]  # [T, m_l] per-query costs
        cols = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], m_l), 1)
        lane_out = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1)
        if level > 0:
            dist_ref[:, :m_l] = d_full[:, :m_l]

        def body(j, _, m_l=m_l, pyr=pyr, cols=cols, lane_out=lane_out):
            d = dist_ref[:, :m_l]
            dmin = jnp.min(d, axis=1, keepdims=True)
            idx = jnp.min(
                jnp.where(d == dmin, cols, m_l), axis=1, keepdims=True
            )
            mask = cols == idx
            # the selected entry's cost rides the selection mask (exact:
            # one term survives); doing this here avoids a catastrophic
            # 131K-single-float take_along_axis gather in XLA (~1.5 ms/iter)
            sel_cost = jnp.sum(
                jnp.where(mask, pyr, 0.0), axis=1, keepdims=True
            )
            acc_ref[...] = jnp.where(lane_out == j, idx, acc_ref[...])
            cost_acc_ref[...] = jnp.where(
                lane_out == j, sel_cost, cost_acc_ref[...]
            )
            dist_ref[:, :m_l] = jnp.where(mask, jnp.inf, d)
            return 0

        jax.lax.fori_loop(0, k, body, 0)
        idx_out_ref[0, :, level * k : (level + 1) * k] = acc_ref[...]
        cost_out_ref[0, :, level * k : (level + 1) * k] = cost_acc_ref[...]
        offset += m_l


@functools.partial(jax.jit, static_argnames=("level_sizes", "k", "interpret"))
def correlation3d_knn_pallas(
    xyz1: jax.Array,
    xyz2_warp: jax.Array,
    pyramid_cat: jax.Array,
    level_sizes: tuple[int, ...],
    k: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Per-level prefix KNN selection + cost extraction.

    Args:
      xyz1: [B, N, 3] query points.
      xyz2_warp: [B, M0, 3] warped frame-2 points (levels are row-prefixes).
      pyramid_cat: [B, N, sum(level_sizes)] per-query cost-volume rows,
        levels concatenated along columns.
      level_sizes: per-level prefix lengths, descending.
      k: neighbours per level.
    Returns:
      (indices [B, N, L*k] int32, costs [B, N, L*k] f32). Selection
      semantics match the XLA path (ascending distance within a level,
      lowest-index tie-break); the rel_xyz payload is left to one XLA
      gather (see module docstring).
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

    idx, cost = pl.pallas_call(
        functools.partial(
            _corr3d_knn_kernel, level_sizes=tuple(level_sizes), k=k
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, total_n, n_levels * k), jnp.int32),
            jax.ShapeDtypeStruct((batch, total_n, n_levels * k), jnp.float32),
        ),
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
        out_specs=(
            pl.BlockSpec(
                (1, _TILE_N, n_levels * k),
                lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _TILE_N, n_levels * k),
                lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE_N, m0), jnp.float32),
            pltpu.VMEM((_TILE_N, k), jnp.int32),
            pltpu.VMEM((_TILE_N, k), jnp.float32),
        ],
        interpret=interpret,
    )(xyz1_p, xyz2_warp, pyr_p)
    return idx[:, :n_queries], cost[:, :n_queries]
