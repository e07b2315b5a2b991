"""Pallas TPU kernel for brute-force k-nearest-neighbour selection.

The XLA path (dense distance matrix + `lax.top_k`) spends most of its time in
top_k's sort network. This kernel tiles queries over the grid, computes the
distance tile with one MXU matmul, and extracts the k minima by k unrolled
(argmin + mask) passes on the VPU — exact, with the same first-min tie-break
as `lax.top_k` on negated distances.

Reference semantics: models/csrc/k_nearest_neighbor_kernel.cu (brute force,
ascending by distance). The |q|^2 term is dropped — it is constant per row
and cannot change the ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256


def _knn_kernel(q_ref, p_ref, out_ref, *, k: int):
    q = q_ref[0].astype(jnp.float32)  # [T, D]
    p = p_ref[0].astype(jnp.float32)  # [M, D]
    # [T, M] squared distances (minus the constant |q|^2 row term)
    d = -2.0 * jax.lax.dot_general(
        q,
        p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = d + jnp.sum(p * p, axis=-1)[None, :]

    m = d.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    for j in range(k):
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)  # [T]
        out_ref[0, :, j] = idx
        d = jnp.where(col_ids == idx[:, None], jnp.inf, d)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def k_nearest_neighbor_pallas(
    input_xyz: jax.Array, query_xyz: jax.Array, k: int, interpret: bool = False
) -> jax.Array:
    """[B, M, D] points, [B, N, D] queries -> [B, N, k] int32 indices."""
    batch, n_queries, dim = query_xyz.shape
    n_points = input_xyz.shape[1]

    pad_n = (-n_queries) % _TILE_N
    padded_q = jnp.pad(query_xyz, ((0, 0), (0, pad_n), (0, 0)))
    total_n = n_queries + pad_n
    n_tiles = total_n // _TILE_N

    out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((batch, total_n, k), jnp.int32),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, _TILE_N, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_points, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE_N, k), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(padded_q, input_xyz)
    return out[:, :n_queries]
