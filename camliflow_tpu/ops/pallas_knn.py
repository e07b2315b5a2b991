"""Pallas TPU kernel for brute-force k-nearest-neighbour selection.

The XLA path (dense distance matrix + `lax.top_k`) spends most of its time in
top_k's sort network — 26 ms for the encoder's [2, 4096, 8192] k=16 query on
v5e. This kernel tiles queries over the grid, computes the distance tile with
one MXU matmul, and extracts the k minima by k (min + first-index tie-break +
poison) passes on the VPU over a VMEM-resident scratch — exact, with the same
tie-break as `lax.top_k` on negated distances, at ~1/8 the cost.

The selection loop runs as a `fori_loop` over scratch refs (Mosaic reuses one
buffer instead of stacking k unrolled copies) and lands each pass's index in
an accumulator via one-hot lane selects (dynamic VMEM stores at traced
offsets don't lower).

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

# largest support set the distance tile can hold in VMEM scratch
MAX_SUPPORT = 8192
MAX_K = 32


def _knn_kernel(q_ref, p_ref, out_ref, dist_ref, acc_ref, *, k: int):
    q = q_ref[0].astype(jnp.float32)  # [T, D]
    p = p_ref[0].astype(jnp.float32)  # [M, D]
    # [T, M] squared distances (minus the constant |q|^2 row term).
    # HIGHEST: Mosaic cannot lower 3-pass HIGH dots.
    d = -2.0 * jax.lax.dot_general(
        q,
        p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dist_ref[...] = d + jnp.sum(p * p, axis=-1)[None, :]

    m = p.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, dist_ref.shape, 1)
    lane_out = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1)

    def body(j, _):
        d = dist_ref[...]
        dmin = jnp.min(d, axis=1, keepdims=True)  # [T, 1]
        idx = jnp.min(
            jnp.where(d == dmin, cols, m), axis=1, keepdims=True
        )  # [T, 1] first-index tie-break
        acc_ref[...] = jnp.where(lane_out == j, idx, acc_ref[...])
        dist_ref[...] = jnp.where(cols == idx, jnp.inf, d)
        return 0

    jax.lax.fori_loop(0, k, body, 0)
    out_ref[0] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def k_nearest_neighbor_pallas(
    input_xyz: jax.Array, query_xyz: jax.Array, k: int, interpret: bool = False
) -> jax.Array:
    """[B, M, D] points, [B, N, D] queries -> [B, N, k] int32 indices."""
    batch, n_queries, dim = query_xyz.shape
    n_points = input_xyz.shape[1]
    assert k <= MAX_K and n_points <= MAX_SUPPORT, (k, n_points)

    tile_n = 256 if n_points <= 4096 else 128
    pad_n = (-n_queries) % tile_n
    padded_q = jnp.pad(query_xyz, ((0, 0), (0, pad_n), (0, 0)))
    total_n = n_queries + pad_n
    n_tiles = total_n // tile_n

    out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((batch, total_n, k), jnp.int32),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile_n, dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_points, dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_n, k), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_n, n_points), jnp.float32),  # working distances
            pltpu.VMEM((tile_n, k), jnp.int32),  # selected indices
        ],
        interpret=interpret,
    )(padded_q, input_xyz)
    return out[:, :n_queries]
