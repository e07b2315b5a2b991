"""Pallas TPU kernel for fused KNN-interpolation (and thus backwarp_3d).

`knn_interpolation` (reference models/utils.py:130-146) = KNN(k=3) + two
gathers + inverse-distance weighting. Inside the refinement scans it runs
every iteration as part of `backwarp_3d`; the XLA path is ~10 small ops with
a [B, N, M] distance matrix round-tripping HBM.

One VMEM-resident pass per query tile: distance tile on the MXU, k exact
(min + first-index tie-break) selections, and per selection a single one-hot
matmul extracting the concatenated (xyz || feature) payload — coordinates for
the weight, features for the weighted sum. Weights are computed from the
extracted coordinates exactly like the XLA path (norm of the gathered diff,
clamped at 1e-8), so results match to fp tolerance.

Forward-only (no VJP): inference path; training keeps the XLA route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256


def _interp_kernel(query_ref, table_ref, out_ref, *, k: int, n_channels: int):
    q = query_ref[0].astype(jnp.float32)  # [T, 3]
    table = table_ref[0].astype(jnp.float32)  # [M, 3 + C] = xyz || features
    p = table[:, :3]

    # HIGHEST: Mosaic cannot lower 3-pass HIGH dots
    d = -2.0 * jax.lax.dot_general(
        q,
        p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = d + jnp.sum(q * q, axis=-1)[:, None]
    d = d + jnp.sum(p * p, axis=-1)[None, :]

    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    m = d.shape[1]

    weights = []
    feats = []
    for _ in range(k):
        dmin = jnp.min(d, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(d == dmin, cols, m), axis=1, keepdims=True)
        mask = cols == idx
        maskf = mask.astype(jnp.float32)
        sel = jax.lax.dot_general(
            maskf,
            table,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [T, 3 + C]
        diff = sel[:, :3] - q
        dist = jnp.maximum(
            jnp.sqrt(jnp.sum(diff * diff, axis=1, keepdims=True)), 1e-8
        )
        weights.append(1.0 / dist)  # [T, 1]
        feats.append(sel[:, 3:])  # [T, C]
        d = jnp.where(mask, jnp.inf, d)

    total = weights[0]
    for w in weights[1:]:
        total = total + w
    acc = (weights[0] / total) * feats[0]
    for w, f in zip(weights[1:], feats[1:]):
        acc = acc + (w / total) * f
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_interpolation_pallas(
    input_xyz: jax.Array,
    input_features: jax.Array,
    query_xyz: jax.Array,
    k: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """[B, M, 3] support, [B, M, C] features, [B, N, 3] queries -> [B, N, C].

    Same semantics as `ops.geometry.knn_interpolation` (inverse-distance
    weighting over the k nearest supports, 1e-8 clamp).
    """
    batch, n_queries, _ = query_xyz.shape
    m = input_xyz.shape[1]
    n_channels = input_features.shape[2]

    table = jnp.concatenate(
        [input_xyz.astype(jnp.float32), input_features.astype(jnp.float32)],
        axis=-1,
    )
    pad_n = (-n_queries) % _TILE_N
    query_p = jnp.pad(query_xyz, ((0, 0), (0, pad_n), (0, 0)))
    total_n = n_queries + pad_n
    n_tiles = total_n // _TILE_N

    out = pl.pallas_call(
        functools.partial(_interp_kernel, k=k, n_channels=n_channels),
        out_shape=jax.ShapeDtypeStruct((batch, total_n, n_channels), jnp.float32),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, _TILE_N, 3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, m, 3 + n_channels),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _TILE_N, n_channels),
            lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(query_p, table)
    return out[:, :n_queries].astype(input_features.dtype)
