"""Pallas TPU kernel for batched KNN feature gathers.

STATUS: STRUCTURALLY UNBUILDABLE on the current toolchain — depends on dim-0
`tpu.dynamic_gather`, which the Mosaic backend rejects for every dtype/shape
(tools/probe_gather_matrix.py, PERF.md round-4 gather-probe verdict). Gate
CAMLIFLOW_PGATHER stays "0"; interpret-mode tests pin semantics for a future
Mosaic. Do not invest further here until the toolchain updates.

`gather_points` (the channel-last `batch_indexing`, reference
models/utils.py:61-104) with [B, M, k] indices is the encoders' dominant
remaining cost: XLA lowers it to per-row HBM gathers at ~20 ns/row
regardless of width (PERF.md "Known facts"), so a [2, 2048, 16] gather of
67-channel rows costs ~1.3 ms for <10 MB of data. This kernel keeps the
source table VMEM-resident and expands each of the k taps with
`jnp.take_along_axis` (`tpu.dynamic_gather` — the fused update-kernel
technique, ops/pallas_update3d.py).

Output is K-MAJOR ([B, k, M, C]): each tap writes one contiguous [M, C]
slab of full vregs. Consumers contract over k anyway (PointConv's einsum),
so no transpose back is needed on the fast path.

Forward-only (no VJP): inference fast path; training keeps the
differentiable XLA gather.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import _on_tpu

# VMEM budget for table + output + indices per batch row. Above this the
# caller falls back to the XLA gather (which is bandwidth-fine for big data
# — the Pallas win is per-row latency on small tables).
_VMEM_BUDGET = 96 * 1024 * 1024


def pallas_gather_enabled() -> bool:
    """Trace-time switch for the Pallas KNN gather.

    Hardware verdict 2026-08-19 (tools/probe_gather_matrix.py): this toolchain's Mosaic backend rejects EVERY dim-0 tpu.dynamic_gather (any dtype, any shape), so this kernel cannot compile on the current chip stack; the flag stays "0" until a toolchain upgrade (PERF.md round-4 gather-probe verdict).
    Export CAMLIFLOW_PGATHER=1 to re-test after an upgrade.
    """
    return os.environ.get("CAMLIFLOW_PGATHER", "0") != "0"


def gather_fits_vmem(data: jax.Array, indices: jax.Array) -> bool:
    """Whether one batch row's table + k-major output + indices fit VMEM."""
    _, n, c = data.shape
    _, m, k = indices.shape
    bytes_needed = (n * c + k * m * c) * data.dtype.itemsize + m * k * 4
    return bytes_needed <= _VMEM_BUDGET


def _gather_kmajor_kernel(data_ref, idx_ref, out_ref, *, k: int):
    table = data_ref[0]  # [N, C]
    m = idx_ref.shape[1]
    c = table.shape[1]
    for j in range(k):
        col = jnp.broadcast_to(idx_ref[0, :, j][:, None], (m, c))
        out_ref[0, j] = jnp.take_along_axis(table, col, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_points_kmajor(
    data: jax.Array, indices: jax.Array, interpret: bool | None = None
) -> jax.Array:
    """[B, N, C] data + [B, M, k] int indices -> [B, k, M, C].

    Values bit-identical to `gather_points(data, indices)` transposed to
    k-major (the gather itself is exact in any dtype).
    """
    from .pallas_update3d import _batched_spec as batched

    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    batch, n, c = data.shape
    _, m, k = indices.shape
    idx = indices.astype(jnp.int32)

    out_sd = jax.ShapeDtypeStruct((batch, k, m, c), data.dtype)
    return pl.pallas_call(
        functools.partial(_gather_kmajor_kernel, k=k),
        out_shape=out_sd,
        grid=(batch,),
        in_specs=[batched(data), batched(idx)],
        out_specs=batched(out_sd),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(data, idx)


def gather_points_fast(
    data: jax.Array, indices: jax.Array, fast: bool = False
) -> jax.Array:
    """Drop-in `gather_points` for rank-3 [B, M, k] indices: routes through
    the Pallas kernel on the fast path (plus one dense transpose back to
    [B, M, k, C] — still a win when XLA's per-row gather latency dominates),
    XLA otherwise."""
    from .geometry import gather_points

    if (
        fast
        and pallas_gather_enabled()
        and indices.ndim == 3
        and data.ndim == 3
        and gather_fits_vmem(data, indices)
    ):
        return jnp.transpose(gather_points_kmajor(data, indices), (0, 2, 1, 3))
    return gather_points(data, indices)


def knn_weighted_sum(
    data: jax.Array,
    indices: jax.Array,
    weights: jax.Array,
    fast: bool = False,
) -> jax.Array:
    """`sum_k gather(data, indices) * weights[..., None]` (KNN-interpolation,
    reference models/utils.py:107-120 pattern). The fast path contracts
    k-major straight off the Pallas gather — no transpose at all."""
    from .geometry import gather_points

    if (
        fast
        and pallas_gather_enabled()
        and indices.ndim == 3
        and data.ndim == 3
        and gather_fits_vmem(data, indices)
    ):
        g = gather_points_kmajor(data, indices)  # [B, k, M, C]
        return jnp.sum(g * jnp.swapaxes(weights, 1, 2)[..., None], axis=1)
    return jnp.sum(gather_points(data, indices) * weights[..., None], axis=2)
