"""One-hot MXU gather + fused PointConvDW tail (gather -> *w -> max over k).

Why: the refinement scan's nine PointConvDW convs spend ~13 ms/frame of the
flagship's 80 ms in XLA feature gathers plus their multiply/max-over-k
reduces (round-5 compute-line trace: three [65536, C] gather fusions at
~2 ms each, three [32768, C] at ~1 ms, plus the [2048, C]
multiply_reduce family). XLA row-gathers cost ~20 ns/row regardless of
width — a latency floor, not bandwidth (PERF.md round-3). In-kernel
`tpu.dynamic_gather` is dead on this toolchain (every dim-0 variant fails
to compile — PERF.md round-4 gather-probe verdict), which killed the
round-3 gather kernels. But a gather IS a one-hot matmul, and one-hot MXU
selection is the repo's fastest validated idiom (the 2D corr lookup). The
blocker for doing it in XLA is operand materialisation: the [M*k, N]
selection matrix is ~268 MB/conv/iteration in HBM. This kernel builds the
one-hot tiles in VMEM (never touching HBM), feeds them straight to the
MXU against the VMEM-resident feature table, and folds the whole
PointConvDW fast-path tail — bf16 weight multiply + max over k — into the
same kernel. HBM traffic per call drops to the index/weight/table reads
(all small or already paid); the cost is VPU one-hot generation
(M*k*N compares) + MXU streaming, both an order cheaper than the gather
floor at these shapes.

Exactness: a one-hot selection of bf16 table values is exact in the f32
accumulator (each output sums exactly one product), so the gather is
bit-identical to `take_along_axis`. The bf16 multiply and the max are the
same ops the XLA fast path runs; the max tree is associative. Only the
fast (inference) path routes here — training keeps the differentiable XLA
gather chain.

Layout: rows are tile-local k-major (row r of tile t = tap j*Mt + query m,
j = r // Mt) so the max-over-k is a log2(k) tree of STATIC sublane-slice
`maximum`s — no in-kernel reshapes or dynamic indexing, which Mosaic
cannot lower here. The k-major rearrangement of the (loop-invariant)
indices and hoisted geometric weights happens once in XLA at precompute
time, outside the refinement scan (`pack_dw` / `pack_dw_tree`).

Mosaic ground rules honoured (see pallas_corr3d.py / PERF.md):
- 32-bit i1 masks pair only with 32-bit operands (the one-hot is selected
  in f32, then converted to bf16 — never `where(mask_i32, bf16, bf16)`);
- the N dimension is chunked via the grid (innermost dim) with a
  persistent f32 scratch accumulator, so only one [rows, chunk] one-hot
  tile is live at a time (straight-line code gets no liveness reuse);
- all slices are static; iota + program_id arithmetic only.

Reference semantics: the gather/max tail of PointConvDW,
models/point_conv.py:102-130.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import _on_tpu

# rows (= k * tile_m) per grid tile; the [rows, chunk] one-hot tile is the
# VMEM hog (f32 + bf16 copies live together: 2048 x 512 x 6B = 6 MB)
_TILE_ROWS = 2048
_N_CHUNK = 512
# feature tables longer than this would need index-chunk masking; the
# in-loop convs all gather from N = M <= 4096 clouds
MAX_POINTS = 4096


def ohg_enabled() -> bool:
    """Trace-time switch for the one-hot MXU gather path (CAMLIFLOW_OHG,
    default OFF until the on-chip parity + timing validation passes — the
    CLAUDE.md hard rule. Per-process trace-time semantics like the other
    CAMLIFLOW_* gates: changing it mid-process is ignored by jit caches)."""
    return os.environ.get("CAMLIFLOW_OHG", "0") != "0"


def _supported(n_points: int, n_samples: int, k: int, tile_rows: int) -> bool:
    if k & (k - 1) or k > tile_rows:  # power of two, fits one tile
        return False
    tile_m = min(tile_rows, k * n_samples) // k
    if tile_m == 0 or n_samples % tile_m:
        return False
    return n_points <= MAX_POINTS and n_points % min(_N_CHUNK, n_points) == 0


def pack_dw(weights: jax.Array, idx: jax.Array) -> dict | None:
    """Rearrange hoisted PointConvDW weights + KNN indices to the kernel's
    tile-local k-major row layout. Runs once outside the refinement scan
    (the inputs are loop-invariant).

    Args:
      weights: [B, M, k, C] geometric weights (PointConvDW.compute_weights).
      idx: [B, M, >=k] int32 neighbour indices into an [B, N<=MAX, C] table.
    Returns:
      {"idx_km": [B, T*R, 1] i32, "w_km": [B, T*R, C] bf16} with
      R = k*tile_m rows per tile, row j*tile_m + m = tap j of query m —
      or None when the shapes don't fit the kernel contract.
    """
    batch, m_samples, k, channels = weights.shape
    if not _supported(MAX_POINTS, m_samples, k, _TILE_ROWS):
        return None
    tile_m = min(_TILE_ROWS, k * m_samples) // k
    n_tiles = m_samples // tile_m
    idx_km = (
        idx[:, :, :k]
        .reshape(batch, n_tiles, tile_m, k)
        .transpose(0, 1, 3, 2)
        .reshape(batch, n_tiles * k * tile_m, 1)
        .astype(jnp.int32)
    )
    w_km = (
        weights.reshape(batch, n_tiles, tile_m, k, channels)
        .transpose(0, 1, 3, 2, 4)
        .reshape(batch, n_tiles * k * tile_m, channels)
        .astype(jnp.bfloat16)
    )
    return {"idx_km": idx_km, "w_km": w_km}


def is_ohg_pack(weights) -> bool:
    return isinstance(weights, dict) and "idx_km" in weights


def pack_dw_tree(dw, knn_indices: jax.Array, n_points: int):
    """Convert every [B, M, k, C] leaf of a hoisted-dw tree to an OHG pack
    (k is read off the leaf; unsupported leaves stay as-is)."""
    if n_points > MAX_POINTS:
        return dw
    if isinstance(dw, dict):
        return {
            name: pack_dw_tree(w, knn_indices, n_points)
            for name, w in dw.items()
        }
    pack = pack_dw(dw, knn_indices)
    return dw if pack is None else pack


def _dw_kernel(idx_ref, f_ref, w_ref, out_ref, g_ref, *, n_chunks, chunk, tile_m):
    nc = pl.program_id(2)
    rows = idx_ref.shape[1]
    idx = idx_ref[0]  # [rows, 1] i32
    cols = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, chunk), 1) + nc * chunk
    )
    # 32-bit mask with 32-bit select operands; the f32 one-hot holds exact
    # {0, 1} so the bf16 convert is lossless
    onehot = jnp.where(cols == idx, 1.0, 0.0).astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        onehot,
        f_ref[0],  # [chunk, C] bf16
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rows, C] — exact gather values (one product per output)

    @pl.when(nc == 0)
    def _init():
        g_ref[...] = part

    @pl.when(nc > 0)
    def _acc():
        g_ref[...] = g_ref[...] + part

    @pl.when(nc == n_chunks - 1)
    def _tail():
        # the XLA fast path's tail: bf16 multiply, max over k (associative
        # — the static-slice tree gives the identical result)
        v = g_ref[...].astype(jnp.bfloat16) * w_ref[0]
        half = rows
        while half > tile_m:
            half //= 2
            v = jnp.maximum(v[:half], v[half : 2 * half])
        out_ref[0] = v.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def dw_conv_ohg(
    feats: jax.Array,
    idx_km: jax.Array,
    w_km: jax.Array,
    k: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused PointConvDW fast-path tail: out[m] = max_j feats[idx[m,j]] * w[m,j].

    Args:
      feats: [B, N, C] bfloat16 table (post-MLP features).
      idx_km / w_km: the `pack_dw` layout ([B, T*R, 1] i32 / [B, T*R, C] bf16).
      k: neighbours per query (power of two).
    Returns:
      [B, M, C] float32, bit-identical to the XLA fast path
      (gather -> bf16 multiply -> max -> f32).
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    batch, n_points, channels = feats.shape
    total_rows = idx_km.shape[1]
    m_samples = total_rows // k
    assert w_km.shape == (batch, total_rows, channels), (w_km.shape, feats.shape)
    tile_rows = min(_TILE_ROWS, total_rows)
    tile_m = tile_rows // k
    n_tiles = total_rows // tile_rows
    chunk = min(_N_CHUNK, n_points)
    n_chunks = n_points // chunk
    assert n_tiles * tile_rows == total_rows and n_chunks * chunk == n_points

    return pl.pallas_call(
        functools.partial(
            _dw_kernel, n_chunks=n_chunks, chunk=chunk, tile_m=tile_m
        ),
        out_shape=jax.ShapeDtypeStruct((batch, m_samples, channels), jnp.float32),
        grid=(batch, n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, tile_rows, 1), lambda b, t, c: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk, channels), lambda b, t, c: (b, c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_rows, channels), lambda b, t, c: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_m, channels), lambda b, t, c: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((tile_rows, channels), jnp.float32)],
        interpret=interpret,
    )(idx_km, feats.astype(jnp.bfloat16), w_km)
