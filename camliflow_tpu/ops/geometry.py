"""Point-cloud geometry kernels: pairwise distance, KNN, gather, interpolation.

Semantics match the reference CUDA ops and their PyTorch fallbacks
(reference: models/csrc/wrapper.py:60-127, models/utils.py:61-159), but the
implementation is TPU-first: brute-force distance matrices ride the MXU
(`-2 q@x^T + |q|^2 + |x|^2`), neighbour selection is `lax.top_k`, and all
shapes are static.

Layout convention: points are channel-last `[B, N, 3]`, features `[B, N, C]`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def squared_distance(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distance.

    Args:
      xyz1: [B, N, D] first point set (D <= 3).
      xyz2: [B, M, D] second point set.
    Returns:
      [B, N, M] squared distances.

    Reference semantics: models/csrc/wrapper.py:60-72.
    """
    # f32 accumulation: distances of bf16 coords lose too much precision for
    # stable neighbour ordering.
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    dist = -2.0 * jnp.einsum(
        "bnd,bmd->bnm",
        xyz1,
        xyz2,
        # HIGH (3-pass bf16) carries ~16 mantissa bits — ample for
        # neighbour ordering at half the cost of HIGHEST
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )
    dist = dist + jnp.sum(xyz1**2, -1)[:, :, None]
    dist = dist + jnp.sum(xyz2**2, -1)[:, None, :]
    return dist


@functools.partial(jax.jit, static_argnames=("k",))
def k_nearest_neighbor(input_xyz: jax.Array, query_xyz: jax.Array, k: int) -> jax.Array:
    """Indices of the k nearest points in `input_xyz` for each query.

    Args:
      input_xyz: [B, M, D] points to search in.
      query_xyz: [B, N, D] query points.
      k: number of neighbours (static).
    Returns:
      [B, N, k] int32 indices into `input_xyz`, sorted ascending by distance.

    Reference semantics: models/csrc/wrapper.py:106-127 (dense distance +
    topk(largest=False)). Both selection paths break ties by smallest index,
    matching the PyTorch fallback.

    TPU note: selections route to a Pallas kernel (tiled distance matmul +
    k min/mask passes over a VMEM scratch) whenever the distance tile fits
    VMEM — ~8x faster than the hierarchical lax.top_k path on the encoder's
    [2, 4096, 8192] k=16 query; the dense matrix + top_k is the fallback.
    """
    from .pallas_knn import MAX_K, MAX_SUPPORT, k_nearest_neighbor_pallas

    if (
        _on_tpu()
        and k <= MAX_K
        and input_xyz.shape[1] <= MAX_SUPPORT
        and k <= input_xyz.shape[1]
    ):
        return k_nearest_neighbor_pallas(input_xyz, query_xyz, k)
    dists = squared_distance(query_xyz, input_xyz)  # [B, N, M]
    return knn_from_dists(dists, k)


def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantisation along the LAST axis.

    Returns (q int8, scale f32 with a trailing 1-axis) with
    x ≈ q * scale, scale = max|row| / 127. Used for loop-constant cost
    volumes on the fast-inference path (the int8 values are exact in any
    float dtype, so selection/extraction stays exact; only the final
    dequantised magnitude rounds — max error scale/2 = max|row|/254).
    Forward-only (no useful gradient). Same scheme as the 2D volume's
    `pad_pyramid_for_lookup(storage="int8")`.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


@functools.cache
def _on_tpu() -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform not in ("cpu", "gpu")


_FAST_LOGGED = False


def resolve_fast_inference(mode: str, eval_final_only: bool) -> bool:
    """Resolve the `model.fast_inference` config knob to a bool.

    mode:
      "auto" — fast path iff evaluating (final_only) on TPU (default).
      "on"   — fast path whenever evaluating, any platform (CPU hits the
               Pallas interpret path; mainly for tests).
      "off"  — exact path everywhere, including TPU. This is the on-hardware
               numerics gate: the reference eval is exact f32
               (eval_things.py:48), and `off` lets the same be run on the
               chip to bound the fast path's error.

    The fast path is approximate (int8 correlation-volume lookup, Pallas
    HIGHEST-precision selection) and forward-only, so it never engages during
    training regardless of mode. Logs once when it first engages so
    platform-dependent eval numerics are visible to callers (documented
    envelope: flow delta ~1e-3 px, PARITY.md).
    """
    global _FAST_LOGGED
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"fast_inference must be auto|on|off, got {mode!r}")
    if mode == "off" or not eval_final_only:
        return False
    fast = True if mode == "on" else _on_tpu()
    if fast and not _FAST_LOGGED:
        import logging

        logging.getLogger("camliflow_tpu").info(
            "fast_inference engaged (mode=%s): int8 correlation-volume lookup "
            "+ Pallas selection kernels; set model.fast_inference=off for the "
            "exact eval path", mode,
        )
        _FAST_LOGGED = True
    return fast


@functools.partial(jax.jit, static_argnames=("k",))
def knn_from_dists(dists: jax.Array, k: int) -> jax.Array:
    """Top-k smallest along the last axis of a precomputed distance matrix.

    Lets callers share one distance matrix across several selections (e.g.
    prefix-nested pyramid levels are column-prefixes of the finest level's
    matrix).

    For wide rows this uses an exact two-stage hierarchical selection: top-k
    within 128-column blocks, then top-k over the k*n_blocks candidates.
    The true global top-k is always contained in the union of per-block
    top-ks, and tie-breaking (lowest index first) survives both stages, so
    the result is identical to a flat `lax.top_k` — at a fraction of its
    sort cost on TPU.
    """
    m = dists.shape[-1]
    block = 128
    if m % block != 0 or m // block < 4 or k > block:
        _, idx = jax.lax.top_k(-dists, k)
        return idx.astype(jnp.int32)

    n_blocks = m // block
    shaped = dists.reshape(*dists.shape[:-1], n_blocks, block)
    neg_vals, local_idx = jax.lax.top_k(-shaped, k)  # [..., n_blocks, k]
    block_base = (
        jax.lax.broadcasted_iota(jnp.int32, (n_blocks, k), 0) * block
    )
    global_idx = local_idx.astype(jnp.int32) + block_base  # [..., n_blocks, k]
    cand_vals = neg_vals.reshape(*dists.shape[:-1], n_blocks * k)
    cand_idx = global_idx.reshape(*dists.shape[:-1], n_blocks * k)
    _, sel = jax.lax.top_k(cand_vals, k)  # [..., k]
    return jnp.take_along_axis(cand_idx, sel, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "chunk_size"))
def k_nearest_neighbor_chunked(
    input_xyz: jax.Array,
    query_xyz: jax.Array,
    k: int,
    chunk_size: int = 8192,
) -> jax.Array:
    """KNN with the query set processed in chunks via `lax.map`.

    Bounds peak memory to [B, chunk, M] instead of [B, N, M] — needed when the
    query set is an image grid (CLFM FusionAwareInterp at fine PWC levels,
    where HW can exceed 10^5). Results are identical to `k_nearest_neighbor`.
    """
    batch, n_queries, dim = query_xyz.shape
    if n_queries <= chunk_size:
        return k_nearest_neighbor(input_xyz, query_xyz, k)
    pad = (-n_queries) % chunk_size
    padded = jnp.pad(query_xyz, ((0, 0), (0, pad), (0, 0)))
    n_chunks = padded.shape[1] // chunk_size
    chunks = padded.reshape(batch, n_chunks, chunk_size, dim).transpose(1, 0, 2, 3)
    out = jax.lax.map(
        lambda q: k_nearest_neighbor(input_xyz, q, k), chunks
    )  # [n_chunks, B, chunk, k]
    out = out.transpose(1, 0, 2, 3).reshape(batch, n_chunks * chunk_size, k)
    return out[:, :n_queries]


def gather_points(data: jax.Array, indices: jax.Array) -> jax.Array:
    """Batched gather along the points axis (channel-last `batch_indexing`).

    Args:
      data: [B, N, C] per-point data (or [B, N] without channels).
      indices: [B, I1, ..., Im] integer indices into the N axis.
    Returns:
      [B, I1, ..., Im, C] (or [B, I1, ..., Im] when data is 2-D).

    Reference semantics: models/utils.py:61-104 (`batch_indexing`), transposed
    to channel-last.
    """
    squeeze = data.ndim == 2
    if squeeze:
        data = data[..., None]
    batch, _, channels = data.shape
    idx_shape = indices.shape
    flat = indices.reshape(batch, -1)
    out = jnp.take_along_axis(data, flat[..., None].astype(jnp.int32), axis=1)
    out = out.reshape(*idx_shape, channels)
    if squeeze:
        out = out[..., 0]
    return out


@functools.partial(jax.jit, static_argnames=("k", "fast"))
def knn_interpolation(
    input_xyz: jax.Array,
    input_features: jax.Array,
    query_xyz: jax.Array,
    k: int = 3,
    fast: bool = False,
) -> jax.Array:
    """Inverse-distance weighted interpolation from k nearest neighbours.

    Args:
      input_xyz: [B, M, 3] source point locations.
      input_features: [B, M, C] source features.
      query_xyz: [B, N, 3] query locations.
      k: number of neighbours.
      fast: route through the fused Pallas kernel (forward-only — inference).
    Returns:
      [B, N, C] interpolated features.

    Reference semantics: models/utils.py:130-146.
    """
    if fast and _on_tpu():
        from .pallas_interp import knn_interpolation_pallas

        return knn_interpolation_pallas(input_xyz, input_features, query_xyz, k)
    knn_indices = k_nearest_neighbor(input_xyz, query_xyz, k)  # [B, N, k]
    knn_xyz = gather_points(input_xyz, knn_indices)  # [B, N, k, 3]
    diff = (knn_xyz - query_xyz[:, :, None, :]).astype(jnp.float32)
    knn_dists = jnp.maximum(
        jnp.linalg.norm(diff, axis=-1), 1e-8
    )  # [B, N, k]; clamp mirrors reference .clamp(1e-8)
    weights = 1.0 / knn_dists
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    knn_features = gather_points(input_features, knn_indices)  # [B, N, k, C]
    return jnp.sum(knn_features * weights[..., None].astype(knn_features.dtype), axis=2)


@functools.partial(jax.jit, static_argnames=("k", "fast"))
def backwarp_3d(
    xyz1: jax.Array, xyz2: jax.Array, flow12: jax.Array, k: int = 3,
    fast: bool = False,
) -> jax.Array:
    """Warp `xyz2` towards frame 1 by interpolating the negated forward flow.

    Args:
      xyz1: [B, N, 3] points of frame 1.
      xyz2: [B, M, 3] points of frame 2.
      flow12: [B, N, 3] scene flow at frame-1 points.
      fast: fused Pallas interpolation (forward-only — inference).
    Returns:
      [B, M, 3] warped frame-2 points.

    Reference semantics: models/utils.py:149-159.
    """
    xyz1_warp = xyz1 + flow12
    flow21 = knn_interpolation(xyz1_warp, -flow12, query_xyz=xyz2, k=k, fast=fast)
    return xyz2 + flow21


@functools.partial(jax.jit, static_argnames=("n_samples",))
def furthest_point_sampling(xyz: jax.Array, n_samples: int) -> jax.Array:
    """Deterministic iterative furthest-point sampling.

    Starts at index 0; each step records the current index, updates the
    per-point min distance to the selected set, and takes the argmax.
    `jnp.argmax` returns the first maximal index, matching the PyTorch
    fallback's tie behaviour.

    Args:
      xyz: [B, N, 3] points.
      n_samples: number of points to select (static, < N).
    Returns:
      [B, n_samples] int32 indices.

    Reference semantics: models/csrc/wrapper.py:75-103. On TPU the loop runs
    as a VMEM-resident Pallas kernel (~2.4x faster than the XLA fori_loop).
    """
    if _on_tpu():
        from .pallas_fps import furthest_point_sampling_pallas

        return furthest_point_sampling_pallas(xyz, n_samples)
    batch, n_points, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def body(i, state):
        distances, farthest, indices = state
        indices = jax.lax.dynamic_update_index_in_dim(indices, farthest, i, axis=1)
        cur = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # [B, 1, 3]
        new_d = jnp.sum((xyz - cur) ** 2, axis=-1)  # [B, N]
        distances = jnp.minimum(distances, new_d)
        farthest = jnp.argmax(distances, axis=-1).astype(jnp.int32)
        return distances, farthest, indices

    init = (
        jnp.full((batch, n_points), 1e10, dtype=jnp.float32),
        jnp.zeros((batch,), dtype=jnp.int32),
        jnp.zeros((batch, n_samples), dtype=jnp.int32),
    )
    _, _, indices = jax.lax.fori_loop(0, n_samples, body, init)
    return indices


def build_pc_pyramid(
    pc1: jax.Array, pc2: jax.Array, n_samples_list: list[int]
) -> tuple[list[jax.Array], list[jax.Array], list[jax.Array], list[jax.Array]]:
    """Build nested FPS pyramids for two point clouds.

    One FPS pass at max(n_samples_list); coarser levels are prefix slices of
    the same ordering (FPS order makes prefixes valid subsamples).

    Args:
      pc1, pc2: [B, N, 3] input clouds.
      n_samples_list: per-level sample counts, e.g. [4096, 2048, 1024, 512, 256].
    Returns:
      (xyzs1, xyzs2, sample_indices1, sample_indices2) — lists with the full
      cloud at index 0 followed by one entry per pyramid level.

    Reference semantics: models/utils.py:107-127. The reference runs one FPS
    over the concatenated batch [pc1; pc2]; we batch the two clouds the same
    way so both frames share one kernel launch.
    """
    batch, n_points, _ = pc1.shape
    pc_both = jnp.concatenate([pc1, pc2], axis=0)
    sample_index_both = furthest_point_sampling(pc_both, max(n_samples_list))
    sample_index1 = sample_index_both[:batch]
    sample_index2 = sample_index_both[batch:]

    lv0_index = jnp.broadcast_to(
        jnp.arange(n_points, dtype=jnp.int32)[None], (batch, n_points)
    )
    xyzs1, xyzs2 = [pc1], [pc2]
    sample_indices1, sample_indices2 = [lv0_index], [lv0_index]
    for n_samples in n_samples_list:
        idx1 = sample_index1[:, :n_samples]
        idx2 = sample_index2[:, :n_samples]
        sample_indices1.append(idx1)
        sample_indices2.append(idx2)
        xyzs1.append(gather_points(pc1, idx1))
        xyzs2.append(gather_points(pc2, idx2))
    return xyzs1, xyzs2, sample_indices1, sample_indices2
