"""Continuous point convolutions (channel-last).

PointConv: KNN gather -> relative-xyz weight-net MLP(3->[8,16]) ->
weights^T @ knn_feats -> linear. The contraction is a [k x (C+3)] x [k x 16]
matmul per point, batched over B*M — dense MXU work.
Reference semantics: models/point_conv.py:7-70.

PointConvDW: depthwise variant — MLP on features, elementwise * weight_net(dxyz),
max-pool over k. Reference semantics: models/point_conv.py:102-130.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import gather_points, k_nearest_neighbor
from .layers import MLP, Norm, apply_act, dense


def _resolve_knn(
    xyz: jax.Array,
    sampled_xyz: jax.Array,
    knn_indices: jax.Array | None,
    k: int,
) -> jax.Array:
    if knn_indices is None:
        return k_nearest_neighbor(xyz, sampled_xyz, k)
    assert knn_indices.shape[:2] == sampled_xyz.shape[:2]
    assert knn_indices.shape[2] >= k
    return knn_indices[:, :, :k]


class PointConv(nn.Module):
    """Continuous conv as a (16 x (C+3)) matmul per point."""

    out_channels: int
    norm: str | None = None
    act: str | None = "leaky_relu"
    k: int = 16

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: jax.Array,
        sampled_xyz: jax.Array | None = None,
        knn_indices: jax.Array | None = None,
        train: bool = False,
        fast: bool = False,
    ) -> jax.Array:
        """
        Args:
          xyz: [B, N, 3] point locations.
          features: [B, N, C] point features.
          sampled_xyz: [B, M, 3] output locations (defaults to xyz).
          knn_indices: optional precomputed [B, M, >=k] neighbour indices.
          fast: inference-only — route the two KNN gathers through the
            VMEM-resident Pallas kernel (k-major layout; bit-identical gather
            values, einsum contraction order may differ in f32 rounding).
        Returns:
          [B, M, out_channels].
        """
        if sampled_xyz is None:
            sampled_xyz = xyz
        batch, n_samples = sampled_xyz.shape[:2]

        features = jnp.concatenate([xyz.astype(features.dtype), features], axis=-1)
        knn_indices = _resolve_knn(xyz, sampled_xyz, knn_indices, self.k)

        from ..ops.pallas_gather import (
            gather_fits_vmem,
            gather_points_kmajor,
            pallas_gather_enabled,
        )

        kmajor = (
            fast
            and pallas_gather_enabled()
            and gather_fits_vmem(features, knn_indices)
        )
        if kmajor:
            # tap-contiguous Pallas gathers; the contraction over k is the
            # same sum either way, just indexed k-major
            gather = gather_points_kmajor  # -> [B, k, M, C]
            center = sampled_xyz[:, None, :, :]
            einsum_spec = "bkmw,bkmc->bmwc"
        else:
            gather = gather_points  # -> [B, M, k, C]
            center = sampled_xyz[:, :, None, :]
            einsum_spec = "bmkw,bmkc->bmwc"

        rel_xyz = (gather(xyz, knn_indices) - center).astype(features.dtype)
        weights = MLP([8, 16], act=self.act, name="weight_net")(
            rel_xyz, train=train
        )  # [..., 16]

        knn_feats = gather(features, knn_indices)
        # [B, M, 16, C+3]; flatten weights-major to match the reference's
        # view(bs, n, -1) ordering (point_conv.py:65-66) for checkpoint parity.
        out = jnp.einsum(
            einsum_spec, weights, knn_feats, preferred_element_type=jnp.float32
        ).astype(features.dtype)
        out = out.reshape(batch, n_samples, -1)
        out = dense(self.out_channels, name="linear")(out)
        out = Norm(self.norm)(out, train=train)
        return apply_act(out, self.act)


class PointNet2(nn.Module):
    """PointNet++-style set abstraction: MLP over [dxyz, feats], max over k.

    Unused by the shipped models (like the reference's point_conv.py:73-99)
    but part of the building-block inventory.
    """

    mlp_channels: tuple[int, ...]
    norm: str | None = None
    act: str | None = "leaky_relu"
    k: int = 16

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: jax.Array,
        sampled_xyz: jax.Array | None = None,
        knn_indices: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        if sampled_xyz is None:
            sampled_xyz = xyz
        knn_indices = _resolve_knn(xyz, sampled_xyz, knn_indices, self.k)
        knn_xyz = gather_points(xyz, knn_indices)
        rel_xyz = (knn_xyz - sampled_xyz[:, :, None, :]).astype(features.dtype)
        knn_feats = gather_points(features, knn_indices)
        out = MLP(list(self.mlp_channels), norm=self.norm, act=self.act, name="mlp")(
            jnp.concatenate([rel_xyz, knn_feats], axis=-1), train=train
        )
        return jnp.max(out, axis=2)


class PointConvDW(nn.Module):
    """Depthwise point conv: feat MLP * weight_net(dxyz), max over k.

    Setup-style so the geometric weights — which depend only on point
    positions, not features — can be precomputed once via `compute_weights`
    and reused across refinement iterations (the RAFT-style loops re-run this
    conv 10-20x on fixed geometry). Param paths are identical to the previous
    compact layout (`mlp`, `weight_net`).
    """

    out_channels: int
    norm: str | None = None
    act: str | None = "leaky_relu"
    k: int = 16

    def setup(self):
        self.mlp = MLP([self.out_channels], norm=self.norm, act=self.act)
        self.weight_net = MLP([8, 32, self.out_channels], act="relu")

    def compute_weights(
        self,
        xyz: jax.Array,
        sampled_xyz: jax.Array | None = None,
        knn_indices: jax.Array | None = None,
        train: bool = False,
        dtype=None,
    ) -> jax.Array:
        """Loop-invariant geometric weights [B, M, k, out_channels]."""
        if sampled_xyz is None:
            sampled_xyz = xyz
        knn_indices = _resolve_knn(xyz, sampled_xyz, knn_indices, self.k)
        knn_xyz = gather_points(xyz, knn_indices)  # [B, M, k, 3]
        rel_xyz = knn_xyz - sampled_xyz[:, :, None, :]
        if dtype is not None:
            rel_xyz = rel_xyz.astype(dtype)
        return self.weight_net(rel_xyz, train=train)

    def __call__(
        self,
        xyz: jax.Array,
        features: jax.Array,
        sampled_xyz: jax.Array | None = None,
        knn_indices: jax.Array | None = None,
        train: bool = False,
        weights: jax.Array | None = None,
        fast: bool = False,
    ) -> jax.Array:
        """`fast=True` (inference only): the per-point features are cast to
        bfloat16 before the KNN gather, halving the gather's HBM traffic —
        the dominant in-loop cost of the 9 refinement-scan point convs
        (~2^-9 relative on the conv output; see PARITY.md).

        When `weights` is an OHG pack (ops/pallas_ohg.py — k-major
        prearranged weights + indices, produced by the cores' precompute on
        the fast path), the gather + multiply + max tail runs as ONE
        one-hot-MXU Pallas kernel, bit-identical to the fast gather path."""
        from ..ops.pallas_ohg import dw_conv_ohg, is_ohg_pack

        if is_ohg_pack(weights):
            assert fast, "OHG packs are inference-only"
            features = self.mlp(features, train=train).astype(jnp.bfloat16)
            return dw_conv_ohg(
                features, weights["idx_km"], weights["w_km"], self.k
            )
        if weights is None:
            weights = self.compute_weights(
                xyz, sampled_xyz, knn_indices, train=train, dtype=features.dtype
            )
        if sampled_xyz is None:
            sampled_xyz = xyz
        knn_indices = _resolve_knn(xyz, sampled_xyz, knn_indices, self.k)

        features = self.mlp(features, train=train)
        if fast:
            features = features.astype(jnp.bfloat16)
            weights = weights.astype(jnp.bfloat16)
        knn_feats = gather_points(features, knn_indices)  # [B, M, k, out]
        out = jnp.max(knn_feats * weights, axis=2)  # [B, M, out]
        return out.astype(jnp.float32) if fast else out


def paired_dw_conv(
    conv_a: PointConvDW,
    conv_b: PointConvDW,
    xyz: jax.Array,
    features: jax.Array,
    knn_indices: jax.Array | None = None,
    weights: jax.Array | None = None,
    train: bool = False,
    fast: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Two PointConvDW convs over the SAME (input, knn) with ONE gather.

    conv_z / conv_r in a point GRU both consume `hx` with identical neighbour
    indices, so their feature gathers can be merged: gather the channel-concat
    of both MLP outputs once, multiply by the channel-concat of both weight
    tensors (`weights`, pre-concatenated by the caller's precompute so the
    concat stays outside the refinement scan), max over k, split.
    Bit-identical to two independent calls (the max and multiply are
    per-channel), at half the gather op count.

    Reference semantics: two sequential PointConvDWs over hx
    (models/point_conv.py:102-130 via camliraft_l_core.py:119-134).
    """
    assert conv_a.k == conv_b.k
    from ..ops.pallas_ohg import dw_conv_ohg, is_ohg_pack

    if is_ohg_pack(weights):
        # one-hot-MXU fused gather/multiply/max over the channel-concat of
        # both convs' MLP outputs (ops/pallas_ohg.py) — same merged-gather
        # semantics as below, one Pallas call
        assert fast, "OHG packs are inference-only"
        fa = conv_a.mlp(features, train=train)
        fb = conv_b.mlp(features, train=train)
        feats = jnp.concatenate([fa, fb], axis=-1).astype(jnp.bfloat16)
        out = dw_conv_ohg(
            feats, weights["idx_km"], weights["w_km"], conv_a.k
        )
        return out[..., : fa.shape[-1]], out[..., fa.shape[-1] :]
    if weights is None:
        weights = jnp.concatenate(
            [
                conv.compute_weights(
                    xyz, knn_indices=knn_indices, train=train,
                    dtype=features.dtype,
                )
                for conv in (conv_a, conv_b)
            ],
            axis=-1,
        )
    idx = _resolve_knn(xyz, xyz, knn_indices, conv_a.k)

    fa = conv_a.mlp(features, train=train)
    fb = conv_b.mlp(features, train=train)
    ca = fa.shape[-1]
    feats = jnp.concatenate([fa, fb], axis=-1)
    if fast:
        feats = feats.astype(jnp.bfloat16)
        weights = weights.astype(jnp.bfloat16)
    knn_feats = gather_points(feats, idx)  # [B, M, k, ca+cb]
    out = jnp.max(knn_feats * weights, axis=2)
    if fast:
        out = out.astype(jnp.float32)
    # activations live inside each conv's MLP (before the gather), so the
    # split halves are already final
    return out[..., :ca], out[..., ca:]
