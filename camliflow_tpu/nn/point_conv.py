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
    ) -> jax.Array:
        """
        Args:
          xyz: [B, N, 3] point locations.
          features: [B, N, C] point features.
          sampled_xyz: [B, M, 3] output locations (defaults to xyz).
          knn_indices: optional precomputed [B, M, >=k] neighbour indices.
        Returns:
          [B, M, out_channels].
        """
        if sampled_xyz is None:
            sampled_xyz = xyz
        batch, n_samples = sampled_xyz.shape[:2]

        features = jnp.concatenate([xyz.astype(features.dtype), features], axis=-1)
        knn_indices = _resolve_knn(xyz, sampled_xyz, knn_indices, self.k)

        knn_xyz = gather_points(xyz, knn_indices)  # [B, M, k, 3]
        rel_xyz = (knn_xyz - sampled_xyz[:, :, None, :]).astype(features.dtype)
        weights = MLP([8, 16], act=self.act, name="weight_net")(
            rel_xyz, train=train
        )  # [B, M, k, 16]

        knn_feats = gather_points(features, knn_indices)  # [B, M, k, C+3]
        # [B, M, 16, C+3]; flatten weights-major to match the reference's
        # view(bs, n, -1) ordering (point_conv.py:65-66) for checkpoint parity.
        out = jnp.einsum(
            "bmkw,bmkc->bmwc", weights, knn_feats, preferred_element_type=jnp.float32
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
    ) -> jax.Array:
        if weights is None:
            weights = self.compute_weights(
                xyz, sampled_xyz, knn_indices, train=train, dtype=features.dtype
            )
        if sampled_xyz is None:
            sampled_xyz = xyz
        knn_indices = _resolve_knn(xyz, sampled_xyz, knn_indices, self.k)

        features = self.mlp(features, train=train)
        knn_feats = gather_points(features, knn_indices)  # [B, M, k, out]
        return jnp.max(knn_feats * weights, axis=2)  # [B, M, out]
