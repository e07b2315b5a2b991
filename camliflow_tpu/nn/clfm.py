"""CLFM: bidirectional Camera-LiDAR Fusion Module.

3D->2D: FusionAwareInterp — for every image pixel, the k=1 nearest projected
point (2D KNN); a learned score MLP over [du, dv, |d|] gates the scattered 3D
features onto the grid. 2D->3D: bilinear sample of image features at uv +
a 1x1 MLP. Then symmetric fusion heads (Add/Concat/Gated/SK, default 'sk').
Cross-branch inputs are stop-gradient'ed so each branch's gradients stay
modality-local.

Reference semantics: models/clfm.py:7-214.
Layout: feat_2d is NHWC, feat_3d is [B, N, C], uv is [B, N, 2] pixel coords.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import gather_points, k_nearest_neighbor_chunked
from ..ops.gridsample import grid_sample_points
from ..ops.image import mesh_grid
from .layers import DenseNormAct, dense


def fusion_interp_cache(uv: jax.Array, image_h: int, image_w: int, k: int = 1):
    """Precompute the pixel-grid KNN for FusionAwareInterp.

    The nearest-projected-point indices and offsets depend only on `uv` and
    the grid — both constant across RAFT refinement iterations — so callers
    with an iteration loop compute this once and pass it through the scan
    (the reference recomputes the full KNN every iteration,
    camliraft_core.py:110-123 via clfm.py:60).
    """
    batch = uv.shape[0]
    grid = mesh_grid(batch, image_h, image_w, dtype=jnp.float32)
    grid = grid.reshape(batch, image_h * image_w, 2)  # [B, HW, 2]
    knn_indices = k_nearest_neighbor_chunked(uv, grid, k)  # [B, HW, k]
    knn_uv = gather_points(uv, knn_indices)  # [B, HW, k, 2]
    knn_offset = knn_uv - grid[:, :, None, :]  # [B, HW, k, 2]
    return knn_indices, knn_offset


class FusionAwareInterp(nn.Module):
    """Scatter 3D features onto the image grid via nearest projected point."""

    n_channels_3d: int
    k: int = 1
    norm: str | None = None

    @nn.compact
    def __call__(
        self,
        uv: jax.Array,
        feat_2d: jax.Array,
        feat_3d: jax.Array,
        train: bool = False,
        interp_cache=None,
    ) -> jax.Array:
        batch, image_h, image_w, _ = feat_2d.shape
        if interp_cache is None:
            interp_cache = fusion_interp_cache(uv, image_h, image_w, self.k)
        knn_indices, knn_offset = interp_cache
        knn_feat3d = gather_points(feat_3d, knn_indices)  # [B, HW, k, C3]

        knn_offset_norm = jnp.linalg.norm(knn_offset, axis=-1, keepdims=True)
        score_input = jnp.concatenate([knn_offset, knn_offset_norm], axis=-1)

        score = DenseNormAct(16, name="score_net_0")(
            score_input.astype(feat_3d.dtype), train=train
        )
        score = DenseNormAct(self.n_channels_3d, act="sigmoid", name="score_net_1")(
            score, train=train
        )  # [B, HW, k, C3]

        final = jnp.sum(score * knn_feat3d, axis=2)  # [B, HW, C3]
        final = final.reshape(batch, image_h, image_w, self.n_channels_3d)
        return DenseNormAct(self.n_channels_3d, norm=self.norm, name="out_conv")(
            final, train=train
        )


class FusionAwareInterpCVPR(nn.Module):
    """CVPR-paper variant of the 3D->2D interpolation (clfm.py:82-109).

    Kept for checkpoint compatibility with CamLiFlow (CVPR 2022) weights;
    the TPAMI models use FusionAwareInterp above.
    """

    n_channels_3d: int
    norm: str | None = None

    @nn.compact
    def __call__(
        self, uv: jax.Array, feat_2d: jax.Array, feat_3d: jax.Array, train: bool = False
    ) -> jax.Array:
        batch, h, w, c2 = feat_2d.shape
        grid = mesh_grid(batch, h, w, dtype=jnp.float32).reshape(batch, h * w, 2)

        nn_indices = k_nearest_neighbor_chunked(uv, grid, 1)[..., 0]  # [B, HW]
        sampled = grid_sample_points(feat_2d, uv)  # [B, N, C2]
        nn_feat2d = jax.lax.stop_gradient(
            gather_points(sampled, nn_indices)
        )  # [B, HW, C2]
        nn_feat3d = jax.lax.stop_gradient(gather_points(feat_3d, nn_indices))
        nn_offset = jax.lax.stop_gradient(gather_points(uv, nn_indices) - grid)
        nn_corr = jnp.mean(
            nn_feat2d * jax.lax.stop_gradient(feat_2d).reshape(batch, h * w, c2),
            axis=-1,
            keepdims=True,
        )

        feat = jnp.concatenate([nn_offset, nn_corr, nn_feat3d], axis=-1)
        feat = feat.reshape(batch, h, w, -1)
        for i in range(3):
            feat = DenseNormAct(
                self.n_channels_3d, norm=self.norm, name=f"mlps_{i}"
            )(feat, train=train)
        return feat


class AddFusion(nn.Module):
    out_channels: int
    norm: str | None = None

    @nn.compact
    def __call__(self, feat_a, feat_b, train: bool = False):
        a = DenseNormAct(self.out_channels, norm=self.norm, name="align1")(
            feat_a, train=train
        )
        b = DenseNormAct(self.out_channels, norm=self.norm, name="align2")(
            feat_b, train=train
        )
        return nn.leaky_relu(a + b, negative_slope=0.1)


class ConcatFusion(nn.Module):
    out_channels: int
    norm: str | None = None

    @nn.compact
    def __call__(self, feat_a, feat_b, train: bool = False):
        x = jnp.concatenate([feat_a, feat_b], axis=-1)
        return DenseNormAct(self.out_channels, norm=self.norm, name="mlp")(
            x, train=train
        )


class GatedFusion(nn.Module):
    out_channels: int
    norm: str | None = None

    @nn.compact
    def __call__(self, feat_a, feat_b, train: bool = False):
        a = DenseNormAct(self.out_channels, norm=self.norm, name="align1")(
            feat_a, train=train
        )
        b = DenseNormAct(self.out_channels, norm=self.norm, name="align2")(
            feat_b, train=train
        )
        w = DenseNormAct(2, act="sigmoid", name="mlp1")(a, train=train) + DenseNormAct(
            2, act="sigmoid", name="mlp2"
        )(b, train=train)
        w = jax.nn.softmax(w, axis=-1)
        return a * w[..., 0:1] + b * w[..., 1:2]


class SKFusion(nn.Module):
    """Selective-kernel fusion (clfm.py:171-214)."""

    out_channels: int
    norm: str | None = None
    reduction: int = 1

    @nn.compact
    def __call__(self, feat_a, feat_b, train: bool = False):
        batch = feat_a.shape[0]
        a = DenseNormAct(self.out_channels, norm=self.norm, name="align1")(
            feat_a, train=train
        )
        b = DenseNormAct(self.out_channels, norm=self.norm, name="align2")(
            feat_b, train=train
        )
        spatial_axes = tuple(range(1, a.ndim - 1))
        weight = jnp.mean(a + b, axis=spatial_axes)  # [B, C]
        weight = nn.relu(
            dense(self.out_channels // self.reduction, use_bias=False, name="fc_mid")(
                weight
            )
        )
        weight = nn.sigmoid(
            dense(self.out_channels * 2, use_bias=False, name="fc_out")(weight)
        )
        weight = jax.nn.softmax(weight.reshape(batch, self.out_channels, 2), axis=-1)
        shape = (batch,) + (1,) * len(spatial_axes) + (self.out_channels,)
        w1 = weight[..., 0].reshape(shape)
        w2 = weight[..., 1].reshape(shape)
        return a * w1 + b * w2


_FUSIONS = {
    "add": AddFusion,
    "concat": ConcatFusion,
    "gated": GatedFusion,
    "sk": SKFusion,
}


class CLFM(nn.Module):
    """Bidirectional fusion of an image feature map and a point feature set."""

    in_channels_2d: int
    in_channels_3d: int
    fusion_fn: str = "sk"
    norm: str | None = None

    @nn.compact
    def __call__(
        self,
        uv: jax.Array,
        feat_2d: jax.Array,
        feat_3d: jax.Array,
        train: bool = False,
        interp_cache=None,
    ) -> tuple[jax.Array, jax.Array]:
        """
        Args:
          uv: [B, N, 2] projected point locations in feature-map pixel coords.
          feat_2d: [B, H, W, C2].
          feat_3d: [B, N, C3].
          interp_cache: optional precomputed `fusion_interp_cache(uv, H, W)`.
        Returns:
          (out_2d [B, H, W, C2], out_3d [B, N, C3]).
        """
        feat_2d = feat_2d.astype(jnp.float32)
        feat_3d = feat_3d.astype(jnp.float32)
        fusion_cls = _FUSIONS[self.fusion_fn]
        kwargs = {"reduction": 2} if self.fusion_fn == "sk" else {}

        feat_3d_interp = FusionAwareInterp(
            self.in_channels_3d, k=1, norm=self.norm, name="interp"
        )(
            uv,
            jax.lax.stop_gradient(feat_2d),
            jax.lax.stop_gradient(feat_3d),
            train=train,
            interp_cache=interp_cache,
        )
        out2d = fusion_cls(
            self.in_channels_2d, norm=self.norm, name="fuse2d", **kwargs
        )(feat_2d, feat_3d_interp, train=train)

        feat_2d_sampled = grid_sample_points(jax.lax.stop_gradient(feat_2d), uv)
        feat_2d_sampled = DenseNormAct(
            self.in_channels_2d, norm=self.norm, name="mlps3d"
        )(jax.lax.stop_gradient(feat_2d_sampled), train=train)
        out3d = fusion_cls(
            self.in_channels_3d, norm=self.norm, name="fuse3d", **kwargs
        )(feat_2d_sampled, feat_3d, train=train)

        return out2d, out3d
