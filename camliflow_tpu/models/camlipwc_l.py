"""CamLiPWC-L: LiDAR-only coarse-to-fine scene flow (point-space PWC).

Reference semantics: models/camlipwc_l_core.py (FeaturePyramid3D, patch-based
Correlation3D, FlowEstimator3D, CamLiPWC_L_Core) and models/camlipwc_l.py
(IDS gating, pyramid loss).

The coarse-to-fine decode is a Python loop over 5 static pyramid levels (the
levels have different point counts, so this is inherently unrolled — each
level compiles once).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import MLP, DenseNormAct, dense
from ..nn.point_conv import PointConv
from ..ops.geometry import (
    backwarp_3d,
    build_pc_pyramid,
    gather_points,
    k_nearest_neighbor,
    knn_interpolation,
)
from ..ops.ids import make_parallel_camera_info, paral2persp, persp2paral
from .losses import calc_pyramid_loss_3d
from .metrics import compute_3d_metrics, merge_metrics, scalar_metric


class FeaturePyramid3D(nn.Module):
    """6-level point feature pyramid (camlipwc_l_core.py:8-36)."""

    n_channels: tuple[int, ...] = (16, 32, 64, 96, 128, 192)
    norm: str | None = "batch_norm"
    k: int = 16

    @nn.compact
    def __call__(self, xyzs: list[jax.Array], train: bool = False) -> list[jax.Array]:
        c = self.n_channels
        feats = [MLP([c[0], c[0]], name="level0_mlp")(xyzs[0], train=train)]
        for i in range(len(c) - 1):
            feat = MLP([c[i], c[i + 1]], name=f"mlp_{i}")(feats[-1], train=train)
            feats.append(
                PointConv(c[i + 1], norm=self.norm, k=self.k, name=f"conv_{i}")(
                    xyzs[i], feat, xyzs[i + 1], train=train
                )
            )
        return feats


class Correlation3DPWC(nn.Module):
    """Patch-to-patch cost volume (camlipwc_l_core.py:39-106).

    p2p cost from KNN(xyz1 -> xyz2) MLP, weighted-summed over the xyz2
    neighbourhood (weight_net2), then re-aggregated over the xyz1
    neighbourhood (weight_net1).
    """

    out_channels: int
    align_channels: int | None = None
    k: int = 16

    @nn.compact
    def __call__(
        self,
        xyz1: jax.Array,
        feat1: jax.Array,
        xyz2: jax.Array,
        feat2: jax.Array,
        knn_indices_1in1: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        batch, n_points, in_channels = feat1.shape

        # Step 1: neighbours of xyz1 in xyz2
        knn_1in2 = k_nearest_neighbor(xyz2, xyz1, k=self.k)  # [B, N, k]
        knn_xyz2 = gather_points(xyz2, knn_1in2)
        knn_xyz2_norm = (knn_xyz2 - xyz1[:, :, None, :]).astype(feat1.dtype)
        knn_feat2 = gather_points(feat2, knn_1in2)  # [B, N, k, C]
        feat1_expand = jnp.broadcast_to(
            feat1[:, :, None, :], (batch, n_points, self.k, in_channels)
        )
        concat = jnp.concatenate([feat1_expand, knn_feat2, knn_xyz2_norm], axis=-1)
        p2p_cost = MLP(
            [self.out_channels, self.out_channels], act="leaky_relu", name="cost_mlp"
        )(concat, train=train)

        weights2 = MLP([8, 8, self.out_channels], act="relu", name="weight_net2")(
            knn_xyz2_norm, train=train
        )
        p2n_cost = jnp.sum(weights2 * p2p_cost, axis=2)  # [B, N, out]

        # Step 2: neighbours of xyz1 in xyz1
        if knn_indices_1in1 is not None:
            knn_1in1 = knn_indices_1in1[:, :, : self.k]
        else:
            knn_1in1 = k_nearest_neighbor(xyz1, xyz1, k=self.k)
        knn_xyz1 = gather_points(xyz1, knn_1in1)
        knn_xyz1_norm = (knn_xyz1 - xyz1[:, :, None, :]).astype(feat1.dtype)

        weights1 = MLP([8, 8, self.out_channels], act="relu", name="weight_net1")(
            knn_xyz1_norm, train=train
        )
        n2n_cost = gather_points(p2n_cost, knn_1in1)  # [B, N, k, out]
        n2n_cost = jnp.sum(weights1 * n2n_cost, axis=2)

        if self.align_channels is not None:
            n2n_cost = DenseNormAct(self.align_channels, name="feat_aligner")(
                n2n_cost, train=train
            )
        return n2n_cost


class FlowEstimator3D(nn.Module):
    """2x PointConv + MLP (+ optional conv_last) (camlipwc_l_core.py:109-139)."""

    n_channels: tuple[int, ...]  # (in, c1, c2, c3)
    norm: str | None = None
    conv_last: bool = True
    k: int = 16

    @nn.compact
    def __call__(self, xyz, feat, knn_indices, train: bool = False):
        c = self.n_channels
        feat = PointConv(c[1], norm=self.norm, k=self.k, name="point_conv1")(
            xyz, feat, knn_indices=knn_indices, train=train
        )
        feat = PointConv(c[2], norm=self.norm, k=self.k, name="point_conv2")(
            xyz, feat, knn_indices=knn_indices, train=train
        )
        feat = MLP([c[2], c[3]], name="mlp")(feat, train=train)
        if self.conv_last:
            flow = dense(3, name="conv_last")(feat)
            return feat, flow
        return feat


class CamLiPWCLCore(nn.Module):
    """Coarse-to-fine 3D-only decoder (camlipwc_l_core.py:142-210)."""

    norm_feature_pyramid: str | None = "batch_norm"
    norm_flow_estimator: str | None = None

    def setup(self):
        self.feature_pyramid = FeaturePyramid3D(norm=self.norm_feature_pyramid)
        self.correlations = [
            Correlation3DPWC(c, align_channels=64, name=f"correlation_{i}")
            for i, c in enumerate([32, 64, 96, 128, 192], start=1)
        ]
        self.aligners = [
            DenseNormAct(64, name=f"aligner_{i}") for i in range(1, 6)
        ]
        self.flow_estimator = FlowEstimator3D(
            (64 + 64 + 3, 128, 128, 64), norm=self.norm_flow_estimator
        )

    def encode(self, xyzs, train: bool = False):
        return self.feature_pyramid(xyzs, train=train)

    def decode(self, xyzs1, xyzs2, feats1, feats2, train: bool = False):
        flows = []
        for level in range(len(xyzs1) - 1, 0, -1):
            xyz1, feat1 = xyzs1[level], feats1[level]
            xyz2, feat2 = xyzs2[level], feats2[level]
            knn1 = k_nearest_neighbor(xyz1, xyz1, k=16)

            if level == len(xyzs1) - 1:
                last_flow = jnp.zeros_like(xyz1, dtype=jnp.float32)
                xyz2_warp = xyz2
            else:
                last_flow = knn_interpolation(xyzs1[level + 1], flows[-1], xyz1)
                xyz2_warp = backwarp_3d(xyz1, xyz2, last_flow)

            x = jnp.concatenate(
                [
                    self.aligners[level - 1](feat1, train=train),
                    self.correlations[level - 1](
                        xyz1, feat1, xyz2_warp, feat2, knn1, train=train
                    ),
                    last_flow.astype(feat1.dtype),
                ],
                axis=-1,
            )
            _, flow_delta = self.flow_estimator(xyz1, x, knn1, train=train)
            flows.append(last_flow + flow_delta.astype(jnp.float32))

        flows = flows[::-1]
        return [
            knn_interpolation(xyzs1[i + 1], flow, xyzs1[i])
            for i, flow in enumerate(flows)
        ]


class CamLiPWCL(nn.Module):
    """Model wrapper (camlipwc_l.py:9-74)."""

    cfgs: Any
    train_mode: bool = False

    @nn.compact
    def __call__(self, inputs: dict) -> dict:
        train = self.train_mode
        pcs = inputs["pcs"]
        pc1, pc2 = pcs[..., :3], pcs[..., 3:]
        intrinsics = inputs["intrinsics"].astype(jnp.float32)

        persp_cam = {
            "projection_mode": "perspective",
            "sensor_h": 540,
            "sensor_w": 960,
            "f": intrinsics[:, 0],
            "cx": intrinsics[:, 1],
            "cy": intrinsics[:, 2],
        }
        ids_enabled = bool(self.cfgs["ids"]["enabled"])
        if ids_enabled:
            paral_cam = make_parallel_camera_info(540, 960)
            pc1 = persp2paral(pc1, persp_cam, paral_cam)
            pc2 = persp2paral(pc2, persp_cam, paral_cam)

        n_samples = list(self.cfgs.get("n_samples_list", (4096, 2048, 1024, 512, 256)))
        xyzs1, xyzs2, sample_indices1, _ = build_pc_pyramid(pc1, pc2, n_samples)

        core = CamLiPWCLCore(
            norm_feature_pyramid=self.cfgs["norm"]["feature_pyramid"],
            norm_flow_estimator=self.cfgs["norm"]["flow_estimator"],
            name="core",
        )
        feats1 = core.encode(xyzs1, train=train)
        feats2 = core.encode(xyzs2, train=train)
        flows = core.decode(xyzs1, xyzs2, feats1, feats2, train=train)

        if ids_enabled:
            flows = [
                paral2persp(xyz1 + flow, persp_cam, paral_cam)
                - paral2persp(xyz1, persp_cam, paral_cam)
                for xyz1, flow in zip(xyzs1, flows)
            ]

        return {
            "flow_3d": flows[0],
            "flows_3d": flows,
            "sample_indices1": sample_indices1,
        }


def loss_fn(outputs: dict, inputs: dict, cfgs: Any):
    target_3d = inputs["flow_3d"]
    loss = calc_pyramid_loss_3d(
        outputs["flows_3d"],
        target_3d,
        level_weights=list(cfgs.loss.level_weights),
        order=cfgs.loss.order,
        indices=outputs["sample_indices1"],
    )
    metrics = merge_metrics(
        {"loss3d": scalar_metric(loss)},
        compute_3d_metrics(outputs["flow_3d"], target_3d[..., :3]),
    )
    return loss, metrics


def is_better(curr: dict, best: dict | None) -> bool:
    if best is None:
        return True
    return curr["epe3d"] < best["epe3d"]
