"""CamLiPWC: joint 2D + 3D coarse-to-fine flow with CLFM fusion at up to
3 points per pyramid level (pyramid features, correlations, estimator feats).

Reference semantics: models/camlipwc_core.py (CamLiPWC_Core) and
models/camlipwc.py (resize-to-64x, IDS, pyramid losses).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.clfm import CLFM
from ..nn.layers import Conv2dNormAct, DenseNormAct, dense, torch_kernel_init
from ..ops.correlation import correlation2d
from ..ops.geometry import (
    backwarp_3d,
    build_pc_pyramid,
    k_nearest_neighbor,
    knn_interpolation,
)
from ..ops.ids import (
    make_parallel_camera_info,
    paral2persp,
    persp2paral,
    project_pc2image,
)
from ..ops.image import (
    backwarp_2d,
    convex_upsample,
    resize_bilinear_align_corners,
    resize_flow2d,
    resize_to_multiple,
)
from .camlipwc_l import Correlation3DPWC, FeaturePyramid3D, FlowEstimator3D
from .losses import calc_pyramid_loss_2d, calc_pyramid_loss_3d
from .metrics import (
    compute_2d_metrics,
    compute_3d_metrics,
    merge_metrics,
    scalar_metric,
)
from .pwc import (
    ContextNetwork2D,
    FeaturePyramid2D,
    FlowEstimatorDense2D,
    FlowEstimatorLite2D,
    UpMaskHead,
    _upsample2x,
    _upsample2x_flow,
)


class CamLiPWCCore(nn.Module):
    """Fused coarse-to-fine core (camlipwc_core.py:17-237)."""

    cfgs2d: Any
    cfgs3d: Any
    fusion: Any

    def setup(self):
        cfgs2d, cfgs3d, fusion = self.cfgs2d, self.cfgs3d, self.fusion
        corr_channels_2d = (2 * cfgs2d["max_displacement"] + 1) ** 2
        channels = (32, 64, 96, 128, 192)

        self.branch_2d_fnet = FeaturePyramid2D(
            (16,) + channels, norm=cfgs2d["norm"]["feature_pyramid"]
        )
        self.branch_2d_fnet_aligners = [None] + [
            Conv2dNormAct(64, 1, name=f"fnet2d_aligner_{i}") for i in range(1, 6)
        ]
        est_cls = (
            FlowEstimatorLite2D if cfgs2d["lite_estimator"] else FlowEstimatorDense2D
        )
        self.branch_2d_flow_estimator = est_cls(
            (64 + corr_channels_2d + 2 + 32, 128, 128, 96, 64, 32),
            norm=cfgs2d["norm"]["flow_estimator"],
            conv_last=not fusion["fuse_estimator"],
        )
        self.branch_2d_context_network = ContextNetwork2D(
            (self.branch_2d_flow_estimator.flow_feat_dim + 2, 128, 128, 128, 96, 64, 32),
            (1, 2, 4, 8, 16, 1),
            norm=cfgs2d["norm"]["context_network"],
        )
        self.branch_2d_up_mask_head = UpMaskHead()

        self.branch_3d_fnet = FeaturePyramid3D(
            (16,) + channels, norm=cfgs3d["norm"]["feature_pyramid"], k=cfgs3d["k"]
        )
        self.branch_3d_fnet_aligners = [None] + [
            DenseNormAct(64, name=f"fnet3d_aligner_{i}") for i in range(1, 6)
        ]
        self.branch_3d_correlations = [None] + [
            Correlation3DPWC(c, k=cfgs3d["k"], name=f"correlation3d_{i}")
            for i, c in enumerate(channels, start=1)
        ]
        self.branch_3d_correlation_aligners = [None] + [
            DenseNormAct(64, name=f"corr3d_aligner_{i}") for i in range(1, 6)
        ]
        self.branch_3d_flow_estimator = FlowEstimator3D(
            (64 + 64 + 3 + 64, 128, 128, 64),
            norm=cfgs3d["norm"]["flow_estimator"],
            conv_last=not fusion["fuse_estimator"],
            k=cfgs3d["k"],
        )

        if fusion["fuse_pyramid"]:
            self.pyramid_clfms = [None] + [
                CLFM(c, c, norm=cfgs2d["norm"]["feature_pyramid"], name=f"clfm_pyr_{i}")
                for i, c in enumerate(channels, start=1)
            ]
        if fusion["fuse_correlation"]:
            self.corr_clfms = [None] + [
                CLFM(corr_channels_2d, c, name=f"clfm_corr_{i}")
                for i, c in enumerate(channels, start=1)
            ]
        if fusion["fuse_estimator"]:
            self.estimator_clfm = CLFM(
                self.branch_2d_flow_estimator.flow_feat_dim,
                self.branch_3d_flow_estimator.n_channels[3],
                name="clfm_estimator",
            )
            self.branch_2d_conv_last = nn.Conv(
                2,
                (3, 3),
                padding=((1, 1), (1, 1)),
                kernel_init=torch_kernel_init,
                name="conv_last_2d",
            )
            self.branch_3d_conv_last = dense(3, name="conv_last_3d")

    def encode(self, image, xyzs, train: bool = False):
        return (
            self.branch_2d_fnet(image, train=train),
            self.branch_3d_fnet(xyzs, train=train),
        )

    def decode(
        self,
        xyzs1,
        xyzs2,
        feats1_2d,
        feats2_2d,
        feats1_3d,
        feats2_3d,
        camera_info,
        train: bool = False,
    ):
        fusion = self.fusion
        flows_2d, flows_3d = [], []
        flow_feats_2d, flow_feats_3d = [], []

        for level in range(len(xyzs1) - 1, 0, -1):
            xyz1, feat1_2d, feat1_3d = xyzs1[level], feats1_2d[level], feats1_3d[level]
            xyz2, feat2_2d, feat2_3d = xyzs2[level], feats2_2d[level], feats2_3d[level]

            batch, image_h, image_w, _ = feat1_2d.shape
            n_points = xyz1.shape[1]

            sensor_h, sensor_w = camera_info["sensor_h"], camera_info["sensor_w"]
            scale = jnp.array(
                [(image_w - 1) / (sensor_w - 1), (image_h - 1) / (sensor_h - 1)],
                dtype=jnp.float32,
            )
            uv1 = project_pc2image(xyz1, camera_info) * scale
            uv2 = project_pc2image(xyz2, camera_info) * scale

            knn_xyz1 = k_nearest_neighbor(xyz1, xyz1, k=self.cfgs3d["k"])

            if fusion["fuse_pyramid"]:
                clfm = self.pyramid_clfms[level]
                feat1_2d, feat1_3d = clfm(uv1, feat1_2d, feat1_3d, train=train)
                feat2_2d, feat2_3d = clfm(uv2, feat2_2d, feat2_3d, train=train)

            if level == len(xyzs1) - 1:
                last_flow_2d = jnp.zeros((batch, image_h, image_w, 2), jnp.float32)
                last_feat_2d = jnp.zeros((batch, image_h, image_w, 32), feat1_2d.dtype)
                last_flow_3d = jnp.zeros((batch, n_points, 3), jnp.float32)
                last_feat_3d = jnp.zeros((batch, n_points, 64), feat1_3d.dtype)
                xyz2_warp, feat2_2d_warp = xyz2, feat2_2d
            else:
                last_flow_2d = _upsample2x_flow(flows_2d[-1])
                last_feat_2d = _upsample2x(flow_feats_2d[-1])
                interp = knn_interpolation(
                    xyzs1[level + 1],
                    jnp.concatenate([flows_3d[-1], flow_feats_3d[-1]], axis=-1),
                    xyz1,
                )
                last_flow_3d, last_feat_3d = interp[..., :3], interp[..., 3:]
                feat2_2d_warp = backwarp_2d(feat2_2d, last_flow_2d, "border")
                xyz2_warp = backwarp_3d(xyz1, xyz2, last_flow_3d)

            feat_corr_3d = self.branch_3d_correlations[level](
                xyz1, feat1_3d, xyz2_warp, feat2_3d, knn_xyz1, train=train
            )
            feat_corr_2d = nn.leaky_relu(
                correlation2d(feat1_2d, feat2_2d_warp, self.cfgs2d["max_displacement"]),
                negative_slope=0.1,
            )

            if fusion["fuse_correlation"]:
                feat_corr_2d, feat_corr_3d = self.corr_clfms[level](
                    uv1, feat_corr_2d, feat_corr_3d, train=train
                )

            feat1_2d = self.branch_2d_fnet_aligners[level](feat1_2d, train=train)
            feat1_3d = self.branch_3d_fnet_aligners[level](feat1_3d, train=train)
            feat_corr_3d = self.branch_3d_correlation_aligners[level](
                feat_corr_3d, train=train
            )

            x_2d = jnp.concatenate(
                [feat_corr_2d, feat1_2d, last_flow_2d.astype(feat1_2d.dtype), last_feat_2d],
                axis=-1,
            )
            x_3d = jnp.concatenate(
                [feat_corr_3d, feat1_3d, last_flow_3d.astype(feat1_3d.dtype), last_feat_3d],
                axis=-1,
            )

            if fusion["fuse_estimator"]:
                flow_feat_2d = self.branch_2d_flow_estimator(x_2d, train=train)
                flow_feat_3d = self.branch_3d_flow_estimator(
                    xyz1, x_3d, knn_xyz1, train=train
                )
                flow_feat_2d, flow_feat_3d = self.estimator_clfm(
                    uv1, flow_feat_2d, flow_feat_3d, train=train
                )
                flow_delta_2d = self.branch_2d_conv_last(flow_feat_2d)
                flow_delta_3d = self.branch_3d_conv_last(flow_feat_3d)
            else:
                flow_feat_2d, flow_delta_2d = self.branch_2d_flow_estimator(
                    x_2d, train=train
                )
                flow_feat_3d, flow_delta_3d = self.branch_3d_flow_estimator(
                    xyz1, x_3d, knn_xyz1, train=train
                )

            flow_2d = last_flow_2d + flow_delta_2d.astype(jnp.float32)
            flow_3d = last_flow_3d + flow_delta_3d.astype(jnp.float32)

            # context network (2D only)
            flow_feat_2d, flow_delta_2d = self.branch_2d_context_network(
                jnp.concatenate([flow_feat_2d, flow_2d.astype(flow_feat_2d.dtype)], -1),
                train=train,
            )
            flow_2d = flow_delta_2d.astype(jnp.float32) + flow_2d

            flow_2d = jnp.clip(flow_2d, -1000.0, 1000.0)
            flow_3d = jnp.clip(flow_3d, -100.0, 100.0)

            flows_2d.append(flow_2d)
            flows_3d.append(flow_3d)
            flow_feats_2d.append(flow_feat_2d)
            flow_feats_3d.append(flow_feat_3d)

        flows_2d = [f.astype(jnp.float32) for f in flows_2d][::-1]
        flows_3d = [f.astype(jnp.float32) for f in flows_3d][::-1]

        flows_2d[0] = convex_upsample(
            flows_2d[0], self.branch_2d_up_mask_head(flow_feat_2d), scale_factor=4
        )
        for i in range(1, len(flows_2d)):
            h, w = flows_2d[i].shape[1:3]
            flows_2d[i] = resize_bilinear_align_corners(flows_2d[i] * 4.0, h * 4, w * 4)
        for i in range(len(flows_3d)):
            flows_3d[i] = knn_interpolation(xyzs1[i + 1], flows_3d[i], xyzs1[i])
        return flows_2d, flows_3d


class CamLiPWC(nn.Module):
    """Model wrapper (camlipwc.py:9-106)."""

    cfgs: Any
    train_mode: bool = False

    @nn.compact
    def __call__(self, inputs: dict) -> dict:
        train = self.train_mode
        images = inputs["images"].astype(jnp.float32) / 255.0
        pcs = inputs["pcs"]
        pc1, pc2 = pcs[..., :3], pcs[..., 3:]
        intrinsics = inputs["intrinsics"].astype(jnp.float32)

        origin_h, origin_w = images.shape[1:3]
        images, _ = resize_to_multiple(images, None, x=64)
        image1, image2 = images[..., :3], images[..., 3:]

        persp_cam = {
            "projection_mode": "perspective",
            "sensor_h": origin_h,
            "sensor_w": origin_w,
            "f": intrinsics[:, 0],
            "cx": intrinsics[:, 1],
            "cy": intrinsics[:, 2],
        }
        paral_cam = make_parallel_camera_info(image1.shape[1], image1.shape[2])
        pc1 = persp2paral(pc1, persp_cam, paral_cam)
        pc2 = persp2paral(pc2, persp_cam, paral_cam)

        n_samples = list(self.cfgs.get("n_samples_list", (4096, 2048, 1024, 512, 256)))
        xyzs1, xyzs2, sample_indices1, _ = build_pc_pyramid(pc1, pc2, n_samples)

        # freeze_bn (camlipwc.py:15-27): see camliraft.py wrapper note.
        if self.cfgs.get("freeze_bn", False):
            train = False

        core = CamLiPWCCore(
            cfgs2d=self.cfgs["pwc2d"],
            cfgs3d=self.cfgs["pwc3d"],
            fusion=self.cfgs["fusion"],
            name="core",
        )
        feats1_2d, feats1_3d = core.encode(image1, xyzs1, train=train)
        feats2_2d, feats2_3d = core.encode(image2, xyzs2, train=train)
        flows_2d, flows_3d = core.decode(
            xyzs1, xyzs2, feats1_2d, feats2_2d, feats1_3d, feats2_3d, paral_cam,
            train=train,
        )

        flows_3d = [
            paral2persp(xyz1 + flow, persp_cam, paral_cam)
            - paral2persp(xyz1, persp_cam, paral_cam)
            for xyz1, flow in zip(xyzs1, flows_3d)
        ]

        final_flow_2d = resize_flow2d(flows_2d[0], origin_h, origin_w)
        return {
            "flow_2d": final_flow_2d,
            "flow_3d": flows_3d[0],
            "flows_2d": flows_2d,
            "flows_3d": flows_3d,
            "sample_indices1": sample_indices1,
        }


def loss_fn(outputs: dict, inputs: dict, cfgs: Any):
    target_2d = inputs["flow_2d"]
    target_3d = inputs["flow_3d"]
    loss_2d = calc_pyramid_loss_2d(
        outputs["flows_2d"],
        target_2d,
        level_weights=list(cfgs.loss2d.level_weights),
        order=cfgs.loss2d.order,
    )
    loss_3d = calc_pyramid_loss_3d(
        outputs["flows_3d"],
        target_3d,
        level_weights=list(cfgs.loss3d.level_weights),
        order=cfgs.loss3d.order,
        indices=outputs["sample_indices1"],
    )
    loss = loss_2d + loss_3d
    metrics = merge_metrics(
        {
            "loss": scalar_metric(loss),
            "loss2d": scalar_metric(loss_2d),
            "loss3d": scalar_metric(loss_3d),
        },
        compute_2d_metrics(outputs["flow_2d"], target_2d),
        compute_3d_metrics(outputs["flow_3d"], target_3d),
    )
    if "occ_mask_3d" in inputs:
        metrics = merge_metrics(
            metrics,
            compute_3d_metrics(
                outputs["flow_3d"], target_3d, occ_mask=inputs["occ_mask_3d"]
            ),
        )
    return loss, metrics


def is_better(curr: dict, best: dict | None) -> bool:
    if best is None:
        return True
    return curr["epe2d"] < best["epe2d"]
