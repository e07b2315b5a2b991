"""PWC-Net: 2D optical flow, coarse-to-fine with local cost volumes.

Reference semantics: models/pwc_core.py (ResidualBlock, FeaturePyramid2D,
FlowEstimatorLite2D/Dense2D, ContextNetwork2D, PWCCore) and models/pwc.py
(resize-to-64x wrapper, pyramid loss). NHWC throughout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import Conv2dNormAct, torch_kernel_init
from ..ops.correlation import correlation2d
from ..ops.image import (
    backwarp_2d,
    convex_upsample,
    resize_bilinear_align_corners,
    resize_flow2d,
    resize_to_multiple,
)
from .losses import calc_pyramid_loss_2d
from .metrics import compute_2d_metrics, merge_metrics, scalar_metric


def _upsample2x_flow(flow):
    """interpolate(flow * 2, scale_factor=2, align_corners=True) parity."""
    h, w = flow.shape[1:3]
    return resize_bilinear_align_corners(flow * 2.0, h * 2, w * 2)


def _upsample2x(feat):
    h, w = feat.shape[1:3]
    return resize_bilinear_align_corners(feat, h * 2, w * 2)


class ResidualBlock(nn.Module):
    """Downsampling residual conv block (pwc_core.py:9-28)."""

    out_channels: int
    norm: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        down = Conv2dNormAct(
            self.out_channels, 1, strides=2, norm=self.norm, act=None, name="down0"
        )(x, train=train)
        out = Conv2dNormAct(
            self.out_channels, 3, strides=2, norm=self.norm, name="conv0"
        )(x, train=train)
        out = Conv2dNormAct(
            self.out_channels, 3, norm=self.norm, act=None, name="conv1"
        )(out, train=train)
        return nn.leaky_relu(out + down, negative_slope=0.1)


class FeaturePyramid2D(nn.Module):
    """6-level image feature pyramid (pwc_core.py:31-44)."""

    n_channels: tuple[int, ...] = (16, 32, 64, 96, 128, 192)
    norm: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs = []
        for i, c in enumerate(self.n_channels):
            x = ResidualBlock(c, norm=self.norm, name=f"block_{i}")(x, train=train)
            outputs.append(x)
        return outputs


class FlowEstimatorLite2D(nn.Module):
    """Sequential-skip estimator (pwc_core.py:47-75)."""

    n_channels: tuple[int, ...]  # (in, c1..c5)
    norm: str | None = None
    conv_last: bool = True

    @property
    def flow_feat_dim(self):
        return self.n_channels[4] + self.n_channels[5]

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.n_channels
        x1 = Conv2dNormAct(c[1], 3, norm=self.norm, name="conv1")(x, train=train)
        x2 = Conv2dNormAct(c[2], 3, norm=self.norm, name="conv2")(x1, train=train)
        x3 = Conv2dNormAct(c[3], 3, norm=self.norm, name="conv3")(
            jnp.concatenate([x1, x2], -1), train=train
        )
        x4 = Conv2dNormAct(c[4], 3, norm=self.norm, name="conv4")(
            jnp.concatenate([x2, x3], -1), train=train
        )
        x5 = Conv2dNormAct(c[5], 3, norm=self.norm, name="conv5")(
            jnp.concatenate([x3, x4], -1), train=train
        )
        flow_feat = jnp.concatenate([x4, x5], -1)
        if self.conv_last:
            flow = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), kernel_init=torch_kernel_init, name="conv_last")(
                flow_feat
            )
            return flow_feat, flow
        return flow_feat


class FlowEstimatorDense2D(nn.Module):
    """DenseNet-style estimator (pwc_core.py:78-125)."""

    n_channels: tuple[int, ...]
    norm: str | None = None
    conv_last: bool = True

    @property
    def flow_feat_dim(self):
        return sum(self.n_channels)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.n_channels
        for i in range(1, 6):
            out = Conv2dNormAct(c[i], 3, norm=self.norm, name=f"conv{i}")(
                x, train=train
            )
            x = jnp.concatenate([out, x], axis=-1)
        flow_feat = x
        if self.conv_last:
            flow = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), kernel_init=torch_kernel_init, name="conv_last")(
                flow_feat
            )
            return flow_feat, flow
        return flow_feat


class ContextNetwork2D(nn.Module):
    """Dilated context refinement (pwc_core.py:128-141)."""

    n_channels: tuple[int, ...]
    dilations: tuple[int, ...] = (1, 2, 4, 8, 16, 1)
    norm: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (c, d) in enumerate(zip(self.n_channels[1:], self.dilations)):
            x = Conv2dNormAct(c, 3, dilation=d, norm=self.norm, name=f"conv_{i}")(
                x, train=train
            )
        out = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), kernel_init=torch_kernel_init, name="conv_last")(x)
        return x, out


class UpMaskHead(nn.Module):
    """Mask head for x4 convex upsampling (pwc_core.py:181-185)."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), kernel_init=torch_kernel_init, name="conv0")(x))
        return nn.Conv(4 * 4 * 9, (1, 1), kernel_init=torch_kernel_init, name="conv1")(x)


class PWCCore(nn.Module):
    """2D-only coarse-to-fine core (pwc_core.py:144-225)."""

    max_displacement: int = 4
    lite_estimator: bool = False
    norm_feature_pyramid: str | None = "batch_norm"
    norm_flow_estimator: str | None = None
    norm_context_network: str | None = None

    def setup(self):
        corr_channels = (self.max_displacement * 2 + 1) ** 2
        self.feature_pyramid = FeaturePyramid2D(
            (16, 32, 64, 96, 128, 192), norm=self.norm_feature_pyramid
        )
        self.aligners = [None] + [
            Conv2dNormAct(64, 1, name=f"aligner_{i}") for i in range(1, 6)
        ]
        est_cls = FlowEstimatorLite2D if self.lite_estimator else FlowEstimatorDense2D
        self.flow_estimator = est_cls(
            (64 + corr_channels + 2, 128, 128, 96, 64, 32),
            norm=self.norm_flow_estimator,
        )
        self.context_network = ContextNetwork2D(
            (self.flow_estimator.flow_feat_dim + 2, 128, 128, 128, 96, 64, 32),
            (1, 2, 4, 8, 16, 1),
            norm=self.norm_context_network,
        )
        self.up_mask_head = UpMaskHead()

    def encode(self, image, train: bool = False):
        return self.feature_pyramid(image, train=train)

    def decode(self, feats1, feats2, train: bool = False):
        flows = []
        flow_feat = None
        for level in range(len(feats1) - 1, 0, -1):
            feat1, feat2 = feats1[level], feats2[level]
            if not flows:
                batch, h, w, _ = feat1.shape
                last_flow = jnp.zeros((batch, h, w, 2), dtype=jnp.float32)
                feat2_warp = feat2
            else:
                last_flow = _upsample2x_flow(flows[-1])
                feat2_warp = backwarp_2d(feat2, last_flow, padding_mode="border")

            corr = nn.leaky_relu(
                correlation2d(feat1, feat2_warp, self.max_displacement),
                negative_slope=0.1,
            )
            feat1_aligned = self.aligners[level](feat1, train=train)
            flow_feat, flow_delta = self.flow_estimator(
                jnp.concatenate([corr, feat1_aligned, last_flow], axis=-1), train=train
            )
            flow = flow_delta + last_flow
            flow_feat, flow_delta = self.context_network(
                jnp.concatenate([flow_feat, flow], axis=-1), train=train
            )
            flow = flow_delta + flow
            flows.append(flow)

        flows = [f.astype(jnp.float32) for f in flows][::-1]
        flows[0] = convex_upsample(
            flows[0], self.up_mask_head(flow_feat), scale_factor=4
        )
        for i in range(1, len(flows)):
            h, w = flows[i].shape[1:3]
            flows[i] = resize_bilinear_align_corners(flows[i] * 4.0, h * 4, w * 4)
        return flows


class PWC(nn.Module):
    """Model wrapper (models/pwc.py:1-43)."""

    cfgs: Any
    train_mode: bool = False

    @nn.compact
    def __call__(self, inputs: dict) -> dict:
        train = self.train_mode
        images = inputs["images"].astype(jnp.float32) / 255.0
        origin_h, origin_w = images.shape[1:3]
        images, _ = resize_to_multiple(images, None, x=64)
        image1, image2 = images[..., :3], images[..., 3:]

        core = PWCCore(
            max_displacement=self.cfgs["max_displacement"],
            lite_estimator=bool(self.cfgs["lite_estimator"]),
            norm_feature_pyramid=self.cfgs["norm"]["feature_pyramid"],
            norm_flow_estimator=self.cfgs["norm"]["flow_estimator"],
            norm_context_network=self.cfgs["norm"]["context_network"],
            name="core",
        )
        feats1 = core.encode(image1, train=train)
        feats2 = core.encode(image2, train=train)
        flows = core.decode(feats1, feats2, train=train)
        final_flow = resize_flow2d(flows[0], origin_h, origin_w)
        return {"flow_2d": final_flow, "flows_2d": flows}


def loss_fn(outputs: dict, inputs: dict, cfgs: Any):
    target_2d = inputs["flow_2d"]
    loss = calc_pyramid_loss_2d(
        outputs["flows_2d"],
        target_2d,
        level_weights=list(cfgs.loss.level_weights),
        order=cfgs.loss.order,
    )
    metrics = merge_metrics(
        {"loss2d": scalar_metric(loss)},
        compute_2d_metrics(outputs["flow_2d"], target_2d),
    )
    return loss, metrics


def is_better(curr: dict, best: dict | None) -> bool:
    if best is None:
        return True
    return curr["epe2d"] < best["epe2d"]
