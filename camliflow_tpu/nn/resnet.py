"""ResNet bottleneck encoder, cut at stage 2 with stride-8 output (NHWC).

Matches the reference's mmdet ResNet configuration (models/raft_core.py:10-38):
depth-50, num_stages=2, strides=(1, 2), out_indices=(1,), norm_eval=True,
followed by a 1x1 align conv to 128 channels. Weight layout is
torchvision/mmdet-compatible so ImageNet checkpoints port directly
(see tools/port_checkpoint.py).

norm_eval=True means backbone BatchNorms always use running statistics (they
are frozen even during training); we replicate by never passing train=True to
the backbone norms.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv2dNormAct, compute_dtype, torch_kernel_init

# (planes per stage, blocks per stage) for the torchvision depths
_STAGE_SPECS = {
    18: ((64, 128), (2, 2), "basic"),
    34: ((64, 128), (3, 4), "basic"),
    50: ((64, 128), (3, 4), "bottleneck"),
    101: ((64, 128), (3, 4), "bottleneck"),
}


class BottleneckBlock(nn.Module):
    planes: int
    strides: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=torch_kernel_init, dtype=compute_dtype(), name="conv1")(x)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(out)
        out = nn.relu(out)
        # stride on the 3x3 (torch/mmdet 'pytorch' style), explicit pad 1
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=self.strides,
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=compute_dtype(),
            name="conv2",
        )(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, kernel_init=torch_kernel_init, dtype=compute_dtype(), name="conv3")(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn3")(out)
        if self.has_downsample:
            identity = nn.Conv(
                self.planes * 4,
                (1, 1),
                strides=self.strides,
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, name="downsample_bn"
            )(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    strides: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=self.strides,
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=compute_dtype(),
            name="conv1",
        )(x)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, kernel_init=torch_kernel_init, dtype=compute_dtype(), name="conv2"
        )(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn2")(out)
        if self.has_downsample:
            identity = nn.Conv(
                self.planes,
                (1, 1),
                strides=self.strides,
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, name="downsample_bn"
            )(identity)
        return nn.relu(out + identity)


class ResNetEncoder2D(nn.Module):
    """Stem + 2 stages (stride 8 output) + 1x1 align conv to `out_channels`."""

    depth: int = 50
    out_channels: int = 128

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        planes_list, blocks_list, block_type = _STAGE_SPECS[self.depth]
        block_cls = BottleneckBlock if block_type == "bottleneck" else BasicBlock
        expansion = 4 if block_type == "bottleneck" else 1

        # stem: 7x7/2 pad 3 + BN + relu + maxpool 3x3/2 pad 1
        x = nn.Conv(
            64, (7, 7), strides=2, padding=((3, 3), (3, 3)), use_bias=False, kernel_init=torch_kernel_init, dtype=compute_dtype(), name="conv1"
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 3, 3, 1),
            window_strides=(1, 2, 2, 1),
            padding="VALID",
        )

        in_channels = 64
        for stage, (planes, n_blocks) in enumerate(zip(planes_list, blocks_list)):
            stride = 1 if stage == 0 else 2
            for block in range(n_blocks):
                s = stride if block == 0 else 1
                needs_ds = block == 0 and (s != 1 or in_channels != planes * expansion)
                x = block_cls(
                    planes,
                    strides=s,
                    has_downsample=needs_ds,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
                in_channels = planes * expansion

        # align conv: Conv2dNormRelu(feat_dim, 128) — leaky_relu, bias, no norm
        return Conv2dNormAct(self.out_channels, kernel_size=1, name="align")(
            x, train=train
        )
