"""Basic conv/norm/act building blocks (flax.linen, channel-last).

Mirrors the reference's mlp.py:41-162 (Conv1dNormRelu / Conv2dNormRelu /
MLP1d / MLP2d / LayerNormCF*). In channel-last layout every 1x1 conv is a
Dense over the trailing axis, which is exactly an MXU matmul — so MLP1d and
MLP2d collapse into the same Dense stack here.

Norm semantics (torch parity):
- batch_norm:    stats over all non-channel axes, momentum 0.1 (torch) ==
                 linen momentum 0.9, eps 1e-5, affine. With a data-sharded
                 batch under jit, the batch mean is global -> SyncBN for free.
- instance_norm: per-sample stats over spatial axes only, eps 1e-5,
                 affine optional (torch default affine=False).
- layer_norm:    channel axis, eps 1e-6, affine (LayerNormCF parity).
Conv bias is present iff norm is None (mlp.py:52).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Mixed-precision policy (the reference's AMP autocast, train.py:147):
# a trace-time context selects the computation dtype of Dense/Conv layers;
# parameters stay f32 and the models' explicit .astype(jnp.float32) casts mark
# the fp32 islands (cost volumes, GRU/flow-head boundaries) exactly where the
# reference disables autocast. bf16 keeps f32's exponent range, so no loss
# scaling is needed.
import contextlib

_COMPUTE_DTYPE: list = [None]  # None -> full f32


def compute_dtype():
    return _COMPUTE_DTYPE[-1]


@contextlib.contextmanager
def compute_precision(dtype):
    """Set the computation dtype ('bfloat16' or None) while tracing a model."""
    if isinstance(dtype, str):
        dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(dtype, None)
    _COMPUTE_DTYPE.append(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.pop()


# torch nn.Linear/nn.Conv default init: kaiming_uniform(a=sqrt(5)), i.e.
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Matching it keeps early-training
# activation magnitudes in range through the deep un-normalised estimator
# stacks (flax's default lecun_normal is ~1.7x larger std and overflows f32
# through the 6-level point-conv pyramids at init).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def dense(features: int, use_bias: bool = True, name: str | None = None) -> nn.Dense:
    """nn.Dense with torch-parity default init and the active compute dtype."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        dtype=compute_dtype(),
        name=name,
    )


def conv2d(
    features: int,
    kernel_size: tuple[int, int],
    strides: int = 1,
    padding="SAME",
    dilation: int = 1,
    use_bias: bool = True,
    name: str | None = None,
) -> nn.Conv:
    """nn.Conv with torch-parity default init."""
    return nn.Conv(
        features,
        kernel_size,
        strides=strides,
        padding=padding,
        kernel_dilation=dilation,
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        dtype=compute_dtype(),
        name=name,
    )


def apply_act(x: jax.Array, act: str | None) -> jax.Array:
    if act is None:
        return x
    if act == "relu":
        return nn.relu(x)
    if act == "leaky_relu":
        return nn.leaky_relu(x, negative_slope=0.1)
    if act == "sigmoid":
        return nn.sigmoid(x)
    if act == "tanh":
        return nn.tanh(x)
    raise NotImplementedError(f"Unknown activation function: {act}")


class InstanceNorm(nn.Module):
    """Per-sample normalisation over spatial axes (torch InstanceNorm parity)."""

    affine: bool = False
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            features = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (features,))
            bias = self.param("bias", nn.initializers.zeros, (features,))
            y = y * scale + bias
        return y


class Norm(nn.Module):
    """Dispatch on the reference's norm-name strings."""

    norm: str | None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.norm is None:
            return x
        if self.norm == "batch_norm":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        if self.norm == "instance_norm":
            return InstanceNorm(affine=False)(x)
        if self.norm == "instance_norm_affine":
            return InstanceNorm(affine=True)(x)
        if self.norm == "layer_norm":
            return nn.LayerNorm(epsilon=1e-6)(x)
        raise NotImplementedError(f"Unknown normalization function: {self.norm}")


class DenseNormAct(nn.Module):
    """1x1 conv + norm + act on channel-last data of any rank.

    Equivalent to the reference's Conv1dNormRelu / Conv2dNormRelu with
    kernel_size=1 (mlp.py:41-128).
    """

    out_channels: int
    norm: str | None = None
    act: str | None = "leaky_relu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = dense(self.out_channels, use_bias=self.norm is None)(x)
        x = Norm(self.norm)(x, train=train)
        return apply_act(x, self.act)


class Conv2dNormAct(nn.Module):
    """KxK conv + norm + act on NHWC (Conv2dNormRelu parity, mlp.py:86-128)."""

    out_channels: int
    kernel_size: int | tuple[int, int] = 1
    strides: int = 1
    dilation: int = 1
    norm: str | None = None
    act: str | None = "leaky_relu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        # Explicit torch-style symmetric padding (p = dilation * (k-1)/2).
        # SAME would pad right-heavy under stride 2 on even inputs, shifting
        # every downsampling conv's sampling grid vs the reference.
        pad = tuple(
            (self.dilation * (k - 1) // 2, self.dilation * (k - 1) // 2) for k in ks
        )
        x = nn.Conv(
            self.out_channels,
            kernel_size=ks,
            strides=self.strides,
            kernel_dilation=self.dilation,
            padding=pad,
            use_bias=self.norm is None,
            kernel_init=torch_kernel_init,
            dtype=compute_dtype(),
        )(x)
        x = Norm(self.norm)(x, train=train)
        return apply_act(x, self.act)


class MLP(nn.Module):
    """Stack of DenseNormAct (MLP1d / MLP2d parity, mlp.py:131-162)."""

    mlp_channels: Sequence[int]
    norm: str | None = None
    act: str | None = "leaky_relu"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for out_channels in self.mlp_channels:
            x = DenseNormAct(out_channels, norm=self.norm, act=self.act)(
                x, train=train
            )
        return x
