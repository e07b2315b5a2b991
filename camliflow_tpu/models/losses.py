"""Flow losses as pure functions over stacked predictions.

Reference semantics: models/losses.py:5-119. The reference loops over python
lists of per-level / per-iteration predictions; here sequence losses take a
stacked [T, ...] array (the natural output of `lax.scan`) and vectorise the
RAFT exponential weighting, while pyramid losses keep the per-level list (the
levels have different shapes).

Layout: 2D flow [B, H, W, 2(+1 validity)], 3D flow [B, N, 3(+1 validity)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import gather_points
from ..ops.image import resize_flow2d


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over elements where mask is true ([mask].mean() parity)."""
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _flow_error(diff: jax.Array, order: str) -> jax.Array:
    """Per-element error over the channel (last) axis."""
    if order == "l2-norm":
        return jnp.linalg.norm(diff, axis=-1)
    if order == "l1":
        return jnp.sum(jnp.abs(diff), axis=-1)
    if order == "robust":
        return jnp.power(jnp.sum(jnp.abs(diff), axis=-1) + 0.01, 0.4)
    raise ValueError(f"unknown loss order: {order}")


def _split_target(target: jax.Array, flow_dim: int):
    if target.shape[-1] == flow_dim + 1:
        return target[..., :flow_dim], target[..., flow_dim] > 0
    return target, jnp.ones(target.shape[:-1], dtype=bool)


def calc_sequence_loss(
    flow_preds: jax.Array, target: jax.Array, gamma: float, order: str
) -> jax.Array:
    """RAFT sequence loss with exponential weighting (losses.py:64-119).

    Args:
      flow_preds: [T, B, ..., C] stacked per-iteration predictions.
      target: [B, ..., C(+1)] ground truth (+ optional validity channel).
    """
    n_preds = flow_preds.shape[0]
    flow_dim = flow_preds.shape[-1]
    target_flow, mask = _split_target(target.astype(jnp.float32), flow_dim)
    per_iter = _flow_error(flow_preds.astype(jnp.float32) - target_flow[None], order)
    per_iter = jax.vmap(_masked_mean, in_axes=(0, None))(per_iter, mask)  # [T]
    weights = gamma ** jnp.arange(n_preds - 1, -1, -1, dtype=jnp.float32)
    return jnp.sum(weights * per_iter)


def calc_pyramid_loss_2d(
    flows: list[jax.Array], target: jax.Array, level_weights: list[float], order: str
) -> jax.Array:
    """PWC pyramid loss (losses.py:5-32). flows[i]: [B, h_i, w_i, 2]."""
    target = target.astype(jnp.float32)
    target_flow, mask = _split_target(target, 2)
    h, w = target.shape[1:3]
    total = jnp.float32(0)
    for pred, weight in zip(flows, level_weights):
        diff = jnp.abs(resize_flow2d(pred.astype(jnp.float32), h, w) - target_flow)
        if order == "robust":
            err = jnp.power(jnp.sum(diff, axis=-1) + 0.01, 0.4)
        elif order == "l2-norm":
            err = jnp.linalg.norm(diff, axis=-1)
        else:
            raise NotImplementedError(order)
        total = total + weight * _masked_mean(err, mask)
    return total


def calc_pyramid_loss_3d(
    flows: list[jax.Array],
    target: jax.Array,
    level_weights: list[float],
    order: str,
    indices: list[jax.Array],
) -> jax.Array:
    """PointPWC pyramid loss with per-level FPS-index supervision
    (losses.py:35-61). flows[i]: [B, n_i, 3]; indices[i]: [B, n_i]."""
    target = target.astype(jnp.float32)
    total = jnp.float32(0)
    for idx, (flow, weight) in enumerate(zip(flows, level_weights)):
        level_target = gather_points(target, indices[idx])
        target_flow, mask = _split_target(level_target, 3)
        diff = flow.astype(jnp.float32) - target_flow
        if order == "robust":
            err = jnp.power(jnp.sum(jnp.abs(diff), axis=-1) + 0.01, 0.4)
        elif order == "l2-norm":
            err = jnp.linalg.norm(diff, axis=-1)
        else:
            raise NotImplementedError(order)
        total = total + weight * _masked_mean(err, mask)
    return total
