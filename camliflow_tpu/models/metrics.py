"""Flow metrics as (sum, count) accumulator dicts.

Reference semantics: models/base.py:50-94. Each metric returns a (sum, count)
pair so the runtime can accumulate across steps and `psum` across devices —
the TPU-native replacement for the reference's dist_reduce_sum all-reduces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MetricDict = dict[str, tuple[jax.Array, jax.Array]]


def _masked_sum_count(values: jax.Array, mask: jax.Array):
    mask = mask.astype(jnp.float32)
    return jnp.sum(values.astype(jnp.float32) * mask), jnp.sum(mask)


def scalar_metric(value: jax.Array) -> tuple[jax.Array, jax.Array]:
    return jnp.asarray(value, jnp.float32), jnp.asarray(1.0, jnp.float32)


def compute_2d_metrics(pred: jax.Array, target: jax.Array) -> MetricDict:
    """EPE2D, 1px accuracy, KITTI outlier rate (base.py:54-74).

    pred: [B, H, W, 2]; target: [B, H, W, 2 or 3] (channel 2 = validity).
    """
    target = target.astype(jnp.float32)
    if target.shape[-1] == 3:
        mask = target[..., 2] > 0
        target = target[..., :2]
    else:
        mask = jnp.ones(target.shape[:-1], dtype=bool)

    epe = jnp.linalg.norm(pred.astype(jnp.float32) - target, axis=-1)
    mag = jnp.linalg.norm(target, axis=-1) + 1e-5
    outlier = jnp.logical_and(epe > 3.0, epe / mag > 0.05)
    return {
        "epe2d": _masked_sum_count(epe, mask),
        "acc2d_1px": _masked_sum_count((epe < 1.0), mask),
        "outlier2d": _masked_sum_count(outlier, mask),
    }


def compute_3d_metrics(
    pred: jax.Array, target: jax.Array, occ_mask: jax.Array | None = None
) -> MetricDict:
    """EPE3D and 5cm accuracy, with optional non-occluded split (base.py:76-94).

    pred: [B, N, 3]; target: [B, N, 3 or 4]; occ_mask: [B, N] (1 = occluded).
    """
    target = target.astype(jnp.float32)
    if target.shape[-1] == 4:
        mask = target[..., 3] > 0
        target = target[..., :3]
    else:
        mask = jnp.ones(target.shape[:-1], dtype=bool)

    epe = jnp.linalg.norm(pred.astype(jnp.float32) - target, axis=-1)
    acc = epe < 0.05
    if occ_mask is not None:
        mask = jnp.logical_and(occ_mask == 0, mask)
        return {
            "epe3d_noc": _masked_sum_count(epe, mask),
            "acc3d_5cm_noc": _masked_sum_count(acc, mask),
        }
    return {
        "epe3d": _masked_sum_count(epe, mask),
        "acc3d_5cm": _masked_sum_count(acc, mask),
    }


def merge_metrics(*dicts: MetricDict) -> MetricDict:
    out: MetricDict = {}
    for d in dicts:
        for key, (s, c) in d.items():
            if key in out:
                out[key] = (out[key][0] + s, out[key][1] + c)
            else:
                out[key] = (s, c)
    return out


def finalize_metrics(metrics: MetricDict) -> dict[str, float]:
    return {k: float(s) / max(float(c), 1e-12) for k, (s, c) in metrics.items()}
