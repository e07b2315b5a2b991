"""Golden tests for losses against torch re-implementations of the reference
semantics (models/losses.py:5-119)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from camliflow_tpu.models import losses  # noqa: E402


def torch_sequence_loss(preds, target, gamma, order, flow_dim):
    """Reference calc_sequence_loss_{2d,3d} (losses.py:64-119), channel-first."""
    n_preds = len(preds)
    total = 0.0
    if target.shape[1] == flow_dim + 1:
        mask = target[:, flow_dim] > 0
        target = target[:, :flow_dim]
    else:
        mask = torch.ones_like(target)[:, 0] > 0
    for i in range(n_preds):
        diff = preds[i] - target
        if order == "l2-norm":
            loss = torch.linalg.norm(diff, dim=1)[mask].mean()
        elif order == "l1":
            loss = torch.sum(diff.abs(), dim=1)[mask].mean()
        elif order == "robust":
            loss = torch.pow(diff.abs().sum(dim=1) + 0.01, 0.4)[mask].mean()
        total = total + gamma ** (n_preds - i - 1) * loss
    return total


@pytest.mark.parametrize("order", ["l2-norm", "l1", "robust"])
@pytest.mark.parametrize("with_mask", [False, True])
def test_sequence_loss_3d(rng, order, with_mask):
    T, B, N = 4, 2, 64
    preds = rng.randn(T, B, N, 3).astype(np.float32)
    if with_mask:
        target = rng.randn(B, N, 4).astype(np.float32)
        target[..., 3] = (rng.rand(B, N) > 0.3).astype(np.float32)
    else:
        target = rng.randn(B, N, 3).astype(np.float32)

    got = float(
        losses.calc_sequence_loss(jnp.asarray(preds), jnp.asarray(target), 0.8, order)
    )
    tpreds = [torch.from_numpy(preds[t].transpose(0, 2, 1)) for t in range(T)]
    ttarget = torch.from_numpy(target.transpose(0, 2, 1))
    want = float(torch_sequence_loss(tpreds, ttarget, 0.8, order, 3))
    assert abs(got - want) / max(abs(want), 1e-6) < 1e-4


@pytest.mark.parametrize("order", ["l2-norm", "robust"])
def test_sequence_loss_2d(rng, order):
    T, B, H, W = 3, 2, 8, 10
    preds = rng.randn(T, B, H, W, 2).astype(np.float32)
    target = rng.randn(B, H, W, 3).astype(np.float32)
    target[..., 2] = (rng.rand(B, H, W) > 0.4).astype(np.float32)
    got = float(
        losses.calc_sequence_loss(jnp.asarray(preds), jnp.asarray(target), 0.8, order)
    )
    tpreds = [torch.from_numpy(preds[t].transpose(0, 3, 1, 2)) for t in range(T)]
    ttarget = torch.from_numpy(target.transpose(0, 3, 1, 2))
    want = float(torch_sequence_loss(tpreds, ttarget, 0.8, order, 2))
    assert abs(got - want) / max(abs(want), 1e-6) < 1e-4


def test_pyramid_loss_3d_indices(rng):
    """Per-level FPS-index supervision (losses.py:35-61)."""
    B, N = 2, 128
    target = rng.randn(B, N, 4).astype(np.float32)
    target[..., 3] = 1.0
    levels = [128, 64, 32]
    indices = [jnp.asarray(rng.randint(0, N, size=(B, n))) for n in levels]
    flows = [jnp.asarray(rng.randn(B, n, 3).astype(np.float32)) for n in levels]

    got = float(
        losses.calc_pyramid_loss_3d(
            flows, jnp.asarray(target), [8, 4, 2], "l2-norm", indices
        )
    )
    want = 0.0
    for flow, idx, w in zip(flows, indices, [8, 4, 2]):
        lt = np.stack([target[b][np.asarray(idx)[b]] for b in range(B)])
        diff = np.asarray(flow) - lt[..., :3]
        want += w * np.linalg.norm(diff, axis=-1).mean()
    assert abs(got - want) / abs(want) < 1e-4


def test_pyramid_loss_2d_resize(rng):
    B, H, W = 1, 16, 16
    target = rng.randn(B, H, W, 2).astype(np.float32)
    flows = [
        jnp.asarray(rng.randn(B, H // s, W // s, 2).astype(np.float32))
        for s in (1, 2, 4)
    ]
    got = float(
        losses.calc_pyramid_loss_2d(
            flows, jnp.asarray(target), [8, 4, 2], "robust"
        )
    )
    assert np.isfinite(got) and got > 0
