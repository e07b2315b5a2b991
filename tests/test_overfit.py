"""Overfit smoke test: the ASSEMBLED training step optimizes.

Module-level grad-parity tests prove individual gradients match the
reference; nothing else asserts that the composed trainer pieces (model,
sequence loss, 4-group AdamW, grad clip, schedule) actually reduce error.
This is the cheapest insurance against a silent sign/plumbing bug: a tiny
fixed batch must be overfittable — sequence loss drops by >50% in ~30 steps
(mirrors the reference's validation-as-test role, train.py:189-208).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camliflow_tpu.models.factory import model_factory, optimizer_factory
from camliflow_tpu.runtime.train_state import TrainState, make_train_step
from camliflow_tpu.utils.config import Config


def _tiny_batch(rng, batch=2, n=256):
    pc1 = rng.randn(batch, n, 3).astype(np.float32)
    pc1[..., 2] = np.abs(pc1[..., 2]) * 2.0 + 4.0
    # the target must be LEARNABLE: a smoothing PointConv model cannot fit
    # per-point random flow (loss plateaus at the target's own magnitude —
    # measured ratio 0.95 after 30 steps vs 0.17 for a rigid translation)
    flow = np.broadcast_to(
        np.float32([0.06, -0.04, 0.05]), (batch, n, 3)
    ).copy()
    pc2 = pc1 + flow
    return {
        "pcs": jnp.asarray(np.concatenate([pc1, pc2], axis=-1)),
        "flow_3d": jnp.asarray(flow),
        "intrinsics": jnp.asarray(
            np.tile([1050.0, 479.5, 269.5], (batch, 1)).astype(np.float32)
        ),
    }


def test_overfit_tiny_batch_camliraft_l():
    model_cfgs = Config(
        {
            "name": "camliraft_l",
            "batch_size": 2,
            "n_iters_train": 2,
            "n_iters_eval": 2,
            "ids": {"enabled": False},
            "loss": {"gamma": 0.8, "order": "l2-norm"},
            "n_samples_list": [128, 64, 32, 16],
        }
    )
    train_cfgs = Config(
        {
            "opt": "adamw",
            "weight_decay": 0.0,
            "grad_max_norm": 1,
            "epochs": 1,
            "lr": 2e-3,
            "warmup_epochs": 0,
            "min_lr": 2e-3,
        }
    )
    spec = model_factory(model_cfgs)
    model = spec.module_cls(cfgs=model_cfgs.to_dict(), train_mode=True)
    batch = _tiny_batch(np.random.RandomState(0))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    tx = optimizer_factory(train_cfgs, params, steps_per_epoch=1000)
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats"),
        opt_state=tx.init(params),
        step=jnp.int32(0),
    )
    # donate=False: the first-step loss is compared against the last, and
    # the fixed batch is reused every call.
    train_step = make_train_step(model, spec.loss_fn, tx, model_cfgs, donate=False)

    losses = []
    for _ in range(30):
        state, loss, _, telemetry = train_step(state, batch)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses)), losses
    # the model must receive gradient signal
    assert (
        float(telemetry["grad_norm_2d"]) + float(telemetry["grad_norm_3d"])
        > 0.0
    )
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert last < 0.5 * first, (first, last, losses)


@pytest.mark.slow
def test_overfit_tiny_batch_raft():
    """Same assertion through the 2D branch (RAFT sequence loss + convex
    upsampler + the 2-group 2D optimizer partition)."""
    from camliflow_tpu.utils.config import load_yaml

    model_cfgs = Config(load_yaml("conf/model/raft.yaml")["model"])
    model_cfgs["n_iters_train"] = 2
    model_cfgs["n_iters_eval"] = 2
    model_cfgs["batch_size"] = 1
    train_cfgs = Config(
        {
            "opt": "adamw",
            "weight_decay": 0.0,
            "grad_max_norm": 1,
            "epochs": 1,
            "lr": 1e-3,
            "warmup_epochs": 0,
            "min_lr": 1e-3,
        }
    )
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(
            rng.randint(0, 255, size=(1, 64, 96, 6)).astype(np.float32)
        ),
        # constant-translation target: learnable by construction (per-pixel
        # random flow is not expressible from a 1/8-res latent — see
        # _tiny_batch)
        "flow_2d": jnp.asarray(
            np.concatenate(
                [
                    np.broadcast_to(
                        np.float32([3.5, -2.0]), (1, 64, 96, 2)
                    ).copy(),
                    np.ones((1, 64, 96, 1), np.float32),
                ],
                axis=-1,
            )
        ),
        "intrinsics": jnp.asarray(
            np.tile([1050.0, 47.5, 31.5], (1, 1)).astype(np.float32)
        ),
    }
    spec = model_factory(model_cfgs)
    model = spec.module_cls(cfgs=model_cfgs.to_dict(), train_mode=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    tx = optimizer_factory(train_cfgs, params, steps_per_epoch=1000)
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats"),
        opt_state=tx.init(params),
        step=jnp.int32(0),
    )
    train_step = make_train_step(model, spec.loss_fn, tx, model_cfgs, donate=False)
    losses = []
    for _ in range(30):
        state, loss, _, _ = train_step(state, batch)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses)), losses
    assert np.mean(losses[-3:]) < 0.5 * np.mean(losses[:3]), losses
