"""Forward + loss smoke tests for all 6 model families on tiny shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from camliflow_tpu.models import (
    camlipwc,
    camlipwc_l,
    camliraft,
    camliraft_l,
    pwc,
    raft,
)
from camliflow_tpu.utils.config import Config


def make_inputs(rng, batch=1, h=64, w=64, n=512):
    images = rng.randint(0, 255, size=(batch, h, w, 6)).astype(np.float32)
    pc1 = rng.randn(batch, n, 3).astype(np.float32)
    pc1[..., 2] = np.abs(pc1[..., 2]) * 10 + 5
    pc2 = pc1 + 0.05 * rng.randn(batch, n, 3).astype(np.float32)
    return {
        "images": jnp.asarray(images),
        "pcs": jnp.asarray(np.concatenate([pc1, pc2], -1)),
        "intrinsics": jnp.asarray(
            np.tile([100.0, (w - 1) / 2, (h - 1) / 2], (batch, 1)).astype(np.float32)
        ),
        "flow_2d": jnp.asarray(rng.randn(batch, h, w, 2).astype(np.float32)),
        "flow_3d": jnp.asarray(pc2 - pc1),
    }


SAMPLES = [256, 128, 64, 32, 16]


def run_model(module, loss_fn, cfgs, inputs, train=False):
    model = module(cfgs=cfgs.to_dict(), train_mode=train)
    variables = model.init(jax.random.PRNGKey(0), inputs)
    if train and "batch_stats" in variables:
        out, _ = model.apply(variables, inputs, mutable=["batch_stats"])
    else:
        out = model.apply(variables, inputs)
    loss, metrics = loss_fn(out, inputs, cfgs)
    return out, float(loss), metrics


@pytest.mark.slow
def test_camlipwc_full_fusion(rng):
    cfgs = Config(
        {
            "name": "camlipwc",
            "freeze_bn": False,
            "pwc2d": {
                "norm": {"feature_pyramid": "batch_norm", "flow_estimator": None,
                         "context_network": None},
                "max_displacement": 4,
                "lite_estimator": False,
            },
            "pwc3d": {
                "norm": {"feature_pyramid": "batch_norm", "correlation": None,
                         "flow_estimator": None},
                "k": 16,
            },
            "fusion": {"fuse_pyramid": True, "fuse_correlation": True,
                       "fuse_estimator": True},
            "loss2d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2-norm"},
            "loss3d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2-norm"},
            "n_samples_list": SAMPLES,
        }
    )
    inputs = make_inputs(rng)
    out, loss, metrics = run_model(
        camlipwc.CamLiPWC, camlipwc.loss_fn, cfgs, inputs, train=True
    )
    assert out["flow_2d"].shape == (1, 64, 64, 2)
    assert out["flow_3d"].shape == (1, 512, 3)
    assert np.isfinite(loss)
    assert np.isfinite(np.asarray(out["flow_2d"])).all()
    assert "epe2d" in metrics and "epe3d" in metrics


def test_camlipwc_lite_estimator_no_fusion(rng):
    cfgs = Config(
        {
            "name": "camlipwc",
            "freeze_bn": True,
            "pwc2d": {
                "norm": {"feature_pyramid": "batch_norm", "flow_estimator": None,
                         "context_network": None},
                "max_displacement": 2,
                "lite_estimator": True,
            },
            "pwc3d": {
                "norm": {"feature_pyramid": "batch_norm", "correlation": None,
                         "flow_estimator": None},
                "k": 8,
            },
            "fusion": {"fuse_pyramid": False, "fuse_correlation": False,
                       "fuse_estimator": False},
            "loss2d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "robust"},
            "loss3d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "robust"},
            "n_samples_list": SAMPLES,
        }
    )
    inputs = make_inputs(rng)
    out, loss, _ = run_model(
        camlipwc.CamLiPWC, camlipwc.loss_fn, cfgs, inputs, train=True
    )
    assert np.isfinite(loss)


def test_pwc(rng):
    cfgs = Config(
        {
            "name": "pwc",
            "max_displacement": 4,
            "lite_estimator": False,
            "norm": {"feature_pyramid": "batch_norm", "flow_estimator": None,
                     "context_network": None},
            "loss": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2-norm"},
        }
    )
    inputs = make_inputs(rng)
    out, loss, _ = run_model(pwc.PWC, pwc.loss_fn, cfgs, inputs, train=True)
    assert out["flow_2d"].shape == (1, 64, 64, 2)
    assert np.isfinite(loss)


def test_raft(rng):
    cfgs = Config(
        {
            "name": "raft",
            "backbone": {"depth": 18},
            "n_iters_train": 2,
            "n_iters_eval": 2,
            "loss": {"gamma": 0.8, "order": "l2-norm"},
        }
    )
    inputs = make_inputs(rng)
    out, loss, _ = run_model(raft.RAFT, raft.loss_fn, cfgs, inputs)
    assert out["flow_2d"].shape == (1, 64, 64, 2)
    assert out["flow_2d_seq"].shape[0] == 1  # eval: final-only upsample
    assert np.isfinite(loss)


def test_camliraft_fuse_hidden(rng):
    """Exercise the fuse_hidden gate (off in the shipped config)."""
    cfgs = Config(
        {
            "name": "camliraft",
            "freeze_bn": False,
            "backbone": {"depth": 18},
            "n_iters_train": 1,
            "n_iters_eval": 1,
            "fuse_fnet": False,
            "fuse_cnet": False,
            "fuse_corr": False,
            "fuse_motion": False,
            "fuse_hidden": True,
            "loss2d": {"gamma": 0.8, "order": "l2-norm"},
            "loss3d": {"gamma": 0.8, "order": "l2-norm"},
            "n_samples_list": SAMPLES,
        }
    )
    inputs = make_inputs(rng)
    out, loss, _ = run_model(camliraft.CamLiRAFT, camliraft.loss_fn, cfgs, inputs)
    assert np.isfinite(loss)


def test_camlipwc_l_losses(rng):
    cfgs = Config(
        {
            "name": "camlipwc_l",
            "ids": {"enabled": True},
            "norm": {"feature_pyramid": "batch_norm", "correlation": None,
                     "flow_estimator": None},
            "loss": {"level_weights": [8, 4, 2, 1, 0.5], "order": "robust"},
            "n_samples_list": SAMPLES,
        }
    )
    inputs = make_inputs(rng)
    out, loss, _ = run_model(
        camlipwc_l.CamLiPWCL, camlipwc_l.loss_fn, cfgs, inputs, train=True
    )
    assert np.isfinite(loss)
    assert out["flow_3d"].shape == (1, 512, 3)


def test_compute_dtype_plumb_raft_camliraft_l(rng):
    """cfgs['compute_dtype']='bfloat16' reaches the RAFT and CamLiRAFT-L
    cores (raft.py / camliraft_l.py wrap the core in compute_precision,
    mirroring the flagship camliraft.py): outputs stay float32, values
    move (proving the context is live) but only at bf16-rounding scale.
    The shipped configs keep float32 — the reference evals
    autocast-disabled (models/utils.py:262)."""
    inputs = make_inputs(rng)

    raft_cfg = {
        "name": "raft",
        "backbone": {"depth": 18},
        "n_iters_train": 2,
        "n_iters_eval": 2,
        "loss": {"gamma": 0.8, "order": "l2-norm"},
    }
    l_cfg = {
        "name": "camliraft_l",
        "ids": {"enabled": True},
        "n_iters_train": 2,
        "n_iters_eval": 2,
        "loss": {"gamma": 0.8, "order": "l2-norm"},
        "n_samples_list": SAMPLES,
    }
    for module, loss_fn, cfg, key in [
        (raft.RAFT, raft.loss_fn, raft_cfg, "flow_2d"),
        (camliraft_l.CamLiRAFTL, camliraft_l.loss_fn, l_cfg, "flow_3d"),
    ]:
        out32, _, _ = run_model(module, loss_fn, Config(dict(cfg)), inputs)
        cfg_bf16 = dict(cfg)
        cfg_bf16["compute_dtype"] = "bfloat16"
        out16, loss16, _ = run_model(module, loss_fn, Config(cfg_bf16), inputs)
        assert out16[key].dtype == jnp.float32
        diff = float(jnp.max(jnp.abs(out16[key] - out32[key])))
        scale = float(jnp.mean(jnp.abs(out32[key]))) + 1e-8
        assert 0.0 < diff < max(0.05, 0.1 * scale), (key, diff, scale)
        assert np.isfinite(loss16)
