"""End-to-end tests for CamLiRAFT-L (LiDAR-only iterative scene flow)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from camliflow_tpu.models import camliraft_l as m
from camliflow_tpu.utils.config import Config


def small_cfgs(ids=False):
    return Config(
        {
            "n_iters_train": 2,
            "n_iters_eval": 3,
            "ids": {"enabled": ids},
            "loss": {"gamma": 0.8, "order": "l2-norm"},
            "n_samples_list": [256, 128, 64, 32, 16],
        }
    )


def make_inputs(rng, batch=2, n=512, ids=False):
    pc1 = rng.randn(batch, n, 3).astype(np.float32)
    if ids:
        pc1[..., 2] = np.abs(pc1[..., 2]) * 10 + 5
    pc2 = pc1 + 0.05 * rng.randn(batch, n, 3).astype(np.float32)
    return {
        "pcs": jnp.asarray(np.concatenate([pc1, pc2], -1)),
        "intrinsics": jnp.asarray(
            np.tile([1050.0, 479.5, 269.5], (batch, 1)).astype(np.float32)
        ),
        "flow_3d": jnp.asarray(pc2 - pc1),
    }


@pytest.fixture(scope="module")
def eval_setup():
    rng = np.random.RandomState(0)
    cfgs = small_cfgs(ids=False)
    inputs = make_inputs(rng)
    model = m.CamLiRAFTL(cfgs=cfgs, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), inputs)
    return cfgs, inputs, model, variables


def test_forward_shapes(eval_setup):
    cfgs, inputs, model, variables = eval_setup
    out = model.apply(variables, inputs)
    assert out["flow_3d"].shape == (2, 512, 3)
    # eval mode upsamples only the final iteration (length-1 sequence)
    assert out["flow_3d_seq"].shape == (1, 2, 512, 3)
    assert np.isfinite(np.asarray(out["flow_3d"])).all()


def test_loss_and_metrics(eval_setup):
    cfgs, inputs, model, variables = eval_setup
    out = model.apply(variables, inputs)
    loss, metrics = m.loss_fn(out, inputs, cfgs)
    assert np.isfinite(float(loss))
    assert set(metrics) == {"loss3d", "epe3d", "acc3d_5cm"}
    # counts: epe3d counted per point
    assert float(metrics["epe3d"][1]) == 2 * 512


def test_ids_roundtrip_forward():
    rng = np.random.RandomState(1)
    cfgs = small_cfgs(ids=True)
    inputs = make_inputs(rng, ids=True)
    model = m.CamLiRAFTL(cfgs=cfgs, train_mode=False)
    variables = model.init(jax.random.PRNGKey(1), inputs)
    out = model.apply(variables, inputs)
    assert np.isfinite(np.asarray(out["flow_3d"])).all()


def test_domain_alignment_identity_stats(eval_setup):
    """With src == dst statistics, domain alignment must be a no-op."""
    cfgs, inputs, model, variables = eval_setup
    base = model.apply(variables, inputs)
    stats = {
        "src_mean": jnp.zeros((2, 3)),
        "dst_mean": jnp.zeros((2, 3)),
        "src_std": jnp.ones((2, 3)),
        "dst_std": jnp.ones((2, 3)),
    }
    out = model.apply(variables, {**inputs, **stats})
    np.testing.assert_allclose(
        np.asarray(out["flow_3d"]), np.asarray(base["flow_3d"]), rtol=1e-4, atol=1e-5
    )


def test_fast_path_matches_exact(eval_setup):
    """fast_inference='on' (Pallas selection + int8 pyramid with per-row
    scales) vs the exact path, full model on tiny shapes."""
    cfgs, inputs, model, variables = eval_setup
    out_exact = model.apply(variables, inputs)
    fast_cfgs = Config({**cfgs.to_dict(), "fast_inference": "on"})
    model_fast = m.CamLiRAFTL(cfgs=fast_cfgs, train_mode=False)
    out_fast = model_fast.apply(variables, inputs)
    d = np.max(np.abs(np.asarray(out_fast["flow_3d"] - out_exact["flow_3d"])))
    s = np.max(np.abs(np.asarray(out_exact["flow_3d"])))
    assert d <= max(0.02, 0.02 * s), (d, s)


def test_is_better():
    assert m.is_better({"epe3d": 1.0}, None)
    assert m.is_better({"epe3d": 1.0}, {"epe3d": 2.0})
    assert not m.is_better({"epe3d": 2.0}, {"epe3d": 1.0})


@pytest.mark.slow
def test_fast_path_all_gated_kernels(eval_setup, monkeypatch):
    """All gated Pallas kernels engaged at once on CamLiRAFT-L (corr3d tail +
    fused 3D update chain + Pallas gathers — the combination the on-hardware
    numerics gate runs) vs the plain fast path. The selection output feeds
    both, so deltas are pure kernel numerics."""
    cfgs, inputs, model, variables = eval_setup
    fast_cfgs = Config({**cfgs.to_dict(), "fast_inference": "on"})
    model_fast = m.CamLiRAFTL(cfgs=fast_cfgs, train_mode=False)
    base = model_fast.apply(variables, inputs)
    monkeypatch.setenv("CAMLIFLOW_CORR3D_TAIL", "1")
    monkeypatch.setenv("CAMLIFLOW_UPDATE3D", "1")
    monkeypatch.setenv("CAMLIFLOW_PGATHER", "1")
    fused = m.CamLiRAFTL(cfgs=fast_cfgs, train_mode=False).apply(
        variables, inputs
    )
    d = np.max(np.abs(np.asarray(fused["flow_3d"] - base["flow_3d"])))
    s = np.max(np.abs(np.asarray(base["flow_3d"])))
    assert d <= max(5e-3, 0.02 * s), (d, s)
