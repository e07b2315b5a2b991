"""Parity of the fused 2D update-chain Pallas kernels vs the Flax modules.

Interpret-mode on CPU (same harness as the other Pallas kernel tests); the
kernels compute in bf16 so tolerances are the documented fast-path envelope
(~2^-8 relative on activations through a 14-conv chain).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camliflow_tpu.models.raft import GRU2D, FlowHead2D, MotionEncoder2D
from camliflow_tpu.ops.pallas_update2d import (
    gru_flowhead_2d_pallas,
    motion_encoder_2d_pallas,
    prepare_gru_flowhead_params,
    prepare_motion_encoder_params,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize("hw", [(12, 20), (7, 9)])
def test_gru_flowhead_matches_flax(rng, hw):
    h_dim, w_dim = hw
    batch, ch, cx1, cx2 = 2, 32, 32, 32
    gru = GRU2D(hidden_dim=ch)
    head = FlowHead2D(hidden_dim=64)

    h = jnp.asarray(rng.randn(batch, h_dim, w_dim, ch).astype(np.float32))
    x2d = jnp.asarray(rng.randn(batch, h_dim, w_dim, cx1).astype(np.float32))
    motion = jnp.asarray(rng.randn(batch, h_dim, w_dim, cx2).astype(np.float32))
    x = jnp.concatenate([x2d, motion], axis=-1)

    gru_vars = gru.init(jax.random.PRNGKey(0), h, x)
    head_vars = head.init(jax.random.PRNGKey(1), h)

    h_ref = gru.apply(gru_vars, h, x)
    delta_ref = head.apply(head_vars, h_ref)

    params = prepare_gru_flowhead_params(
        gru_vars["params"], head_vars["params"]
    )
    h_got, delta_got = gru_flowhead_2d_pallas(
        h, x2d, motion, params, h_dim, w_dim, interpret=True
    )

    assert h_got.shape == h_ref.shape
    assert delta_got.shape == delta_ref.shape
    np.testing.assert_allclose(
        np.asarray(h_got), np.asarray(h_ref), rtol=0, atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(delta_got), np.asarray(delta_ref), rtol=0, atol=6e-2
    )


def test_motion_encoder_matches_flax(rng):
    batch, h_dim, w_dim = 1, 10, 14
    ccorr = 36
    enc = MotionEncoder2D()
    flow = jnp.asarray(rng.randn(batch, h_dim, w_dim, 2).astype(np.float32))
    corr = jnp.asarray(rng.randn(batch, h_dim, w_dim, ccorr).astype(np.float32))
    enc_vars = enc.init(jax.random.PRNGKey(0), flow, corr)

    ref = enc.apply(enc_vars, flow, corr)
    params = prepare_motion_encoder_params(enc_vars["params"])
    got = motion_encoder_2d_pallas(flow, corr, params, h_dim, w_dim, interpret=True)

    assert got.shape == ref.shape
    # the trailing 2 channels are the flow passthrough — exact
    np.testing.assert_array_equal(np.asarray(got[..., -2:]), np.asarray(flow))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=6e-2
    )


def _raft_cfgs(fast):
    from camliflow_tpu.utils.config import Config

    return Config(
        {
            "name": "raft",
            "backbone": {"depth": 18},
            "n_iters_train": 2,
            "n_iters_eval": 2,
            "fast_inference": fast,
            "loss": {"gamma": 0.8, "order": "l2-norm"},
        }
    )


def test_raft_model_fast_pallas_matches_exact(rng):
    """RAFT eval with the fused 2D update kernels vs the exact path.

    fast_inference='on' engages int8 lookup + the Pallas update chain; the
    compound error over 2 iterations + convex upsample must stay inside the
    documented fast-path envelope.
    """
    import jax

    from camliflow_tpu.models import raft as raft_mod
    from tests.test_models_forward import make_inputs

    inputs = make_inputs(rng)
    model_exact = raft_mod.RAFT(cfgs=_raft_cfgs("off").to_dict(), train_mode=False)
    variables = model_exact.init(jax.random.PRNGKey(0), inputs)
    out_exact = model_exact.apply(variables, inputs)

    model_fast = raft_mod.RAFT(cfgs=_raft_cfgs("on").to_dict(), train_mode=False)
    out_fast = model_fast.apply(variables, inputs)

    d = np.max(np.abs(np.asarray(out_fast["flow_2d"] - out_exact["flow_2d"])))
    scale = np.max(np.abs(np.asarray(out_exact["flow_2d"])))
    assert d <= max(0.15, 0.02 * scale), (d, scale)


def test_camliraft_model_fast_pallas_matches_exact(rng):
    """CamLiRAFT eval fast path (fused 2D kernels + corr3d kernel + int8
    lookup) vs the exact path on tiny shapes."""
    import jax

    from camliflow_tpu.models import camliraft as camliraft_mod
    from camliflow_tpu.utils.config import Config
    from tests.test_models_forward import SAMPLES, make_inputs

    def cfgs(fast):
        return Config(
            {
                "name": "camliraft",
                "freeze_bn": False,
                "backbone": {"depth": 18},
                "n_iters_train": 2,
                "n_iters_eval": 2,
                "fuse_fnet": False,
                "fuse_cnet": False,
                "fuse_corr": True,
                "fuse_motion": True,
                "fuse_hidden": False,
                "fast_inference": fast,
                "loss2d": {"gamma": 0.8, "order": "l2-norm"},
                "loss3d": {"gamma": 0.8, "order": "l2-norm"},
                "n_samples_list": SAMPLES,
            }
        )

    inputs = make_inputs(rng)
    model_exact = camliraft_mod.CamLiRAFT(
        cfgs=cfgs("off").to_dict(), train_mode=False
    )
    variables = model_exact.init(jax.random.PRNGKey(0), inputs)
    out_exact = model_exact.apply(variables, inputs)

    model_fast = camliraft_mod.CamLiRAFT(
        cfgs=cfgs("on").to_dict(), train_mode=False
    )
    out_fast = model_fast.apply(variables, inputs)

    d2 = np.max(np.abs(np.asarray(out_fast["flow_2d"] - out_exact["flow_2d"])))
    s2 = np.max(np.abs(np.asarray(out_exact["flow_2d"])))
    d3 = np.max(np.abs(np.asarray(out_fast["flow_3d"] - out_exact["flow_3d"])))
    s3 = np.max(np.abs(np.asarray(out_exact["flow_3d"])))
    assert d2 <= max(0.15, 0.02 * s2), (d2, s2)
    assert d3 <= max(0.02, 0.02 * s3), (d3, s3)
