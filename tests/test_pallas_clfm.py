"""Parity of the fused CLFM Pallas kernel vs the Flax CLFM module.

Interpret-mode on CPU (same harness as the other Pallas kernel tests); the
kernel computes in bf16 so tolerances are the fast-path envelope.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camliflow_tpu.nn.clfm import CLFM, fusion_interp_cache
from camliflow_tpu.ops.gridsample import grid_sample_points
from camliflow_tpu.ops.pallas_clfm import (
    clfm_fused_pallas,
    grid_sample_cache,
    hoist_interp_score,
    prepare_clfm_params,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_grid_sample_cache_matches_grid_sample(rng):
    batch, h, w, c, n = 2, 9, 13, 8, 37
    feat = jnp.asarray(rng.randn(batch, h, w, c).astype(np.float32))
    # include out-of-bounds points (padding_mode='zeros' validity)
    uv = jnp.asarray(
        (rng.rand(batch, n, 2) * [w + 4, h + 4] - 2).astype(np.float32)
    )
    ref = grid_sample_points(feat, uv)
    idx, wgt = grid_sample_cache(uv, h, w)
    flat = feat.reshape(batch, h * w, c)
    got = sum(
        jnp.take_along_axis(flat, idx[..., t : t + 1], axis=1)
        * wgt[..., t : t + 1]
        for t in range(4)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("c2,c3", [(324, 128), (128, 128)])
@pytest.mark.slow  # dead-kernel semantics pin (PERF.md gather-probe verdict)
def test_clfm_fused_matches_flax(rng, c2, c3):
    batch, h, w, n = 2, 8, 12, 64
    clfm = CLFM(c2, c3)

    feat_2d = jnp.asarray(rng.randn(batch, h, w, c2).astype(np.float32))
    feat_3d = jnp.asarray(rng.randn(batch, n, c3).astype(np.float32))
    uv = jnp.asarray(
        (rng.rand(batch, n, 2) * [w - 1, h - 1]).astype(np.float32)
    )

    cache = fusion_interp_cache(uv, h, w)
    variables = clfm.init(
        jax.random.PRNGKey(0), uv, feat_2d, feat_3d, interp_cache=cache
    )
    out2d_ref, out3d_ref = clfm.apply(
        variables, uv, feat_2d, feat_3d, interp_cache=cache
    )

    params = prepare_clfm_params(variables["params"])
    score = hoist_interp_score(variables["params"]["interp"], cache[1])
    tap_idx, tap_w = grid_sample_cache(uv, h, w)
    out2d, out3d = clfm_fused_pallas(
        feat_2d, feat_3d, score, cache[0], tap_idx, tap_w, params,
        interpret=True,
    )

    assert out2d.shape == out2d_ref.shape
    assert out3d.shape == out3d_ref.shape
    np.testing.assert_allclose(
        np.asarray(out2d), np.asarray(out2d_ref), rtol=0, atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(out3d), np.asarray(out3d_ref), rtol=0, atol=5e-2
    )


@pytest.mark.slow
def test_camliraft_model_fused_clfm_matches_exact(rng, monkeypatch):
    """CamLiRAFT eval fast path with ALL gated Pallas kernels enabled
    (CLFM + update3d + corr3d tail — the exact combination the on-hardware
    numerics gate runs) vs the exact path on tiny shapes. Catches consts-key
    and kernel-interaction bugs before the chip does."""
    monkeypatch.setenv("CAMLIFLOW_CLFM", "1")
    monkeypatch.setenv("CAMLIFLOW_UPDATE3D", "1")
    monkeypatch.setenv("CAMLIFLOW_CORR3D_TAIL", "1")
    monkeypatch.setenv("CAMLIFLOW_PGATHER", "1")
    monkeypatch.setenv("CAMLIFLOW_CORR_BF16_OUT", "1")

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
