"""Fused 3D update-chain Pallas kernels vs the Flax module chain.

Interpret mode on CPU; the real-chip path is guarded by the on-hardware
numerics gate (tools/measure_model.py numerics, see the verify skill).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camliflow_tpu.models.camliraft_l import (
    FlowHead3D,
    GRU3D,
    MotionEncoder3D,
)
from camliflow_tpu.ops.geometry import k_nearest_neighbor
from camliflow_tpu.ops.pallas_update3d import (
    gru_flowhead_3d_pallas,
    motion_encoder_3d_pallas,
    prepare_gru_flowhead_3d_params,
    prepare_motion_encoder_3d_params,
    to_kernel_layout,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _setup(rng, n=256):
    xyz = jnp.asarray(rng.standard_normal((1, n, 3)), jnp.float32)
    knn = k_nearest_neighbor(xyz, xyz, 32)
    return xyz, knn


@pytest.mark.slow  # dead-kernel semantics pin (PERF.md gather-probe verdict)
def test_motion_encoder_3d_fused(rng):
    xyz, knn = _setup(rng)
    n = xyz.shape[1]
    flow = jnp.asarray(0.1 * rng.standard_normal((1, n, 3)), jnp.float32)
    corr = jnp.asarray(rng.standard_normal((1, n, 128)), jnp.float32)

    module = MotionEncoder3D()
    variables = module.init(jax.random.PRNGKey(0), xyz, flow, corr, knn)
    want = module.apply(variables, xyz, flow, corr, knn, fast=True)

    dw = module.apply(
        variables, xyz, knn, method=MotionEncoder3D.precompute_weights
    )
    dw = to_kernel_layout(
        jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), dw)
    )
    params = prepare_motion_encoder_3d_params(variables["params"])
    got = motion_encoder_3d_pallas(flow, corr, knn, dw, params)

    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.slow  # dead-kernel semantics pin (PERF.md gather-probe verdict)
def test_gru_flowhead_3d_fused(rng):
    xyz, knn = _setup(rng)
    n = xyz.shape[1]
    h = jnp.asarray(rng.standard_normal((1, n, 128)), jnp.float32)
    x3d = jnp.asarray(rng.standard_normal((1, n, 64)), jnp.float32)
    motion = jnp.asarray(rng.standard_normal((1, n, 128)), jnp.float32)
    x = jnp.concatenate([x3d, motion], axis=-1)

    gru = GRU3D(hidden_dim=128)
    gvars = gru.init(jax.random.PRNGKey(1), xyz, h, x, knn)
    head = FlowHead3D()
    hvars = head.init(jax.random.PRNGKey(2), xyz, h, knn)

    h_want = gru.apply(gvars, xyz, h, x, knn, fast=True)
    d_want = head.apply(hvars, xyz, h_want, knn, fast=True)

    dw = {
        **gru.apply(gvars, xyz, knn, method=GRU3D.precompute_weights),
        **{
            f"flow_{k}": v
            for k, v in head.apply(
                hvars, xyz, knn, method=FlowHead3D.precompute_weights
            ).items()
        },
    }
    dw = to_kernel_layout(
        jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), dw)
    )
    params = prepare_gru_flowhead_3d_params(
        gvars["params"], hvars["params"]
    )
    h_got, d_got = gru_flowhead_3d_pallas(h, x3d, motion, knn, dw, params)

    np.testing.assert_allclose(
        np.asarray(h_got), np.asarray(h_want), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(d_got), np.asarray(d_want), rtol=2e-2, atol=3e-2
    )


@pytest.mark.slow  # dead-kernel semantics pin (PERF.md gather-probe verdict)
def test_int8_dw_quantisation(rng):
    """int8 dw + scale folding reproduces the bf16-dw kernel outputs within
    the documented max|channel|/254 envelope (through both fused kernels)."""
    from camliflow_tpu.ops.pallas_update3d import quantize_dw_int8

    xyz, knn = _setup(rng)
    n = xyz.shape[1]
    flow = jnp.asarray(0.1 * rng.standard_normal((1, n, 3)), jnp.float32)
    corr = jnp.asarray(rng.standard_normal((1, n, 128)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((1, n, 128)), jnp.float32)
    x3d = jnp.asarray(rng.standard_normal((1, n, 64)), jnp.float32)

    me = MotionEncoder3D()
    mvars = me.init(jax.random.PRNGKey(3), xyz, flow, corr, knn)
    gru = GRU3D(hidden_dim=128)
    gvars = gru.init(
        jax.random.PRNGKey(4), xyz, h,
        jnp.concatenate([x3d, h], axis=-1), knn,
    )
    head = FlowHead3D()
    hvars = head.init(jax.random.PRNGKey(5), xyz, h, knn)

    dw = {
        "motion_encoder": me.apply(
            mvars, xyz, knn, method=MotionEncoder3D.precompute_weights
        ),
        "gru": gru.apply(gvars, xyz, knn, method=GRU3D.precompute_weights),
        "flow_head": head.apply(
            hvars, xyz, knn, method=FlowHead3D.precompute_weights
        ),
    }
    me_params = prepare_motion_encoder_3d_params(mvars["params"])
    gf_params = prepare_gru_flowhead_3d_params(
        gvars["params"], hvars["params"]
    )

    def run(dw, me_p, gf_p, kernel_layout=False):
        dwb = jax.tree_util.tree_map(
            lambda w: w if w.dtype == jnp.int8 else w.astype(jnp.bfloat16), dw
        )
        if not kernel_layout:
            dwb = to_kernel_layout(dwb)
        motion = motion_encoder_3d_pallas(
            flow, corr, knn, dwb["motion_encoder"], me_p
        )
        dw3 = {
            **dwb["gru"],
            "flow_conv1": dwb["flow_head"]["conv1"],
            "flow_conv2": dwb["flow_head"]["conv2"],
        }
        return gru_flowhead_3d_pallas(h, x3d, motion, knn, dw3, gf_p)

    h_ref, d_ref = run(dw, me_params, gf_params)
    dw_q, me_q, gf_q = quantize_dw_int8(dw, me_params, gf_params)
    for tree in ("motion_encoder", "gru", "flow_head"):
        for v in dw_q[tree].values():
            assert v.dtype == jnp.int8
    h_got, d_got = run(dw_q, me_q, gf_q, kernel_layout=True)

    np.testing.assert_allclose(
        np.asarray(h_got), np.asarray(h_ref), rtol=3e-2, atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(d_got), np.asarray(d_ref), rtol=3e-2, atol=5e-2
    )


@pytest.mark.slow
def test_camliraft_fuse_hidden_with_update3d_flag(rng, monkeypatch):
    """fuse_hidden=True routes GRU3D/FlowHead3D through the exact path, which
    needs the original dw — the fused-3D const hoisting must disable itself
    (regression: kernel-layout int8 dw fed to the exact path crashed at
    trace time)."""
    monkeypatch.setenv("CAMLIFLOW_UPDATE3D", "1")

    import jax.numpy as jnp

    from camliflow_tpu.models import camliraft as camliraft_mod
    from tests.test_models_forward import SAMPLES, make_inputs

    cfgs = {
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
        "fast_inference": "on",
        "loss2d": {"gamma": 0.8, "order": "l2-norm"},
        "loss3d": {"gamma": 0.8, "order": "l2-norm"},
        "n_samples_list": SAMPLES,
    }
    inputs = make_inputs(np.random.RandomState(3))
    model = camliraft_mod.CamLiRAFT(cfgs=cfgs, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), inputs)
    out = model.apply(variables, inputs)
    assert bool(jnp.all(jnp.isfinite(out["flow_2d"])))
    assert bool(jnp.all(jnp.isfinite(out["flow_3d"])))
