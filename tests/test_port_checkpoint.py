"""Tests for the PyTorch checkpoint porter: name translation against the
reference's state_dict naming (derived from the reference model definitions)
and tensor-layout conversion round-trips."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from port_checkpoint import (  # noqa: E402
    convert_tensor,
    our_path_to_torch,
    port_state_dict,
)


CAMLIRAFT_CASES = [
    # ResNet backbone (mmdet naming, raft_core.py:10-38)
    ("core/fnet_2d/conv1/kernel", "core.branch_2d.fnet.conv1.weight"),
    ("core/fnet_2d/bn1/scale", "core.branch_2d.fnet.bn1.weight"),
    ("core/fnet_2d/layer1_0/conv2/kernel", "core.branch_2d.fnet.layer1.0.conv2.weight"),
    (
        "core/fnet_2d/layer2_0/downsample_conv/kernel",
        "core.branch_2d.fnet.layer2.0.downsample.0.weight",
    ),
    (
        "core/fnet_2d/layer2_0/downsample_bn/mean",
        "core.branch_2d.fnet.layer2.0.downsample.1.running_mean",
    ),
    ("core/fnet_2d/align/Conv_0/kernel", "core.branch_2d.fnet.align.conv_fn.weight"),
    # aligners
    ("core/cnet_aligner_2d/kernel", "core.branch_2d.cnet_aligner.weight"),
    ("core/fnet_aligner_2d/kernel", "core.branch_2d.correlation.fnet_aligner.weight"),
    # GRU / motion / flow head / upsampler (scanned update block)
    ("core/update/gru_2d/convz1/kernel", "core.branch_2d.gru.convz1.weight"),
    (
        "core/update/motion_encoder_2d/conv_c1/bias",
        "core.branch_2d.motion_encoder.conv_c1.bias",
    ),
    ("core/update/flow_head_2d/conv1/kernel", "core.branch_2d.flow_head.conv1.weight"),
    (
        "core/update/convex_upsampler/mask_0/kernel",
        "core.branch_2d.convex_upsampler.mask.0.weight",
    ),
    (
        "core/update/convex_upsampler/mask_1/kernel",
        "core.branch_2d.convex_upsampler.mask.2.weight",
    ),
    # 3D encoder (Encoder3D: level0_mlp + mlps + convs, camliraft_l_core.py:8-19)
    (
        "core/fnet_3d/level0_mlp/DenseNormAct_0/Dense_0/kernel",
        "core.branch_3d.fnet.level0_mlp.convs.0.conv_fn.weight",
    ),
    (
        "core/fnet_3d/mlp_0/DenseNormAct_1/Dense_0/kernel",
        "core.branch_3d.fnet.mlps.0.convs.1.conv_fn.weight",
    ),
    (
        "core/fnet_3d/conv_0/weight_net/DenseNormAct_0/Dense_0/kernel",
        "core.branch_3d.fnet.convs.0.weight_net.convs.0.conv_fn.weight",
    ),
    ("core/fnet_3d/conv_0/linear/kernel", "core.branch_3d.fnet.convs.0.linear.weight"),
    (
        "core/fnet_3d/conv_0/Norm_0/BatchNorm_0/var",
        "core.branch_3d.fnet.convs.0.norm_fn.running_var",
    ),
    # 3D correlation / GRU / motion encoder
    (
        "core/update/correlation_3d/cost_mlp/DenseNormAct_0/Dense_0/kernel",
        "core.branch_3d.correlation.cost_mlp.convs.0.conv_fn.weight",
    ),
    (
        "core/update/correlation_3d/merge/Dense_0/kernel",
        "core.branch_3d.correlation.merge.conv_fn.weight",
    ),
    (
        "core/update/gru_3d/conv_z/mlp/DenseNormAct_0/Dense_0/kernel",
        "core.branch_3d.gru.conv_z.mlp.convs.0.conv_fn.weight",
    ),
    (
        "core/update/motion_encoder_3d/conv_f1/weight_net/DenseNormAct_2/Dense_0/bias",
        "core.branch_3d.motion_encoder.conv_f1.weight_net.convs.2.conv_fn.bias",
    ),
    ("core/update/flow_head_3d/fc/kernel", "core.branch_3d.flow_head.fc.weight"),
    # CLFM (clfm.py:7-51, 171-214)
    (
        "core/clfm_fnet/interp/score_net_0/Dense_0/kernel",
        "core.clfm_fnet.interp.score_net.0.conv_fn.weight",
    ),
    (
        "core/clfm_fnet/interp/out_conv/Dense_0/kernel",
        "core.clfm_fnet.interp.out_conv.conv_fn.weight",
    ),
    ("core/clfm_fnet/mlps3d/Dense_0/kernel", "core.clfm_fnet.mlps3d.conv_fn.weight"),
    (
        "core/clfm_fnet/fuse2d/align1/Dense_0/kernel",
        "core.clfm_fnet.fuse2d.align1.conv_fn.weight",
    ),
    ("core/clfm_fnet/fuse2d/fc_mid/kernel", "core.clfm_fnet.fuse2d.fc_mid.0.weight"),
    ("core/update/clfm_corr/fuse3d/fc_out/kernel", "core.clfm_corr.fuse3d.fc_out.0.weight"),
]


@pytest.mark.parametrize("ours,theirs", CAMLIRAFT_CASES)
def test_camliraft_name_translation(ours, theirs):
    assert our_path_to_torch(ours, "camliraft") == theirs


CAMLIPWC_L_CASES = [
    # FeaturePyramid3D uses pyramid_mlps/pyramid_convs (camlipwc_l_core.py:14-19)
    (
        "core/feature_pyramid/mlp_0/DenseNormAct_0/Dense_0/kernel",
        "core.feature_pyramid.pyramid_mlps.0.convs.0.conv_fn.weight",
    ),
    (
        "core/feature_pyramid/conv_2/linear/bias",
        "core.feature_pyramid.pyramid_convs.2.linear.bias",
    ),
    (
        "core/correlation_1/weight_net2/DenseNormAct_0/Dense_0/kernel",
        "core.correlations.1.weight_net2.convs.0.conv_fn.weight",
    ),
    (
        "core/correlation_1/feat_aligner/Dense_0/kernel",
        "core.correlations.1.feat_aligner.conv_fn.weight",
    ),
    (
        "core/flow_estimator/point_conv1/linear/kernel",
        "core.flow_estimator.point_conv1.linear.weight",
    ),
    ("core/flow_estimator/conv_last/kernel", "core.flow_estimator.conv_last.weight"),
]


@pytest.mark.parametrize("ours,theirs", CAMLIPWC_L_CASES)
def test_camlipwc_l_name_translation(ours, theirs):
    assert our_path_to_torch(ours, "camlipwc_l") == theirs


def test_convert_tensor_layouts(rng):
    # Conv2d OIHW -> HWIO
    w = rng.randn(8, 4, 3, 3).astype(np.float32)
    out = convert_tensor(w, (3, 3, 4, 8))
    np.testing.assert_array_equal(out[1, 2, :, :], w[:, :, 1, 2].T)
    # Conv1d -> Dense
    w = rng.randn(8, 4, 1).astype(np.float32)
    np.testing.assert_array_equal(convert_tensor(w, (4, 8)), w[:, :, 0].T)
    # 1x1 Conv2d -> Dense
    w = rng.randn(8, 4, 1, 1).astype(np.float32)
    np.testing.assert_array_equal(convert_tensor(w, (4, 8)), w[:, :, 0, 0].T)
    # Linear -> Dense
    w = rng.randn(8, 4).astype(np.float32)
    np.testing.assert_array_equal(convert_tensor(w, (4, 8)), w.T)


def test_port_camliraft_l_end_to_end(rng):
    """Build CamLiRAFT-L, fabricate a torch-style state dict covering every
    parameter (via the translation itself checked above), port it, and check
    every leaf was filled with the fabricated values."""
    import jax
    import jax.numpy as jnp

    from camliflow_tpu.models import camliraft_l as m
    from camliflow_tpu.runtime.checkpoint import tree_to_flat
    from camliflow_tpu.utils.config import Config

    cfgs = Config(
        {
            "n_iters_train": 1,
            "n_iters_eval": 1,
            "ids": {"enabled": False},
            "loss": {"gamma": 0.8, "order": "l2-norm"},
            "n_samples_list": [256, 128, 64, 32, 16],
        }
    )
    pc1 = rng.randn(1, 512, 3).astype(np.float32)
    inputs = {
        "pcs": jnp.asarray(np.concatenate([pc1, pc1 + 0.01], -1)),
        "intrinsics": jnp.asarray(np.float32([[1050, 479.5, 269.5]])),
    }
    model = m.CamLiRAFTL(cfgs=cfgs, train_mode=False)
    variables = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(0), inputs)
    )

    flat = tree_to_flat(variables)
    state_dict = {}
    expected = {}
    for path, value in flat.items():
        _, rest = path.split("/", 1)
        torch_name = our_path_to_torch(rest, "camliraft_l")
        assert torch_name is not None, path
        # fabricate a torch-layout tensor whose conversion is a known constant
        fill = np.full(value.shape, len(state_dict) % 97, dtype=np.float32)
        if value.ndim == 4:  # conv kernel: HWIO -> store as OIHW
            state_dict[torch_name] = fill.transpose(3, 2, 0, 1)
        elif value.ndim == 2:
            state_dict[torch_name] = fill.T
        else:
            state_dict[torch_name] = fill
        expected[path] = fill

    new_vars, missing, unused = port_state_dict(state_dict, "camliraft_l", variables)
    assert not missing, missing[:5]
    assert not unused, unused[:5]
    new_flat = tree_to_flat(new_vars)
    for path, want in expected.items():
        np.testing.assert_array_equal(new_flat[path], want)


def test_port_camliraft_full_coverage(rng):
    """Every CamLiRAFT parameter must translate to a reference name — catches
    module renames that silently break checkpoint porting."""
    import jax

    from camliflow_tpu.models import camliraft as m
    from camliflow_tpu.runtime.checkpoint import tree_to_flat
    from camliflow_tpu.utils.config import Config

    cfgs = Config(
        {
            "name": "camliraft",
            "freeze_bn": False,
            "backbone": {"depth": 50},
            "n_iters_train": 1,
            "n_iters_eval": 1,
            "fuse_fnet": True,
            "fuse_cnet": True,
            "fuse_corr": True,
            "fuse_motion": True,
            "fuse_hidden": True,
            "loss2d": {"gamma": 0.8, "order": "l2-norm"},
            "loss3d": {"gamma": 0.8, "order": "l2-norm"},
            "n_samples_list": [256, 128, 64, 32, 16],
        }
    )
    import jax.numpy as jnp

    images = rng.randint(0, 255, size=(1, 64, 64, 6)).astype(np.float32)
    pc1 = rng.randn(1, 512, 3).astype(np.float32)
    pc1[..., 2] = np.abs(pc1[..., 2]) * 10 + 5
    inputs = {
        "images": jnp.asarray(images),
        "pcs": jnp.asarray(np.concatenate([pc1, pc1 + 0.01], -1)),
        "intrinsics": jnp.asarray(np.float32([[100, 31.5, 31.5]])),
    }
    model = m.CamLiRAFT(cfgs=cfgs.to_dict(), train_mode=False)
    variables = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0), inputs))

    flat = tree_to_flat(variables)
    unmapped = []
    for path in flat:
        _, rest = path.split("/", 1)
        torch_name = our_path_to_torch(rest, "camliraft")
        if torch_name is None:
            unmapped.append(path)
    assert not unmapped, f"{len(unmapped)} unmapped params, e.g. {unmapped[:5]}"
