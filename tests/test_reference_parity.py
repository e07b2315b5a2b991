"""Cross-framework forward parity against the actual reference PyTorch code.

These tests instantiate the reference modules from /root/reference (torch CPU,
CUDA extensions absent -> the reference's own PyTorch fallbacks run), port
their randomly-initialised state dicts through tools/port_checkpoint.py, and
assert our JAX modules produce the same outputs on the same inputs. This is
the live evidence behind the "checkpoint porter" and the <=1% EPE parity
claim: it fails if any layer's semantics or the porter's name tables drift.

Covered: CLFM (reference clfm.py:7-214) standalone, and the full
CamLiRAFT_L_Core recurrence (reference camliraft_l_core.py:158-225) through
FPS pyramid, encoders, cost-volume pyramid, Correlation3D, MotionEncoder3D,
GRU3D, FlowHead3D and the final knn upsampling.
"""

import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


def _load_reference():
    """Import the reference `models` package with mmdet stubbed out.

    Only raft_core.py needs mmdet (for its ResNet backbone class); the 3D
    modules under test never touch it.
    """
    for name in ("mmdet", "mmdet.models", "mmdet.models.backbones"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if not hasattr(sys.modules["mmdet.models.backbones"], "ResNet"):
        sys.modules["mmdet.models.backbones"].ResNet = type("ResNet", (), {})
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import models as ref_models  # noqa: F401  (triggers package init)
    import models.clfm as ref_clfm
    import models.camliraft_l_core as ref_raft_l_core

    return ref_clfm, ref_raft_l_core


def _port(state_dict, model_name, variables):
    from port_checkpoint import port_state_dict

    state_dict = {k: v.detach().numpy() for k, v in state_dict.items()}
    new_vars, missing, unused = port_state_dict(state_dict, model_name, variables)
    assert not missing, f"unported params: {missing[:10]}"
    assert not unused, f"unused torch keys: {unused[:10]}"
    return new_vars


def test_clfm_forward_parity(rng):
    import torch

    ref_clfm, _ = _load_reference()
    from port_checkpoint import convert_tensor, translate_suffix

    from camliflow_tpu.nn.clfm import CLFM
    from camliflow_tpu.runtime.checkpoint import flat_to_tree, tree_to_flat

    torch.manual_seed(0)
    c2d, c3d, batch, h, w, n = 32, 48, 2, 16, 24, 64
    ref = ref_clfm.CLFM(c2d, c3d, fusion_fn="sk", norm=None).eval()

    uv = (rng.rand(batch, n, 2) * [w - 1, h - 1]).astype(np.float32)
    feat_2d = rng.randn(batch, h, w, c2d).astype(np.float32)
    feat_3d = rng.randn(batch, n, c3d).astype(np.float32)

    with torch.no_grad():
        out2d_ref, out3d_ref = ref(
            torch.from_numpy(uv.transpose(0, 2, 1)),
            torch.from_numpy(feat_2d.transpose(0, 3, 1, 2)),
            torch.from_numpy(feat_3d.transpose(0, 2, 1)),
        )

    model = CLFM(c2d, c3d, fusion_fn="sk", norm=None)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(uv), jnp.asarray(feat_2d),
        jnp.asarray(feat_3d),
    )
    # standalone module: translate suffixes without a model prefix table
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    flat = tree_to_flat(variables)
    ported = {}
    for path, value in flat.items():
        _, rest = path.split("/", 1)
        tname = translate_suffix(rest, "")
        assert tname in state, (path, tname)
        ported[path] = convert_tensor(state[tname], value.shape).astype(value.dtype)
    variables = flat_to_tree(ported)

    out2d, out3d = model.apply(
        variables, jnp.asarray(uv), jnp.asarray(feat_2d), jnp.asarray(feat_3d)
    )
    np.testing.assert_allclose(
        np.asarray(out2d),
        out2d_ref.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out3d),
        out3d_ref.numpy().transpose(0, 2, 1),
        rtol=1e-4,
        atol=1e-5,
    )


def test_camliraft_l_core_forward_parity(rng):
    import torch

    _, ref_core_mod = _load_reference()

    from camliflow_tpu.models import camliraft_l as m
    from camliflow_tpu.utils.config import Config

    torch.manual_seed(0)
    n_iters = 2
    ref_cfgs = SimpleNamespace(n_iters_train=n_iters, n_iters_eval=n_iters)
    ref_core = ref_core_mod.CamLiRAFT_L_Core(ref_cfgs).eval()

    # the reference core hardcodes the [4096, ..., 256] pyramid, so the cloud
    # must have > 4096 points
    batch, n_points = 1, 5000
    pc1 = rng.randn(batch, n_points, 3).astype(np.float32)
    pc1[..., 2] = np.abs(pc1[..., 2]) * 10 + 5
    pc2 = pc1 + 0.05 * rng.randn(batch, n_points, 3).astype(np.float32)

    with torch.no_grad():
        ref_preds = ref_core(
            torch.from_numpy(pc1.transpose(0, 2, 1)),
            torch.from_numpy(pc2.transpose(0, 2, 1)),
        )
    ref_final = ref_preds[-1].numpy().transpose(0, 2, 1)  # [B, N, 3]

    cfgs = Config(
        {
            "name": "camliraft_l",
            "n_iters_train": n_iters,
            "n_iters_eval": n_iters,
            "ids": {"enabled": False},
            "loss": {"gamma": 0.8, "order": "l2-norm"},
        }
    )
    inputs = {
        "pcs": jnp.asarray(np.concatenate([pc1, pc2], axis=-1)),
        "intrinsics": jnp.asarray(
            np.tile([100.0, 50.0, 50.0], (batch, 1)).astype(np.float32)
        ),
    }
    model = m.CamLiRAFTL(cfgs=cfgs.to_dict(), train_mode=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    variables = jax.tree.map(np.asarray, variables)

    # full-model naming: our wrapper paths are core/..., reference state_dict
    # keys are core.... once wrapped — wrap it to reuse the porter tables
    state_dict = {f"core.{k}": v for k, v in ref_core.state_dict().items()}
    variables = _port(state_dict, "camliraft_l", variables)

    out = model.apply(variables, inputs)
    flow = np.asarray(out["flow_3d"])

    # two full GRU iterations across two frameworks: f32 matmul reassociation
    # differences accumulate, but must stay far below any metric threshold
    err = np.abs(flow - ref_final)
    scale = np.abs(ref_final).max()
    assert err.max() <= 1e-3 * max(scale, 1.0), (err.max(), scale)
    np.testing.assert_allclose(flow, ref_final, rtol=5e-3, atol=5e-5)


def test_camlipwc_l_forward_parity(rng):
    import torch

    _load_reference()
    import models.camlipwc_l as ref_mod

    from camliflow_tpu.models import camlipwc_l as m
    from camliflow_tpu.utils.config import Config

    torch.manual_seed(0)
    ref_cfgs = SimpleNamespace(
        ids=SimpleNamespace(enabled=False),
        norm=SimpleNamespace(
            feature_pyramid="batch_norm", correlation=None, flow_estimator=None
        ),
    )
    ref_model = ref_mod.CamLiPWC_L(ref_cfgs).eval()

    batch, n_points = 1, 5000
    pc1 = rng.randn(batch, n_points, 3).astype(np.float32)
    pc1[..., 2] = np.abs(pc1[..., 2]) * 10 + 5
    pc2 = pc1 + 0.05 * rng.randn(batch, n_points, 3).astype(np.float32)
    intrinsics = np.tile([100.0, 50.0, 50.0], (batch, 1)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            {
                "pcs": torch.from_numpy(
                    np.concatenate([pc1, pc2], axis=-1).transpose(0, 2, 1)
                ),
                "intrinsics": torch.from_numpy(intrinsics),
            }
        )
    ref_flow = ref_out["flow_3d"].numpy().transpose(0, 2, 1)  # [B, N, 3]

    cfgs = Config(
        {
            "name": "camlipwc_l",
            "ids": {"enabled": False},
            "norm": {"feature_pyramid": "batch_norm", "flow_estimator": None},
            "loss": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2-norm"},
        }
    )
    inputs = {
        "pcs": jnp.asarray(np.concatenate([pc1, pc2], axis=-1)),
        "intrinsics": jnp.asarray(intrinsics),
    }
    model = m.CamLiPWCL(cfgs=cfgs.to_dict(), train_mode=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    variables = jax.tree.map(np.asarray, variables)

    state_dict = {f"core.{k}": v for k, v in ref_model.core.state_dict().items()}
    variables = _port(state_dict, "camlipwc_l", variables)

    out = model.apply(variables, inputs)
    flow = np.asarray(out["flow_3d"])

    # five decode levels of KNN-interpolated refinement across two frameworks:
    # near-tie neighbour selections may flip on f32 reassociation, so allow a
    # 0.1% element tail while bounding the worst case at 1e-3 of the scale
    err = np.abs(flow - ref_flow)
    scale = np.abs(ref_flow).max()
    assert err.max() <= 1e-3 * max(scale, 1.0), (err.max(), scale)
    close = np.isclose(flow, ref_flow, rtol=5e-3, atol=5e-5)
    assert close.mean() >= 0.999, close.mean()
