"""Golden tests for the optimizer factory.

1. Parameter partition: for every parameter of all 6 models, the group that
   `param_group_label` assigns must equal the group the reference's prefix
   rule would assign to the ported torch name (reference factory.py:45-58:
   3D group iff the torch name starts with 'core.branch_3d'; no-decay iff
   ndim <= 1 or the name ends with '.bias'). A silent drift here trains a
   branch at the wrong learning rate (lr_2d vs lr_3d differ 10x in the
   shipped configs).

2. timm cosine schedule: hand-computed golden LR values at the warmup edge,
   mid-cosine, and final epoch (timm CosineLRScheduler semantics with
   warmup_prefix=False, stepped once per epoch — reference factory.py:61-80,
   train.py:129).
"""

import math
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from port_checkpoint import our_path_to_torch

from camliflow_tpu.models.factory import param_group_label, timm_cosine_schedule
from camliflow_tpu.runtime.checkpoint import tree_to_flat
from camliflow_tpu.utils.config import Config

from test_models_forward import make_inputs  # noqa: E402  (tiny input builder)

SAMPLES = [256, 128, 64, 32, 16]

MODEL_CFGS = {
    "camliraft": {
        "name": "camliraft",
        "batch_size": 1,
        "freeze_bn": False,
        "backbone": {"depth": 18, "pretrained": None},
        "n_iters_train": 1,
        "n_iters_eval": 1,
        "fuse_fnet": True,
        "fuse_cnet": True,
        "fuse_corr": True,
        "fuse_motion": True,
        "fuse_hidden": True,
        "n_samples_list": SAMPLES,
        "loss2d": {"gamma": 0.8, "order": "l2-norm"},
        "loss3d": {"gamma": 0.8, "order": "l2-norm"},
    },
    "camliraft_l": {
        "name": "camliraft_l",
        "n_iters_train": 1,
        "n_iters_eval": 1,
        "ids": {"enabled": False},
        "n_samples_list": SAMPLES,
        "loss": {"gamma": 0.8, "order": "l2-norm"},
    },
    "raft": {
        "name": "raft",
        "backbone": {"depth": 18},
        "n_iters_train": 1,
        "n_iters_eval": 1,
        "loss": {"gamma": 0.8, "order": "l2-norm"},
    },
    "pwc": {
        "name": "pwc",
        "max_displacement": 4,
        "lite_estimator": False,
        "norm": {
            "feature_pyramid": "batch_norm",
            "flow_estimator": None,
            "context_network": None,
        },
        "loss": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2-norm"},
    },
    "camlipwc": {
        "name": "camlipwc",
        "freeze_bn": False,
        "pwc2d": {
            "norm": {
                "feature_pyramid": "batch_norm",
                "flow_estimator": None,
                "context_network": None,
            },
            "max_displacement": 4,
            "lite_estimator": False,
        },
        "pwc3d": {
            "norm": {
                "feature_pyramid": "batch_norm",
                "correlation": None,
                "flow_estimator": None,
            },
            "k": 16,
        },
        "fusion": {
            "fuse_pyramid": True,
            "fuse_correlation": True,
            "fuse_estimator": True,
        },
        "loss2d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2-norm"},
        "loss3d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2-norm"},
        "n_samples_list": SAMPLES,
    },
    "camlipwc_l": {
        "name": "camlipwc_l",
        "ids": {"enabled": False},
        "norm": {
            "feature_pyramid": "batch_norm",
            "correlation": None,
            "flow_estimator": None,
        },
        "k": 16,
        "n_samples_list": SAMPLES,
        "loss": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2-norm"},
    },
}


@pytest.mark.parametrize("model_name", sorted(MODEL_CFGS))
def test_param_partition_matches_reference_rule(model_name, rng):
    from camliflow_tpu.models.factory import model_factory

    cfgs = Config(MODEL_CFGS[model_name])
    spec = model_factory(cfgs.to_dict())
    model = spec.module_cls(cfgs=cfgs.to_dict(), train_mode=True)
    inputs = make_inputs(rng)
    # eval_shape: parameter tree (paths + shapes) without running any compute
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), inputs)
    flat = tree_to_flat(variables["params"])
    assert flat, model_name

    mismatches = []
    unmapped = []
    for path, leaf in flat.items():
        label = param_group_label(tuple(path.split("/")), leaf)
        torch_name = our_path_to_torch(path, model_name)
        if torch_name is None:
            unmapped.append(path)
            continue
        want_3d = torch_name.startswith("core.branch_3d")
        want_no_decay = leaf.ndim <= 1 or torch_name.endswith(".bias")
        want = f"{'3d' if want_3d else '2d'}_{'no_decay' if want_no_decay else 'decay'}"
        if label != want:
            mismatches.append((path, torch_name, label, want))
    assert not unmapped, f"{model_name}: porter has no mapping for {unmapped[:10]}"
    assert not mismatches, f"{model_name}: {mismatches[:10]}"


def test_timm_cosine_schedule_golden_values():
    # timm CosineLRScheduler(t_initial=100, lr_min=1e-6, warmup_t=5,
    # warmup_lr_init=1e-5, warmup_prefix=False), stepped per epoch:
    #   warmup epoch t < 5: lr = 1e-5 + t * (4e-4 - 1e-5) / 5
    #   cosine epoch t >= 5: lr = 1e-6 + 0.5*(4e-4 - 1e-6)*(1 + cos(pi*t/100))
    base, epochs, warm_t, warm_lr, lr_min = 4e-4, 100, 5, 1e-5, 1e-6
    steps_per_epoch = 7
    sched = timm_cosine_schedule(
        base, epochs, steps_per_epoch, warmup_epochs=warm_t,
        warmup_lr=warm_lr, min_lr=lr_min,
    )

    def lr_at_epoch(epoch):
        # piecewise-constant within the epoch: probe first and last step
        first = float(sched(jnp.asarray(epoch * steps_per_epoch)))
        last = float(sched(jnp.asarray((epoch + 1) * steps_per_epoch - 1)))
        assert first == last, (epoch, first, last)
        return first

    np.testing.assert_allclose(lr_at_epoch(0), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(
        lr_at_epoch(3), 1e-5 + 3 * (4e-4 - 1e-5) / 5, rtol=1e-6
    )
    # warmup edge: epoch 5 is the first cosine epoch
    np.testing.assert_allclose(
        lr_at_epoch(5),
        1e-6 + 0.5 * (4e-4 - 1e-6) * (1 + math.cos(math.pi * 5 / 100)),
        rtol=1e-6,
    )
    # mid-cosine
    np.testing.assert_allclose(
        lr_at_epoch(50),
        1e-6 + 0.5 * (4e-4 - 1e-6) * (1 + math.cos(math.pi * 50 / 100)),
        rtol=1e-6,
    )
    # final epoch (f32 cos rounding -> loose rtol)
    np.testing.assert_allclose(
        lr_at_epoch(99),
        1e-6 + 0.5 * (4e-4 - 1e-6) * (1 + math.cos(math.pi * 99 / 100)),
        rtol=1e-4,
    )
