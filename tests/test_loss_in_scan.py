"""loss_in_scan parity: accumulating the sequence loss inside the refinement
scan (no stacked [T, ...] predictions) must reproduce the stacked
calc_sequence_loss path — same loss value, same gradients, same metrics
inputs — including on images whose dims are not multiples of 8 (the 2D
target is zero-padded instead of unpadding the predictions)."""

import jax
import jax.numpy as jnp
import numpy as np

from camliflow_tpu.models import camliraft
from camliflow_tpu.utils.config import Config


def _cfg(loss_in_scan: bool) -> Config:
    return Config(
        {
            "name": "camliraft",
            "freeze_bn": False,
            "backbone": {"depth": 18},
            "n_iters_train": 3,
            "n_iters_eval": 1,
            "fuse_fnet": True,
            "fuse_cnet": True,
            "fuse_corr": True,
            "fuse_motion": True,
            "fuse_hidden": False,
            "loss2d": {"gamma": 0.8, "order": "l2-norm"},
            "loss3d": {"gamma": 0.9, "order": "l1"},
            "n_samples_list": [256, 128, 64, 32, 16],
            "loss_in_scan": loss_in_scan,
        }
    )


def test_loss_in_scan_matches_stacked(rng):
    batch, h, w, n = 2, 60, 68, 512  # h, w NOT multiples of 8 -> real padding
    images = rng.randint(0, 255, size=(batch, h, w, 6)).astype(np.float32)
    pc1 = rng.randn(batch, n, 3).astype(np.float32)
    pc1[..., 2] = np.abs(pc1[..., 2]) * 10 + 5
    pc2 = pc1 + 0.05 * rng.randn(batch, n, 3).astype(np.float32)
    target_2d = np.concatenate(
        [
            rng.randn(batch, h, w, 2).astype(np.float32),
            (rng.rand(batch, h, w, 1) > 0.3).astype(np.float32),
        ],
        axis=-1,
    )
    inputs = {
        "images": jnp.asarray(images),
        "pcs": jnp.asarray(np.concatenate([pc1, pc2], -1)),
        "intrinsics": jnp.asarray(
            np.tile([100.0, (w - 1) / 2, (h - 1) / 2], (batch, 1)).astype(
                np.float32
            )
        ),
        "flow_2d": jnp.asarray(target_2d),
        "flow_3d": jnp.asarray(pc2 - pc1),
    }

    results = {}
    for flag in (False, True):
        cfgs = _cfg(flag)
        model = camliraft.CamLiRAFT(cfgs=cfgs.to_dict(), train_mode=True)
        variables = model.init(jax.random.PRNGKey(0), inputs)

        def loss_of(params):
            outputs, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                inputs,
                mutable=["batch_stats"],
            )
            loss, metrics = camliraft.loss_fn(outputs, inputs, cfgs)
            return loss, (outputs, metrics)

        (loss, (outputs, metrics)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(variables["params"])
        results[flag] = (loss, outputs, metrics, grads)

    loss_a, out_a, met_a, g_a = results[False]
    loss_b, out_b, met_b, g_b = results[True]
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    # final flows (metrics inputs) agree
    np.testing.assert_allclose(
        np.asarray(out_a["flow_2d"]), np.asarray(out_b["flow_2d"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_a["flow_3d"]), np.asarray(out_b["flow_3d"]),
        rtol=1e-5, atol=1e-6,
    )
    # gradients agree (same math, different reduction structure)
    key = lambda kv: jax.tree_util.keystr(kv[0])  # noqa: E731
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_a), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(g_b), key=key),
    ):
        assert ka == kb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=str(ka),
        )
    # the in-scan path reports no stacked sequences
    assert "flow_2d_seq" not in out_b and "loss_2d" in out_b
