"""End-to-end tests for the KITTI submission writer and rigid-background
refinement on synthetic data (the file-format plumbing is the risk here)."""

import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

from camliflow_tpu.data import io
from camliflow_tpu.utils.config import Config

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    subprocess.check_call(
        [sys.executable, str(REPO / "tools/make_synthetic_kitti.py"),
         "--out", str(root), "--n", "2", "--height", "120", "--width", "184"]
    )
    return root


def test_kitti_test_dataset_reads(kitti_root):
    from camliflow_tpu.data.datasets import KITTITest

    cfgs = Config(
        {
            "name": "kitti_test",
            "root_dir": str(kitti_root),
            "split": "testing200",
            "disp_provider": "ganet",
            "max_depth": 90,
            "n_points": 256,
            "n_workers": 0,
            "zero_padding": {"target_h": 128, "target_w": 192},
        }
    )
    ds = KITTITest(cfgs)
    sample = ds[0]
    assert sample["images"].shape == (128, 192, 6)
    assert sample["pcs"].shape == (256, 6)
    assert sample["input_h"] == 120 and sample["input_w"] == 184


def test_submission_writer_end_to_end(kitti_root, tmp_path, monkeypatch):
    from camliflow_tpu.runtime.submission import SubmissionWriter

    cfgs = Config(
        {
            "model": {
                "name": "camliraft",
                "batch_size": 2,
                "freeze_bn": False,
                "backbone": {"depth": 18},
                "n_iters_train": 1,
                "n_iters_eval": 1,
                "fuse_fnet": False,
                "fuse_cnet": False,
                "fuse_corr": False,
                "fuse_motion": False,
                "fuse_hidden": False,
                "loss2d": {"gamma": 0.8, "order": "l2-norm"},
                "loss3d": {"gamma": 0.8, "order": "l2-norm"},
                "n_samples_list": [128, 64, 32, 16],
            },
            "testset": {
                "name": "kitti_test",
                "root_dir": str(kitti_root),
                "split": "testing200",
                "disp_provider": "ganet",
                "max_depth": 90,
                "n_points": 256,
                "n_workers": 0,
                "zero_padding": {"target_h": 128, "target_w": 192},
            },
            "ckpt": {"path": None},
        }
    )

    import jax

    from camliflow_tpu.models import camliraft as m
    from camliflow_tpu.data.datasets import KITTITest

    # random-init variables (no trained ckpt in this environment)
    ds = KITTITest(cfgs.testset)
    sample = ds[0]
    import jax.numpy as jnp

    inputs = {
        k: jnp.asarray(v)[None]
        for k, v in sample.items()
        if isinstance(v, np.ndarray)
    }
    model = m.CamLiRAFT(cfgs=cfgs.model.to_dict(), train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), inputs)

    # only 2 synthetic frames exist
    monkeypatch.setattr(KITTITest, "__len__", lambda self: 2)

    writer = SubmissionWriter(cfgs, variables=variables)
    monkeypatch.chdir(tmp_path)
    writer.run()

    out = tmp_path / "submission" / "testing"
    for i in range(2):
        for sub in ("disp_0", "flow_initial", "disp_1_initial"):
            assert (out / sub / ("%06d_10.png" % i)).exists(), sub
        assert (out / "occ" / ("%06d_10.png" % i)).exists()

    # files parse back through the KITTI codecs
    flow, mask = io.load_flow_png(str(out / "flow_initial" / "000000_10.png"))
    assert flow.shape == (120, 184, 2) and np.isfinite(flow).all()
    disp, valid = io.load_disp_png(str(out / "disp_1_initial" / "000000_10.png"))
    assert disp.shape == (120, 184)


def test_mod_flow_rigid_scene():
    """mod_flow recovers a rigid background: synthetic plane + camera
    translation; refined flow should match the rigid reprojection closely."""
    from camliflow_tpu.postprocess import mod_flow

    h, w = 96, 128
    f, cx, cy = 100.0, (w - 1) / 2, (h - 1) / 2
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)

    # scene: tilted plane, depth 5..15
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    depth = 5.0 + 10.0 * ys / h
    X = (xs - cx) * depth / f
    Y = (ys - cy) * depth / f
    P = np.stack([X, Y, depth], -1)

    # camera translation (rigid scene motion in camera frame)
    # large enough that mean parallax clears the static-scene
    # threshold (refine_utils.py:313, parallax_th=8)
    t = np.array([1.2, 0.2, 1.5], np.float32)
    P2 = P + t
    x2 = cx + f * P2[..., 0] / P2[..., 2]
    y2 = cy + f * P2[..., 1] / P2[..., 2]
    flow_gt = np.stack([x2 - xs, y2 - ys], -1).astype(np.float32)

    baseline = 0.54
    disp = baseline * f / depth
    disp_change = (baseline * f / P2[..., 2]).astype(np.float32)

    # noisy initial flow
    rng = np.random.RandomState(0)
    flow_noisy = flow_gt + rng.randn(h, w, 2).astype(np.float32) * 0.5

    bg_mask = np.ones((h, w), bool)
    occ_mask = np.ones((h, w), bool)
    np.random.seed(0)
    flow_ref, disp_ref = mod_flow(
        bg_mask, disp.astype(np.float32), disp_change.copy(), flow_noisy,
        K, K, bl=baseline, occ_mask=occ_mask,
    )
    assert np.isfinite(flow_ref).all() and np.isfinite(disp_ref).all()
    # refined flow should be closer to GT than the noisy input on average
    err_in = np.linalg.norm(flow_noisy - flow_gt, axis=-1).mean()
    err_out = np.linalg.norm(flow_ref - flow_gt, axis=-1).mean()
    assert err_out < err_in, (err_in, err_out)
