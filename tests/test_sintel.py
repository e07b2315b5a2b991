"""Sintel dataset tests on synthetic .dpt/.flo/png files (sintel.py parity)."""

import os

import cv2
import numpy as np
import pytest

from camliflow_tpu.data.datasets import Sintel, depth_read_dpt, depth2pc
from camliflow_tpu.data.io import save_flow
from camliflow_tpu.utils.config import Config


def write_dpt(path, depth):
    with open(path, "wb") as f:
        np.float32(202021.25).tofile(f)
        np.int32(depth.shape[1]).tofile(f)
        np.int32(depth.shape[0]).tofile(f)
        depth.astype(np.float32).tofile(f)


@pytest.fixture(scope="module")
def sintel_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sintel")
    rng = np.random.RandomState(0)
    h, w = 48, 64
    # one train scene, one val scene, 3 frames each (2 flows)
    for scene in ("alley_1", "alley_2"):
        img_dir = root / "flow" / "training" / "final" / scene
        depth_dir = root / "depth" / "training" / "depth" / scene
        flow_dir = root / "flow" / "training" / "flow" / scene
        for d in (img_dir, depth_dir, flow_dir):
            d.mkdir(parents=True, exist_ok=True)
        for i in range(3):
            cv2.imwrite(
                str(img_dir / f"frame_{i:04d}.png"),
                rng.randint(0, 255, (h, w, 3), np.uint8),
            )
            write_dpt(
                depth_dir / f"frame_{i:04d}.dpt",
                rng.rand(h, w).astype(np.float32) * 20 + 2,
            )
            if i < 2:
                save_flow(
                    flow_dir / f"frame_{i:04d}.flo",
                    rng.randn(h, w, 2).astype(np.float32),
                )
    return root


def test_dpt_reader_roundtrip(tmp_path, rng):
    depth = rng.rand(6, 9).astype(np.float32) * 10
    write_dpt(tmp_path / "d.dpt", depth)
    loaded = depth_read_dpt(tmp_path / "d.dpt")
    np.testing.assert_array_equal(loaded, depth)


def test_depth2pc_geometry():
    depth = np.full((4, 6), 8.0, np.float32)
    pc = depth2pc(depth, f=100.0, cx=2.5, cy=1.5)
    assert pc.shape == (4, 6, 3)
    np.testing.assert_allclose(pc[..., 2], 8.0)
    # principal point maps to x=y=0 at the (cy, cx) pixel
    np.testing.assert_allclose(pc[1, 2, 0], (2 - 2.5) * 8.0 / 100.0, rtol=1e-5)


def make_cfgs(root, split):
    return Config(
        {
            "name": "sintel",
            "root_dir": str(root),
            "split": split,
            "pass_name": "final",
            "n_points": 128,
            "max_depth": 30.0,
            "n_workers": 0,
            "augmentation": {"enabled": False},
        }
    )


def test_sintel_splits(sintel_root):
    train = Sintel(make_cfgs(sintel_root, "train"))
    val = Sintel(make_cfgs(sintel_root, "val"))
    trainval = Sintel(make_cfgs(sintel_root, "trainval"))
    assert len(train) == 2 and len(val) == 2 and len(trainval) == 4
    assert train.samples[0]["scene_name"] == "alley_1"
    assert val.samples[0]["scene_name"] == "alley_2"


def test_sintel_sample_shapes(sintel_root):
    ds = Sintel(make_cfgs(sintel_root, "trainval"))
    sample = ds[0]
    assert sample["images"].shape == (48, 64, 6)
    assert sample["flow_2d"].shape == (48, 64, 2)
    assert sample["pcs"].shape == (128, 6)
    # flow_3d is zeros (2D-eval-only dataset, sintel.py:134)
    np.testing.assert_array_equal(sample["flow_3d"], 0)
    assert sample["intrinsics"].tolist() == [1500.0, 511.5, 217.5]
    assert "scene_name" in sample and "sample_name" in sample
    # depth offset: min depth shifted to 5 (sintel.py:126-128)
    assert sample["pcs"][:, 2].min() >= 5.0 - 1e-3
