"""Dataset-class tests against a synthetic on-disk FT3D-format dataset."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from camliflow_tpu.data.datasets import FlyingThings3D
from camliflow_tpu.utils.config import Config

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ft3d")
    subprocess.check_call(
        [sys.executable, str(REPO / "tools/make_synthetic_dataset.py"),
         "--out", str(root), "--n", "4", "--n_points", "256"]
    )
    return root


def base_cfgs(root, augment=False):
    return Config(
        {
            "name": "flyingthings3d",
            "root_dir": str(root),
            "split": "train",
            "n_points": 128,
            "pass_name": "clean",
            "with_pc": True,
            "with_image": True,
            "augmentation": {
                "enabled": augment,
                "color_jitter": {"enabled": False},
                "random_horizontal_flip": {"enabled": augment},
                "random_vertical_flip": {"enabled": False},
                "random_crop": {"enabled": False},
                "random_scale": {"enabled": False},
            },
        }
    )


def test_shapes_and_keys(synth_root):
    ds = FlyingThings3D(base_cfgs(synth_root))
    assert len(ds) == 4
    sample = ds[0]
    assert sample["images"].shape == (128, 192, 6)
    assert sample["flow_2d"].shape == (128, 192, 3)
    assert sample["pcs"].shape == (128, 6)
    assert sample["flow_3d"].shape == (128, 3)
    assert sample["occ_mask_3d"].shape == (128,)
    assert sample["intrinsics"].tolist() == [1050.0, 479.5, 269.5]


def test_deterministic_without_augmentation(synth_root):
    ds = FlyingThings3D(base_cfgs(synth_root, augment=False))
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["pcs"], b["pcs"])
    np.testing.assert_array_equal(a["images"], b["images"])


def test_with_pc_only(synth_root):
    cfgs = base_cfgs(synth_root)
    cfgs.with_image = False
    sample = FlyingThings3D(cfgs)[0]
    assert "images" not in sample and "pcs" in sample


def test_augmented_sampling_resamples(synth_root):
    ds = FlyingThings3D(base_cfgs(synth_root, augment=True))
    a, b = ds[0], ds[0]
    # with augmentation enabled, random flip/sampling changes outputs
    assert not np.array_equal(a["pcs"], b["pcs"]) or not np.array_equal(
        a["images"], b["images"]
    )
