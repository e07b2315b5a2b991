"""Tests for the joint augmentation pipeline (reference augmentation.py)."""

import numpy as np
import pytest

from camliflow_tpu.data import augmentation as aug
from camliflow_tpu.utils.config import Config


def make_sample(rng, h=32, w=48, n=64):
    image1 = rng.randint(0, 255, (h, w, 3), np.uint8)
    image2 = rng.randint(0, 255, (h, w, 3), np.uint8)
    pc1 = rng.randn(n, 3).astype(np.float32)
    pc1[:, 2] = np.abs(pc1[:, 2]) * 5 + 2
    pc2 = pc1 + rng.randn(n, 3).astype(np.float32) * 0.05
    flow_2d = rng.randn(h, w, 3).astype(np.float32)
    flow_2d[..., 2] = 1.0
    flow_3d = (pc2 - pc1).astype(np.float32)
    f, cx, cy = 40.0, (w - 1) / 2, (h - 1) / 2
    return image1, image2, pc1, pc2, flow_2d, flow_3d, f, cx, cy


def test_flip_point_cloud_mirrors_projection(rng):
    """Flipped points project to mirrored pixels (augmentation.py:20-36)."""
    _, _, pc1, _, _, _, f, cx, cy = make_sample(rng)
    h, w = 32, 48
    flipped = aug.flip_point_cloud(pc1, h, w, f, cx, cy, "lr")
    x_orig = cx + f / pc1[:, 2] * pc1[:, 0]
    x_flip = cx + f / flipped[:, 2] * flipped[:, 0]
    np.testing.assert_allclose(x_flip, w - 1 - x_orig, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(flipped[:, 2], pc1[:, 2])  # depth unchanged


def test_flip_scene_flow_endpoint_transform(rng):
    """Scene flow transforms as warped-endpoint difference (aug.py:39-42)."""
    _, _, pc1, pc2, _, flow_3d, f, cx, cy = make_sample(rng)
    h, w = 32, 48
    new_flow = aug.flip_scene_flow(pc1, flow_3d, h, w, f, cx, cy, "ud")
    new_pc1 = aug.flip_point_cloud(pc1, h, w, f, cx, cy, "ud")
    new_warp = aug.flip_point_cloud(pc1 + flow_3d, h, w, f, cx, cy, "ud")
    np.testing.assert_allclose(new_flow, new_warp - new_pc1, rtol=1e-4, atol=1e-5)


def test_flip_optical_flow_negates_component(rng):
    flow = rng.randn(8, 10, 3).astype(np.float32)
    lr = aug.flip_optical_flow(flow.copy(), "lr")
    np.testing.assert_allclose(lr[:, ::-1, 0], -flow[..., 0])
    np.testing.assert_allclose(lr[:, ::-1, 1], flow[..., 1])
    ud = aug.flip_optical_flow(flow.copy(), "ud")
    np.testing.assert_allclose(ud[::-1, :, 1], -flow[..., 1])


def test_crop_adjusts_intrinsics_and_drops_points(rng):
    image1, image2, pc1, pc2, flow_2d, flow_3d, f, cx, cy = make_sample(rng)
    out = aug.crop_image_with_pc(
        image1, image2, pc1, pc2, flow_2d, flow_3d, f, cx, cy,
        crop_window=[8, 4, 40, 28], drop_pc=True,
    )
    i1, i2, p1, p2, f2d, f3d, f_out, cx_out, cy_out = out
    assert i1.shape == (24, 32, 3) and f2d.shape == (24, 32, 3)
    assert cx_out == cx - 8 and cy_out == cy - 4 and f_out == f
    # remaining points project inside the window (in the ORIGINAL frame)
    x = cx + f / p1[:, 2] * p1[:, 0]
    y = cy + f / p1[:, 2] * p1[:, 1]
    assert ((x > 8) & (x < 40) & (y > 4) & (y < 28)).all()
    assert p1.shape[0] == f3d.shape[0]


def test_resize_sparse_flow_map_scatters(rng):
    flow = np.zeros((8, 10, 3), np.float32)
    flow[2, 3] = [1.0, -2.0, 1.0]
    out = aug.resize_sparse_flow_map(flow, target_w=19, target_h=15)
    assert out.shape == (15, 19, 3)
    # one valid pixel scattered at the scaled location with scaled magnitude
    ys, xs = np.nonzero(out[..., 2])
    assert len(ys) == 1
    sw, sh = 18 / 9, 14 / 7
    assert xs[0] == round(3 * sw) and ys[0] == round(2 * sh)
    np.testing.assert_allclose(out[ys[0], xs[0], :2], [1.0 * sw, -2.0 * sh], rtol=1e-5)


def test_color_jitter_joint_and_bounded(rng):
    image1, image2, *_ = make_sample(rng)
    j1, j2 = aug.color_jitter(
        image1, image2, 0.3, 0.3, 0.3, 0.1, rng=np.random.RandomState(0)
    )
    assert j1.dtype == np.uint8 and j1.shape == image1.shape
    # same transform on both frames: equal inputs -> equal outputs
    k1, k2 = aug.color_jitter(
        image1, image1.copy(), 0.3, 0.3, 0.3, 0.1, rng=np.random.RandomState(1)
    )
    np.testing.assert_array_equal(k1, k2)


def test_full_pipeline_smoke(rng):
    image1, image2, pc1, pc2, flow_2d, flow_3d, f, cx, cy = make_sample(rng)
    cfgs = Config(
        {
            "enabled": True,
            "color_jitter": {"enabled": True, "brightness": 0.3, "contrast": 0.3,
                             "saturation": 0.3, "hue": 0.1},
            "random_horizontal_flip": {"enabled": True},
            "random_vertical_flip": {"enabled": True},
            "random_crop": {"enabled": True, "crop_size": [32, 24], "drop_pc": False},
            "random_scale": {"enabled": True, "scale_range": [1.0, 1.3]},
        }
    )
    out = aug.joint_augmentation(
        image1, image2, pc1, pc2, flow_2d, flow_3d, f, cx, cy, cfgs,
        rng=np.random.RandomState(3),
    )
    i1, i2, p1, p2, f2d, f3d, f_o, cx_o, cy_o = out
    assert i1.shape[2] == 3 and f2d.shape[2] == 3
    assert np.isfinite(p1).all() and np.isfinite(f3d).all()
