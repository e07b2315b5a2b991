"""Tests for inverse-depth-scaling transforms (reference models/ids.py)."""

import numpy as np
import jax.numpy as jnp

from camliflow_tpu import ops


def make_cams(batch=2):
    persp = {
        "projection_mode": "perspective",
        "sensor_h": 540,
        "sensor_w": 960,
        "f": np.full((batch,), 1050.0, np.float32),
        "cx": np.full((batch,), 479.5, np.float32),
        "cy": np.full((batch,), 269.5, np.float32),
    }
    paral = ops.make_parallel_camera_info(540, 960)
    return persp, paral


def test_persp2paral_roundtrip(rng):
    persp, paral = make_cams()
    xyz = rng.randn(2, 100, 3).astype(np.float32)
    xyz[..., 2] = np.abs(xyz[..., 2]) * 20 + 1.0  # positive depth
    fwd = ops.persp2paral(jnp.asarray(xyz), persp, paral)
    back = ops.paral2persp(fwd, persp, paral)
    np.testing.assert_allclose(np.asarray(back), xyz, rtol=1e-3, atol=1e-3)


def test_make_parallel_camera_info():
    paral = ops.make_parallel_camera_info(544, 960)
    assert paral["sensor_h"] == 17 and paral["sensor_w"] == 30
    assert paral["cx"] == 14.5 and paral["cy"] == 8.0


def test_persp2paral_formula(rng):
    """Check against a direct NumPy transcription of ids.py:4-33."""
    persp, paral = make_cams(1)
    xyz = rng.randn(1, 50, 3).astype(np.float32)
    xyz[..., 2] = np.abs(xyz[..., 2]) * 10 + 2.0
    got = np.asarray(ops.persp2paral(jnp.asarray(xyz), persp, paral))

    f, cx, cy = 1050.0, 479.5, 269.5
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    dst_x = cx + (f / z) * x
    dst_y = cy + (f / z) * y
    dst_z = f * np.log(z) + 1
    sw = (paral["sensor_w"] - 1) / (960 - 1)
    sh = (paral["sensor_h"] - 1) / (540 - 1)
    want = np.stack(
        [
            dst_x * sw - (paral["sensor_w"] - 1) / 2,
            dst_y * sh - (paral["sensor_h"] - 1) / 2,
            dst_z * min(sw, sh),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_project_pc2image_perspective(rng):
    persp, paral = make_cams(1)
    xyz = rng.randn(1, 20, 3).astype(np.float32)
    xyz[..., 2] = np.abs(xyz[..., 2]) + 1.0
    uv = np.asarray(ops.project_pc2image(jnp.asarray(xyz), persp))
    want_x = 479.5 + 1050.0 / xyz[..., 2] * xyz[..., 0]
    want_y = 269.5 + 1050.0 / xyz[..., 2] * xyz[..., 1]
    np.testing.assert_allclose(uv[..., 0], want_x, rtol=1e-4)
    np.testing.assert_allclose(uv[..., 1], want_y, rtol=1e-4)


def test_project_pc2image_parallel(rng):
    _, paral = make_cams(1)
    xyz = rng.randn(1, 20, 3).astype(np.float32)
    uv = np.asarray(ops.project_pc2image(jnp.asarray(xyz), paral))
    np.testing.assert_allclose(uv[..., 0], xyz[..., 0] + paral["cx"], rtol=1e-5)
    np.testing.assert_allclose(uv[..., 1], xyz[..., 1] + paral["cy"], rtol=1e-5)
