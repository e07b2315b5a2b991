"""Round-trip and format tests for the file codecs (reference utils.py:182-360)."""

import numpy as np
import pytest

from camliflow_tpu.data import io


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.randn(8, 12, 2).astype(np.float32)
    path = tmp_path / "test.flo"
    io.save_flow(path, flow)
    loaded = io.load_flow(path)
    np.testing.assert_array_equal(loaded, flow)


def test_flow_png_roundtrip(tmp_path, rng):
    flow = (rng.rand(10, 14, 2).astype(np.float32) - 0.5) * 100
    mask = rng.rand(10, 14) > 0.3
    path = str(tmp_path / "flow.png")
    io.save_flow_png(path, flow, mask)
    loaded, loaded_mask = io.load_flow_png(path)
    np.testing.assert_array_equal(loaded_mask, mask)
    np.testing.assert_allclose(loaded, flow, atol=1.0 / 64.0)


def test_disp_png_roundtrip(tmp_path, rng):
    disp = rng.rand(6, 8).astype(np.float32) * 100 + 1
    path = str(tmp_path / "disp.png")
    io.save_disp_png(path, disp)
    loaded, valid = io.load_disp_png(path)
    assert valid.all()
    np.testing.assert_allclose(loaded, disp, atol=1.0 / 256.0)


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.randn(7, 9).astype(np.float32)
    path = tmp_path / "test.pfm"
    io.save_pfm(path, img)
    loaded = io.load_pfm(path)
    np.testing.assert_array_equal(loaded, img)
    # color variant
    img3 = rng.randn(5, 6, 3).astype(np.float32)
    io.save_pfm(path, img3)
    np.testing.assert_array_equal(io.load_pfm(path), img3)


def test_zero_padding(rng):
    x = rng.randn(4, 6, 3).astype(np.float32)
    out = io.zero_padding(x, 8, 10)
    assert out.shape == (8, 10, 3)
    np.testing.assert_array_equal(out[:4, :6], x)
    assert (out[4:] == 0).all() and (out[:, 6:] == 0).all()


def test_disp2pc_geometry():
    disp = np.full((4, 6), 10.0, np.float32)
    baseline, f, cx, cy = 0.54, 100.0, 3.0, 2.0
    pc = io.disp2pc(disp, baseline, f, cx, cy)
    assert pc.shape == (4, 6, 3)
    depth = baseline * f / (10.0 + 1e-5)
    np.testing.assert_allclose(pc[..., 2], depth, rtol=1e-5)
    # pixel (cx, cy) maps to x=y=0
    np.testing.assert_allclose(pc[2, 3, :2], [0, 0], atol=1e-4)


def test_calib_parser(tmp_path):
    path = tmp_path / "calib.txt"
    p = np.zeros((3, 4), np.float32)
    p[0, 0] = p[1, 1] = 721.5
    p[0, 2], p[1, 2], p[2, 2] = 609.5, 172.8, 1.0
    path.write_text("P_rect_02: " + " ".join(str(v) for v in p.reshape(-1)) + "\n")
    loaded = io.load_calib(path)
    np.testing.assert_allclose(loaded, p)
