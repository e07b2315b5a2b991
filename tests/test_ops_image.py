"""Golden tests for 2D image ops against torch (grid_sample / unfold /
interpolate parity) and NumPy references."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from camliflow_tpu import ops  # noqa: E402


def torch_grid_sample_pixel(img_nchw, coords_xy, padding_mode):
    """Sample torch-style at pixel coords (normalising like the reference)."""
    _, _, h, w = img_nchw.shape
    gx = 2.0 * coords_xy[..., 0] / (w - 1) - 1.0
    gy = 2.0 * coords_xy[..., 1] / (h - 1) - 1.0
    grid = torch.stack([gx, gy], dim=-1)
    return F.grid_sample(
        img_nchw, grid, mode="bilinear", padding_mode=padding_mode, align_corners=True
    )


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_pixel_matches_torch(rng, padding_mode):
    img = rng.randn(2, 9, 13, 4).astype(np.float32)
    # coords spanning in-bounds and far out-of-bounds
    coords = rng.uniform(-4, 16, size=(2, 50, 2)).astype(np.float32)
    got = np.asarray(
        ops.grid_sample_pixel(jnp.asarray(img), jnp.asarray(coords), padding_mode)
    )
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    tc = torch.from_numpy(coords).reshape(2, 50, 1, 2)
    want = (
        torch_grid_sample_pixel(timg, tc, padding_mode)[..., 0]
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_backwarp_2d_matches_torch(rng):
    x = rng.randn(2, 8, 12, 3).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(2, 8, 12, 2)).astype(np.float32)
    for pm in ["zeros", "border"]:
        got = np.asarray(ops.backwarp_2d(jnp.asarray(x), jnp.asarray(flow), pm))
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tflow = torch.from_numpy(flow.transpose(0, 3, 1, 2))
        gy, gx = torch.meshgrid(torch.arange(8.0), torch.arange(12.0), indexing="ij")
        grid = torch.stack([gx, gy])[None] + tflow
        coords = grid.permute(0, 2, 3, 1)
        want = (
            torch_grid_sample_pixel(tx, coords, pm).permute(0, 2, 3, 1).numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def torch_convex_upsample(flow_nchw, mask, scale_factor):
    """Reference implementation: models/utils.py:191-204."""
    batch_size, _, image_h, image_w = flow_nchw.shape
    mask = mask.view(batch_size, 1, 9, scale_factor, scale_factor, image_h, image_w)
    mask = torch.softmax(mask.float(), dim=2)
    up_flow = F.unfold(flow_nchw.float() * scale_factor, [3, 3], padding=1)
    up_flow = up_flow.view(batch_size, 2, 9, 1, 1, image_h, image_w)
    up_flow = torch.sum(mask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    return up_flow.reshape(
        batch_size, 2, image_h * scale_factor, image_w * scale_factor
    )


@pytest.mark.parametrize("scale", [4, 8])
def test_convex_upsample_matches_torch(rng, scale):
    flow = rng.randn(2, 5, 7, 2).astype(np.float32)
    mask = rng.randn(2, 5, 7, 9 * scale * scale).astype(np.float32)
    got = np.asarray(
        ops.convex_upsample(jnp.asarray(flow), jnp.asarray(mask), scale)
    )
    want = (
        torch_convex_upsample(
            torch.from_numpy(flow.transpose(0, 3, 1, 2)),
            torch.from_numpy(mask.transpose(0, 3, 1, 2)),
            scale,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_flow2d_matches_torch(rng):
    flow = rng.randn(2, 8, 10, 2).astype(np.float32)
    got = np.asarray(ops.resize_flow2d(jnp.asarray(flow), 16, 30))
    tflow = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    want = F.interpolate(tflow, size=(16, 30), mode="bilinear", align_corners=True)
    want[:, 0] *= 30 / 10
    want[:, 1] *= 16 / 8
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)


def test_resize_bilinear_matches_torch(rng):
    img = rng.randn(1, 6, 9, 3).astype(np.float32)
    got = np.asarray(ops.resize_bilinear_align_corners(jnp.asarray(img), 12, 18))
    want = (
        F.interpolate(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            size=(12, 18),
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_input_padder_matches_torch(rng):
    img = rng.randn(2, 13, 21, 3).astype(np.float32)
    padder = ops.InputPadder(img.shape, x=8)
    (padded,) = padder.pad(jnp.asarray(img))
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    # torch reference: pad [wd//2, wd-wd//2, 0, ht] with replicate
    ht, wd = 13, 21
    pad_ht = (((ht // 8) + 1) * 8 - ht) % 8
    pad_wd = (((wd // 8) + 1) * 8 - wd) % 8
    want = F.pad(
        torch.from_numpy(img.transpose(0, 3, 1, 2)),
        [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht],
        mode="replicate",
    )
    np.testing.assert_array_equal(
        np.asarray(padded), want.permute(0, 2, 3, 1).numpy()
    )
    # unpad inverts
    unpadded = padder.unpad(padded)
    np.testing.assert_array_equal(np.asarray(unpadded), img)


def test_mesh_grid():
    g = np.asarray(ops.mesh_grid(1, 3, 4))
    assert g.shape == (1, 3, 4, 2)
    np.testing.assert_array_equal(g[0, :, :, 0], np.tile(np.arange(4.0), (3, 1)))
    np.testing.assert_array_equal(g[0, :, :, 1], np.tile(np.arange(3.0)[:, None], (1, 4)))
