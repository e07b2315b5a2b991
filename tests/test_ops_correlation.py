"""Golden tests for correlation ops against torch re-implementations of the
reference semantics (wrapper.py:41-50 fallback, raft_core.py:52-107)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from camliflow_tpu import ops  # noqa: E402


def torch_correlation2d(input1, input2, max_displacement):
    """PyTorch fallback (wrapper.py:41-50), channel-first."""
    height, width = input1.shape[2:]
    input2 = F.pad(input2, [max_displacement] * 4)
    cost_volumes = []
    for i in range(2 * max_displacement + 1):
        for j in range(2 * max_displacement + 1):
            cost = input1 * input2[:, :, i : (i + height), j : (j + width)]
            cost_volumes.append(torch.mean(cost, 1, keepdim=True))
    return torch.cat(cost_volumes, 1)


@pytest.mark.parametrize("d", [1, 4])
def test_correlation2d_matches_torch(rng, d):
    f1 = rng.randn(2, 10, 14, 8).astype(np.float32)
    f2 = rng.randn(2, 10, 14, 8).astype(np.float32)
    got = np.asarray(ops.correlation2d(jnp.asarray(f1), jnp.asarray(f2), d))
    want = (
        torch_correlation2d(
            torch.from_numpy(f1.transpose(0, 3, 1, 2)),
            torch.from_numpy(f2.transpose(0, 3, 1, 2)),
            d,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert got.shape == want.shape == (2, 10, 14, (2 * d + 1) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def torch_corr_pyramid_and_lookup(fmap1, fmap2, coords, num_levels=4, radius=4):
    """Reference RAFT lookup (raft_core.py:52-107), channel-first inputs."""
    bs, dim, h, w = fmap1.shape
    f1 = fmap1.view(bs, dim, h * w)
    f2 = fmap2.view(bs, dim, h * w)
    cost = torch.matmul(f1.transpose(1, 2), f2) / torch.sqrt(torch.tensor(float(dim)))
    cost = cost.reshape(bs * h * w, 1, h, w)
    pyramid = [cost]
    for _ in range(num_levels - 1):
        cost = F.avg_pool2d(cost, 2, stride=2)
        pyramid.append(cost)

    coords = coords.permute(0, 2, 3, 1)  # [bs, h, w, 2]
    r = radius
    out_pyramid = []
    for i in range(num_levels):
        corr = pyramid[i]
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(bs * h * w, 1, 1, 2) / 2**i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        hh, ww = corr.shape[-2:]
        xgrid, ygrid = coords_lvl.split([1, 1], dim=-1)
        xgrid = 2 * xgrid / (ww - 1) - 1
        ygrid = 2 * ygrid / (hh - 1) - 1
        grid = torch.cat([xgrid, ygrid], dim=-1)
        # NOTE reference meshgrid(dy, dx) gives delta[...,0]=dy delta[...,1]=dx,
        # but split takes [...,0] as xgrid. This quirk IS the reference
        # behaviour (raft_core.py:79-85,100-104): the window offsets enter as
        # (dy->x, dx->y), which is symmetric since dx==dy ranges. Replicated
        # faithfully here.
        sampled = F.grid_sample(corr, grid, align_corners=True)
        out_pyramid.append(sampled.view(bs, h, w, -1))
    out = torch.cat(out_pyramid, dim=-1)
    return out.permute(0, 3, 1, 2).contiguous()


def test_all_pairs_pyramid_shapes(rng):
    f1 = rng.randn(2, 8, 12, 16).astype(np.float32)
    f2 = rng.randn(2, 8, 12, 16).astype(np.float32)
    pyr = ops.all_pairs_correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 4)
    assert len(pyr) == 4
    assert pyr[0].shape == (2 * 8 * 12, 8, 12, 1)
    assert pyr[1].shape == (2 * 8 * 12, 4, 6, 1)
    assert pyr[3].shape == (2 * 8 * 12, 1, 1, 1)


def test_corr_lookup_matches_torch(rng):
    f1 = rng.randn(1, 8, 8, 16).astype(np.float32)
    f2 = rng.randn(1, 8, 8, 16).astype(np.float32)
    flow = rng.uniform(-2, 2, size=(1, 8, 8, 2)).astype(np.float32)
    grid = np.asarray(ops.mesh_grid(1, 8, 8))
    coords = grid + flow

    pyr = ops.all_pairs_correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3)
    got = np.asarray(ops.corr_lookup_2d(pyr, jnp.asarray(coords), radius=2))

    tcoords = torch.from_numpy(coords.transpose(0, 3, 1, 2))
    want = (
        torch_corr_pyramid_and_lookup(
            torch.from_numpy(f1.transpose(0, 3, 1, 2)),
            torch.from_numpy(f2.transpose(0, 3, 1, 2)),
            tcoords,
            num_levels=3,
            radius=2,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert got.shape == want.shape == (1, 8, 8, 3 * 25)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "storage,rel_bound",
    [
        # bf16 hi-only volume: ~2^-9 relative on corr values
        ("bf16", 2.0**-8),
        # int8 per-row symmetric quantisation: error <= row_max/254 per tap,
        # and the bilinear blend is convex, so <= global_max/254 (the bf16
        # one-hot selection of int8 values is exact)
        ("int8", 1.0 / 254 + 1e-6),
    ],
)
def test_corr_lookup_fast_path_close_to_exact(rng, storage, rel_bound):
    f1 = rng.randn(1, 8, 8, 16).astype(np.float32)
    f2 = rng.randn(1, 8, 8, 16).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(1, 8, 8, 2)).astype(np.float32)
    coords = np.asarray(ops.mesh_grid(1, 8, 8)) + flow

    pyr = ops.all_pairs_correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3)
    exact = np.asarray(ops.corr_lookup_2d(pyr, jnp.asarray(coords), radius=2))
    fast = np.asarray(
        ops.corr_lookup_2d(pyr, jnp.asarray(coords), radius=2, storage=storage)
    )
    scale = np.abs(exact).max()
    np.testing.assert_allclose(fast, exact, atol=scale * rel_bound)


@pytest.mark.parametrize("storage", ["bf16", "int8"])
@pytest.mark.parametrize("hw", [(8, 12), (9, 13)])  # odd dims: floor-crop pool
def test_padded_pyramid_from_features_matches_two_step(rng, storage, hw):
    """The fused table build (one einsum per level against padded pooled
    frame-2 features) == build + pool + pad + quantise, up to f32 summation
    order: dequantised values agree within one int8 quantisation step, pad
    regions are exact zeros, and per-row scales match to f32 rounding. The
    odd-dims case pins the floor-crop pooling semantics (odd trailing
    rows/cols dropped, matching reference avg_pool2d / raft_core.py:62-68)."""
    from camliflow_tpu.ops.correlation import (
        pad_pyramid_for_lookup,
        padded_pyramid_from_features,
    )

    h, w = hw
    f1 = rng.randn(2, h, w, 16).astype(np.float32)
    f2 = rng.randn(2, h, w, 16).astype(np.float32)
    want = pad_pyramid_for_lookup(
        ops.all_pairs_correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3),
        radius=2,
        storage=storage,
    )
    got = padded_pyramid_from_features(
        jnp.asarray(f1), jnp.asarray(f2), num_levels=3, radius=2,
        storage=storage,
    )
    assert len(got) == len(want) == 3
    from camliflow_tpu.ops.correlation import _lookup_pad

    pad = _lookup_pad(2)
    for level, (g, w) in enumerate(zip(got, want)):
        if storage == "int8":
            (gq, gs), (wq, ws) = g, w
            assert gq.shape == wq.shape and gq.dtype == jnp.int8
            np.testing.assert_allclose(
                np.asarray(gs), np.asarray(ws), rtol=1e-5
            )
            gv = np.asarray(gq, np.float32) * np.asarray(gs)[:, None, None]
            wv = np.asarray(wq, np.float32) * np.asarray(ws)[:, None, None]
            # one quantisation step: f32 rounding can flip an LSB at ties
            step = np.asarray(ws)[:, None, None] + 1e-12
            assert np.max(np.abs(gv - wv) / step) <= 1.0 + 1e-3
            padded_vals = np.asarray(gq)
        else:
            assert g.shape == w.shape and g.dtype == jnp.bfloat16
            gv = np.asarray(g, np.float32)
            wv = np.asarray(w, np.float32)
            scale = np.abs(wv).max()
            np.testing.assert_allclose(gv, wv, atol=scale * 2.0**-8)
            padded_vals = gv
        # pad margin (when any) must be exactly zero (zero feature columns
        # dot to 0); since round 4 _lookup_pad() is 0 — out-of-range taps
        # zero out via empty one-hot rows instead of stored pad entries
        if pad:
            assert np.all(padded_vals[:, :pad, :] == 0)
            assert np.all(padded_vals[:, -pad:, :] == 0)
            assert np.all(padded_vals[:, :, :pad] == 0)
            assert np.all(padded_vals[:, :, -pad:] == 0)


def test_padded_pyramid_from_features_split_is_exact(rng):
    """storage='split' composes the exact two-step path bit-identically."""
    from camliflow_tpu.ops.correlation import (
        pad_pyramid_for_lookup,
        padded_pyramid_from_features,
    )

    f1 = rng.randn(1, 8, 12, 16).astype(np.float32)
    f2 = rng.randn(1, 8, 12, 16).astype(np.float32)
    want = pad_pyramid_for_lookup(
        ops.all_pairs_correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3),
        radius=2,
        storage="split",
    )
    got = padded_pyramid_from_features(
        jnp.asarray(f1), jnp.asarray(f2), num_levels=3, radius=2,
        storage="split",
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_corr_lookup_gradient_parity(rng):
    """jax.grad through the split-storage lookup vs torch autograd through the
    reference pyramid+lookup (the bf16 hi/lo einsums quantise cotangents to
    ~2^-9 — this pins that the training-path gradients stay within that
    envelope end to end)."""
    import jax

    f1 = rng.randn(1, 8, 8, 16).astype(np.float32)
    f2 = rng.randn(1, 8, 8, 16).astype(np.float32)
    flow = rng.uniform(-2, 2, size=(1, 8, 8, 2)).astype(np.float32)
    coords = np.asarray(ops.mesh_grid(1, 8, 8)) + flow
    w = rng.randn(1, 8, 8, 3 * 25).astype(np.float32)

    def jax_loss(f1j, f2j):
        pyr = ops.all_pairs_correlation_pyramid(f1j, f2j, 3)
        out = ops.corr_lookup_2d(pyr, jnp.asarray(coords), radius=2)
        return jnp.sum(out * jnp.asarray(w))

    g1, g2 = jax.grad(jax_loss, argnums=(0, 1))(jnp.asarray(f1), jnp.asarray(f2))

    f1t = torch.from_numpy(f1.transpose(0, 3, 1, 2)).requires_grad_(True)
    f2t = torch.from_numpy(f2.transpose(0, 3, 1, 2)).requires_grad_(True)
    tcoords = torch.from_numpy(coords.transpose(0, 3, 1, 2))
    out = torch_corr_pyramid_and_lookup(f1t, f2t, tcoords, num_levels=3, radius=2)
    (out * torch.from_numpy(w.transpose(0, 3, 1, 2))).sum().backward()

    for got, ref in ((g1, f1t.grad), (g2, f2t.grad)):
        ref = ref.numpy().transpose(0, 2, 3, 1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.asarray(got), ref, atol=scale * 2.0**-7)


@pytest.mark.parametrize("storage", ["bf16", "int8"])
def test_corr_lookup_hmajor_bit_identical(rng, storage, monkeypatch):
    """CAMLIFLOW_LOOKUP_HMAJOR=1: h-major storage + flipped contraction order
    selects exactly the same stored values (one-hot selections are exact in
    any stage order), so the lookup output is BIT-identical to the w-major
    fast path of the same storage mode."""
    from camliflow_tpu.ops.correlation import (
        corr_lookup_2d_padded,
        pad_pyramid_for_lookup,
        padded_pyramid_from_features,
    )

    f1 = rng.randn(1, 8, 12, 16).astype(np.float32)
    f2 = rng.randn(1, 8, 12, 16).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(1, 8, 12, 2)).astype(np.float32)
    coords = np.asarray(ops.mesh_grid(1, 8, 12)) + flow

    pyr = ops.all_pairs_correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3)
    # pin the legacy layout explicitly for the baseline leg (h-major is the
    # default since 2026-08-20, so the ambient default would otherwise make
    # this compare h-major to itself)
    monkeypatch.setenv("CAMLIFLOW_LOOKUP_HMAJOR", "0")
    want = np.asarray(
        corr_lookup_2d_padded.__wrapped__(
            pad_pyramid_for_lookup(pyr, 2, storage=storage),
            jnp.asarray(coords), 2, storage=storage,
        )
    )

    monkeypatch.setenv("CAMLIFLOW_LOOKUP_HMAJOR", "1")
    hm_pyr = pad_pyramid_for_lookup(pyr, 2, storage=storage)
    # storage really is h-major: level shapes transpose of the w-major ones
    lvl0 = hm_pyr[0][0] if storage == "int8" else hm_pyr[0]
    assert lvl0.shape[1:] == (8, 12)  # [rows, h, w]
    got = np.asarray(
        corr_lookup_2d_padded.__wrapped__(
            hm_pyr, jnp.asarray(coords), 2, storage=storage
        )
    )
    np.testing.assert_array_equal(got, want)

    # the fused feature-side builder agrees with the two-step build in
    # h-major orientation too (same tolerance contract as the w-major test)
    fused = padded_pyramid_from_features(
        jnp.asarray(f1), jnp.asarray(f2), num_levels=3, radius=2,
        storage=storage,
    )
    for g, w in zip(fused, hm_pyr):
        if storage == "int8":
            (gq, gs), (wq, ws) = g, w
            assert gq.shape == wq.shape
            np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                                       rtol=1e-5)
            gv = np.asarray(gq, np.float32) * np.asarray(gs)[:, None, None]
            wv = np.asarray(wq, np.float32) * np.asarray(ws)[:, None, None]
            step = np.asarray(ws)[:, None, None] + 1e-12
            assert np.max(np.abs(gv - wv) / step) <= 1.0 + 1e-3
        else:
            assert g.shape == w.shape
            gv, wv = np.asarray(g, np.float32), np.asarray(w, np.float32)
            np.testing.assert_allclose(
                gv, wv, atol=np.abs(wv).max() * 2.0**-8
            )


@pytest.mark.parametrize("storage", ["bf16", "int8"])
@pytest.mark.parametrize("hmajor", ["0", "1"])
def test_corr_lookup_mmblend_bit_identical(rng, storage, hmajor, monkeypatch):
    """CAMLIFLOW_LOOKUP_MMBLEND=1: the constant 0/1 corner-selection matmul
    blend produces BIT-identical output to the strided-slice blend — corner
    selection of a bf16 value is exact in the f32 accumulator, and the
    weighted 4-term sum multiplies/associates in the slice blend's order."""
    from camliflow_tpu.ops.correlation import (
        corr_lookup_2d_padded,
        pad_pyramid_for_lookup,
    )

    f1 = rng.randn(1, 8, 12, 16).astype(np.float32)
    f2 = rng.randn(1, 8, 12, 16).astype(np.float32)
    flow = rng.uniform(-6, 6, size=(1, 8, 12, 2)).astype(np.float32)
    coords = np.asarray(ops.mesh_grid(1, 8, 12)) + flow

    monkeypatch.setenv("CAMLIFLOW_LOOKUP_HMAJOR", hmajor)
    pyr = ops.all_pairs_correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3)
    padded = pad_pyramid_for_lookup(pyr, 2, storage=storage)

    monkeypatch.setenv("CAMLIFLOW_LOOKUP_MMBLEND", "0")
    want = np.asarray(
        corr_lookup_2d_padded.__wrapped__(
            padded, jnp.asarray(coords), 2, storage=storage
        )
    )
    monkeypatch.setenv("CAMLIFLOW_LOOKUP_MMBLEND", "1")
    got = np.asarray(
        corr_lookup_2d_padded.__wrapped__(
            padded, jnp.asarray(coords), 2, storage=storage
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("storage", ["bf16", "int8"])
def test_corr_lookup_fold_hmajor_close_to_exact(rng, storage, monkeypatch):
    """FOLD + HMAJOR compose: the two-tap blended selection in h-major
    contraction order stays inside the same envelope as the w-major fold."""
    monkeypatch.setenv("CAMLIFLOW_LOOKUP_FOLD", "1")
    monkeypatch.setenv("CAMLIFLOW_LOOKUP_HMAJOR", "1")
    from camliflow_tpu.ops.correlation import (
        corr_lookup_2d_padded,
        pad_pyramid_for_lookup,
    )

    f1 = rng.randn(1, 8, 8, 16).astype(np.float32)
    f2 = rng.randn(1, 8, 8, 16).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(1, 8, 8, 2)).astype(np.float32)
    coords = np.asarray(ops.mesh_grid(1, 8, 8)) + flow

    pyr = ops.all_pairs_correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3)
    exact = np.asarray(ops.corr_lookup_2d(pyr, jnp.asarray(coords), radius=2))
    folded = np.asarray(
        corr_lookup_2d_padded.__wrapped__(
            pad_pyramid_for_lookup(pyr, 2, storage=storage),
            jnp.asarray(coords), 2, storage=storage,
        )
    )
    scale = np.abs(exact).max()
    bound = (1.0 / 254 if storage == "int8" else 2.0**-8) + 3 * 2.0**-8
    np.testing.assert_allclose(folded, exact, atol=scale * bound)


@pytest.mark.parametrize("storage", ["bf16", "int8"])
def test_corr_lookup_fold_close_to_exact(rng, storage, monkeypatch):
    """CAMLIFLOW_LOOKUP_FOLD=1: the bf16 two-tap fold (blend riding the
    selection matrices) stays within the combined bf16-weight + storage
    envelope of the exact f32 lookup, and agrees with the unfolded fast
    path to the bf16 rounding of the blend weights."""
    monkeypatch.setenv("CAMLIFLOW_LOOKUP_FOLD", "1")
    f1 = rng.randn(1, 8, 8, 16).astype(np.float32)
    f2 = rng.randn(1, 8, 8, 16).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(1, 8, 8, 2)).astype(np.float32)
    coords = np.asarray(ops.mesh_grid(1, 8, 8)) + flow

    pyr = ops.all_pairs_correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 3)
    exact = np.asarray(ops.corr_lookup_2d(pyr, jnp.asarray(coords), radius=2))
    # jit caches key on args only; the env flip needs a fresh trace
    from camliflow_tpu.ops.correlation import (
        corr_lookup_2d_padded,
        pad_pyramid_for_lookup,
    )

    folded = np.asarray(
        corr_lookup_2d_padded.__wrapped__(
            pad_pyramid_for_lookup(pyr, 2, storage=storage),
            jnp.asarray(coords), 2, storage=storage,
        )
    )
    scale = np.abs(exact).max()
    # storage envelope + two bf16 roundings (weights, stage-1 slab)
    bound = (1.0 / 254 if storage == "int8" else 2.0**-8) + 3 * 2.0**-8
    np.testing.assert_allclose(folded, exact, atol=scale * bound)
    assert folded.shape == exact.shape
