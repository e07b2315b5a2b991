"""Golden tests for point-cloud geometry ops against independent NumPy/torch
re-implementations of the reference semantics (models/csrc/wrapper.py,
models/utils.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from camliflow_tpu import ops


def np_squared_distance(a, b):
    return ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)


def test_squared_distance(rng):
    a = rng.randn(2, 64, 3).astype(np.float32)
    b = rng.randn(2, 48, 3).astype(np.float32)
    got = np.asarray(ops.squared_distance(jnp.asarray(a), jnp.asarray(b)))
    want = np_squared_distance(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_knn_matches_naive(rng):
    a = rng.randn(2, 128, 3).astype(np.float32)
    q = rng.randn(2, 32, 3).astype(np.float32)
    k = 5
    got = np.asarray(ops.k_nearest_neighbor(jnp.asarray(a), jnp.asarray(q), k))
    d = np_squared_distance(q, a)
    want = np.argsort(d, axis=-1, kind="stable")[:, :, :k]
    # compare selected distances (indices may differ on exact ties)
    got_d = np.take_along_axis(d, got, axis=-1)
    want_d = np.take_along_axis(d, want, axis=-1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-5)
    # sorted ascending
    assert np.all(np.diff(got_d, axis=-1) >= -1e-5)


def test_gather_points(rng):
    data = rng.randn(2, 50, 7).astype(np.float32)
    idx = rng.randint(0, 50, size=(2, 10, 4))
    got = np.asarray(ops.gather_points(jnp.asarray(data), jnp.asarray(idx)))
    want = np.stack([data[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(got, want)
    # 2-D data (no channel axis)
    data2 = rng.randn(2, 50).astype(np.float32)
    got2 = np.asarray(ops.gather_points(jnp.asarray(data2), jnp.asarray(idx)))
    want2 = np.stack([data2[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(got2, want2)


def np_fps(xyz, n_samples):
    """Sequential reference (wrapper.py:83-96 semantics)."""
    batch, n, _ = xyz.shape
    out = np.zeros((batch, n_samples), dtype=np.int64)
    for b in range(batch):
        dist = np.full(n, 1e10, dtype=np.float32)
        farthest = 0
        for i in range(n_samples):
            out[b, i] = farthest
            d = ((xyz[b] - xyz[b, farthest]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            farthest = int(dist.argmax())
    return out


def test_fps_matches_sequential_reference(rng):
    xyz = rng.randn(3, 100, 3).astype(np.float32)
    got = np.asarray(ops.furthest_point_sampling(jnp.asarray(xyz), 40))
    want = np_fps(xyz, 40)
    np.testing.assert_array_equal(got, want)


def test_fps_starts_at_zero_and_unique(rng):
    xyz = rng.randn(2, 256, 3).astype(np.float32)
    idx = np.asarray(ops.furthest_point_sampling(jnp.asarray(xyz), 64))
    assert (idx[:, 0] == 0).all()
    for b in range(2):
        assert len(set(idx[b].tolist())) == 64


def test_knn_interpolation_inverse_distance(rng):
    src = rng.randn(2, 40, 3).astype(np.float32)
    feat = rng.randn(2, 40, 8).astype(np.float32)
    q = rng.randn(2, 16, 3).astype(np.float32)
    got = np.asarray(
        ops.knn_interpolation(jnp.asarray(src), jnp.asarray(feat), jnp.asarray(q), k=3)
    )
    d = np.sqrt(np_squared_distance(q, src))
    idx = np.argsort(d, axis=-1, kind="stable")[:, :, :3]
    knn_d = np.maximum(np.take_along_axis(d, idx, axis=-1), 1e-8)
    w = 1.0 / knn_d
    w = w / w.sum(-1, keepdims=True)
    want = np.zeros((2, 16, 8), np.float32)
    for b in range(2):
        want[b] = (feat[b][idx[b]] * w[b][..., None]).sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_knn_interpolation_exact_at_source_points(rng):
    # querying the source locations returns (approximately) the source features
    src = rng.randn(1, 30, 3).astype(np.float32) * 10
    feat = rng.randn(1, 30, 4).astype(np.float32)
    got = np.asarray(
        ops.knn_interpolation(jnp.asarray(src), jnp.asarray(feat), jnp.asarray(src), k=1)
    )
    np.testing.assert_allclose(got, feat, rtol=1e-5, atol=1e-5)


def test_backwarp_3d_zero_flow_identity(rng):
    xyz1 = rng.randn(2, 32, 3).astype(np.float32)
    xyz2 = rng.randn(2, 32, 3).astype(np.float32)
    flow = np.zeros_like(xyz1)
    got = np.asarray(
        ops.backwarp_3d(jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(flow))
    )
    np.testing.assert_allclose(got, xyz2, rtol=1e-5, atol=1e-5)


def test_backwarp_3d_constant_flow(rng):
    # constant flow t: xyz2 should be warped by -t
    xyz1 = rng.randn(2, 64, 3).astype(np.float32)
    t = np.array([0.5, -0.3, 0.2], np.float32)
    xyz2 = xyz1 + rng.randn(2, 64, 3).astype(np.float32) * 0.01
    flow = np.broadcast_to(t, xyz1.shape).astype(np.float32)
    got = np.asarray(
        ops.backwarp_3d(jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(flow))
    )
    np.testing.assert_allclose(got, xyz2 - t, rtol=1e-4, atol=1e-4)


def test_build_pc_pyramid_nested(rng):
    pc1 = rng.randn(2, 512, 3).astype(np.float32)
    pc2 = rng.randn(2, 512, 3).astype(np.float32)
    levels = [128, 64, 32]
    xyzs1, xyzs2, idx1, idx2 = ops.build_pc_pyramid(
        jnp.asarray(pc1), jnp.asarray(pc2), levels
    )
    assert len(xyzs1) == len(levels) + 1
    assert xyzs1[0].shape == (2, 512, 3)
    for lvl, n in enumerate(levels, start=1):
        assert xyzs1[lvl].shape == (2, n, 3)
        assert idx1[lvl].shape == (2, n)
        # nested: level l+1 indices are a prefix of level l
        if lvl >= 2:
            np.testing.assert_array_equal(
                np.asarray(idx1[lvl]), np.asarray(idx1[lvl - 1])[:, : n]
            )
        # xyz values match gathered indices
        want = np.stack([pc1[b][np.asarray(idx1[lvl])[b]] for b in range(2)])
        np.testing.assert_array_equal(np.asarray(xyzs1[lvl]), want)
    # frame-2 pyramid is independent of frame 1
    want2 = np.stack([pc2[b][np.asarray(idx2[1])[b]] for b in range(2)])
    np.testing.assert_array_equal(np.asarray(xyzs2[1]), want2)


@pytest.mark.parametrize("k", [1, 3, 16])
def test_knn_vs_torch(rng, k):
    torch = pytest.importorskip("torch")
    a = rng.randn(2, 200, 3).astype(np.float32)
    q = rng.randn(2, 60, 3).astype(np.float32)
    got = np.asarray(ops.k_nearest_neighbor(jnp.asarray(a), jnp.asarray(q), k))
    d = torch.cdist(torch.from_numpy(q), torch.from_numpy(a)) ** 2
    want = d.topk(k, dim=2, largest=False).indices.numpy()
    got_d = np.take_along_axis(np_squared_distance(q, a), got, -1)
    want_d = np.take_along_axis(np_squared_distance(q, a), want, -1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-4)
