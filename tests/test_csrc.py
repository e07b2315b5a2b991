"""Tests for the native host-side kernels vs their NumPy fallbacks."""

import numpy as np
import pytest

from camliflow_tpu import csrc


def test_native_built():
    assert csrc.native_available(), "libknn_fps.so should be built in CI"


def test_knn_cpu_matches_numpy(rng):
    pts = rng.randn(200, 3).astype(np.float32)
    q = rng.randn(50, 3).astype(np.float32)
    got = csrc.knn_cpu(pts, q, 4)
    d = ((q[:, None] - pts[None]) ** 2).sum(-1)
    want = np.argsort(d, axis=1, kind="stable")[:, :4]
    got_d = np.take_along_axis(d, got, 1)
    want_d = np.take_along_axis(d, want, 1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-6)


def test_fps_cpu_matches_jax(rng):
    import jax.numpy as jnp

    from camliflow_tpu import ops

    xyz = rng.randn(300, 3).astype(np.float32)
    got = csrc.fps_cpu(xyz, 60)
    want = np.asarray(ops.furthest_point_sampling(jnp.asarray(xyz)[None], 60))[0]
    np.testing.assert_array_equal(got, want)
