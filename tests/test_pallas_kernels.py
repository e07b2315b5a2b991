"""Interpret-mode tests for the Pallas TPU kernels (run on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from camliflow_tpu import ops
from camliflow_tpu.ops.pallas_fps import furthest_point_sampling_pallas
from camliflow_tpu.ops.pallas_knn import k_nearest_neighbor_pallas


def test_pallas_knn_matches_xla(rng):
    pts = jnp.asarray(rng.randn(2, 300, 3).astype(np.float32))
    q = jnp.asarray(rng.randn(2, 150, 3).astype(np.float32))
    ref = np.asarray(ops.k_nearest_neighbor(pts, q, 5))
    got = np.asarray(k_nearest_neighbor_pallas(pts, q, 5, interpret=True))
    # selected distances must agree (indices may differ on exact ties)
    d = np.asarray(ops.squared_distance(q, pts))
    np.testing.assert_allclose(
        np.take_along_axis(d, got, -1),
        np.take_along_axis(d, ref, -1),
        rtol=1e-4, atol=1e-4,
    )


def test_pallas_knn_large_k(rng):
    # encoder-sized selection: k=16 and k=32 over a wide support set
    pts = jnp.asarray(rng.randn(1, 640, 3).astype(np.float32))
    q = jnp.asarray(rng.randn(1, 200, 3).astype(np.float32))
    d = np.asarray(ops.squared_distance(q, pts))
    for k in (16, 32):
        ref = np.asarray(ops.k_nearest_neighbor(pts, q, k))
        got = np.asarray(k_nearest_neighbor_pallas(pts, q, k, interpret=True))
        np.testing.assert_allclose(
            np.take_along_axis(d, got, -1),
            np.take_along_axis(d, ref, -1),
            rtol=1e-4, atol=1e-4,
        )


def test_pallas_knn_2d(rng):
    pts = jnp.asarray(rng.rand(1, 200, 2).astype(np.float32) * 50)
    q = jnp.asarray(rng.rand(1, 260, 2).astype(np.float32) * 50)
    ref = np.asarray(ops.k_nearest_neighbor(pts, q, 1))
    got = np.asarray(k_nearest_neighbor_pallas(pts, q, 1, interpret=True))
    d = np.asarray(ops.squared_distance(q, pts))
    np.testing.assert_allclose(
        np.take_along_axis(d, got, -1), np.take_along_axis(d, ref, -1),
        rtol=1e-4, atol=1e-4,
    )


def test_pallas_fps_matches_xla(rng):
    pc = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32))
    ref = np.asarray(ops.furthest_point_sampling(pc, 128))
    got = np.asarray(furthest_point_sampling_pallas(pc, 128, interpret=True))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.slow  # dead-kernel semantics pin (PERF.md gather-probe verdict)
def test_pallas_fps_coord_gather_matches_xla(rng, monkeypatch):
    """CAMLIFLOW_FPS_GATHER=1: the dynamic-gather coordinate read is
    bit-identical to the one-hot masked-reduce variant (same distance math,
    same tie-breaks) and thus to the XLA reference."""
    monkeypatch.setenv("CAMLIFLOW_FPS_GATHER", "1")
    from camliflow_tpu import ops

    pc = jnp.asarray(np.random.RandomState(3).randn(2, 333, 3), jnp.float32)
    ref = np.asarray(ops.furthest_point_sampling(pc, 128))
    got = np.asarray(furthest_point_sampling_pallas(pc, 128, interpret=True))
    np.testing.assert_array_equal(got, ref)
