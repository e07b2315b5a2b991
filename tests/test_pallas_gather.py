"""Correctness of the Pallas KNN gather (interpret mode) against the XLA
`gather_points`, and the k-major PointConv fast routing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from camliflow_tpu.nn.point_conv import PointConv
from camliflow_tpu.ops.geometry import gather_points, k_nearest_neighbor
from camliflow_tpu.ops.pallas_gather import (
    gather_fits_vmem,
    gather_points_kmajor,
)


@pytest.mark.slow  # dead-kernel semantics pin (PERF.md gather-probe verdict)
def test_gather_kmajor_matches_xla(rng):
    data = jnp.asarray(rng.randn(2, 200, 67).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 200, size=(2, 96, 16)).astype(np.int32))
    got = gather_points_kmajor(data, idx, interpret=True)  # [B, k, M, C]
    want = gather_points(data, idx)  # [B, M, k, C]
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(want).transpose(0, 2, 1, 3)
    )
    assert gather_fits_vmem(data, idx)


@pytest.mark.slow  # dead-kernel semantics pin (PERF.md gather-probe verdict)
def test_gather_kmajor_bf16_and_odd_shapes(rng):
    data = jnp.asarray(rng.randn(1, 77, 3).astype(np.float32)).astype(
        jnp.bfloat16
    )
    idx = jnp.asarray(rng.randint(0, 77, size=(1, 33, 5)).astype(np.int32))
    got = gather_points_kmajor(data, idx, interpret=True)
    want = gather_points(data, idx)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32).transpose(0, 2, 1, 3),
    )


@pytest.mark.slow  # dead-kernel semantics pin (PERF.md gather-probe verdict)
def test_pointconv_fast_matches_exact(rng, monkeypatch):
    """PointConv(fast=True) with CAMLIFLOW_PGATHER=1 == the XLA path (same
    gathered values; einsum contraction order may round differently)."""
    monkeypatch.setenv("CAMLIFLOW_PGATHER", "1")
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 128, 35).astype(np.float32))
    sampled = xyz[:, :64]
    knn = k_nearest_neighbor(xyz, sampled, 16)
    conv = PointConv(48, norm=None, k=16)
    variables = conv.init(jax.random.PRNGKey(0), xyz, feats, sampled, knn)
    want = conv.apply(variables, xyz, feats, sampled, knn)
    got = conv.apply(variables, xyz, feats, sampled, knn, fast=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )
