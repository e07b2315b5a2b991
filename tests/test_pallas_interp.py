"""Correctness of the fused KNN-interpolation kernel (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from camliflow_tpu.ops.geometry import backwarp_3d, knn_interpolation
from camliflow_tpu.ops.pallas_interp import knn_interpolation_pallas


@pytest.mark.parametrize("k,channels", [(3, 3), (1, 8), (4, 16)])
def test_matches_xla_interpolation(rng, k, channels):
    batch, m, n = 2, 160, 100
    sup = jnp.asarray(rng.randn(batch, m, 3).astype(np.float32))
    feat = jnp.asarray(rng.randn(batch, m, channels).astype(np.float32))
    qry = jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))

    want = knn_interpolation(sup, feat, qry, k=k)
    got = knn_interpolation_pallas(sup, feat, qry, k=k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_backwarp_fast_matches(rng, monkeypatch):
    """backwarp_3d(fast=True) == backwarp_3d() with the kernel interpreted."""
    from camliflow_tpu.ops import geometry, pallas_interp

    batch, n, m = 1, 120, 96
    xyz1 = jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.randn(batch, m, 3).astype(np.float32))
    flow = jnp.asarray(0.1 * rng.randn(batch, n, 3).astype(np.float32))

    want = backwarp_3d(xyz1, xyz2, flow)

    orig = pallas_interp.knn_interpolation_pallas
    monkeypatch.setattr(
        pallas_interp,
        "knn_interpolation_pallas",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    monkeypatch.setattr(geometry, "_on_tpu", lambda: True)
    got = geometry.backwarp_3d.__wrapped__(xyz1, xyz2, flow, k=3, fast=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)
