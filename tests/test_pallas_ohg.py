"""Parity tests for the one-hot MXU gather kernel (ops/pallas_ohg.py).

The kernel must be BIT-IDENTICAL to the XLA fast path it replaces
(PointConvDW fast=True tail: bf16 gather -> bf16 multiply -> max over k
-> f32): the one-hot selection is exact, and the multiply/max are the
same ops in the same dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camliflow_tpu.ops.pallas_ohg import (
    dw_conv_ohg,
    is_ohg_pack,
    pack_dw,
    pack_dw_tree,
)


def _xla_fast_reference(feats_bf16, idx, w_bf16):
    """The exact XLA fast-path tail (nn/point_conv.py PointConvDW fast)."""
    knn_feats = jax.vmap(lambda f, i: f[i])(feats_bf16, idx)
    out = jnp.max(knn_feats * w_bf16, axis=2)
    return out.astype(jnp.float32)


@pytest.mark.parametrize(
    "k,channels", [(4, 256), (16, 128), (16, 125), (32, 32), (32, 128)]
)
def test_dw_conv_ohg_bit_parity(k, channels):
    key = jax.random.PRNGKey(k * 1000 + channels)
    batch, n_points, m_samples = 2, 256, 128
    k1, k2, k3 = jax.random.split(key, 3)
    feats = jax.random.normal(k1, (batch, n_points, channels)).astype(
        jnp.bfloat16
    )
    idx = jax.random.randint(k2, (batch, m_samples, k), 0, n_points)
    weights = jax.random.normal(k3, (batch, m_samples, k, channels))

    pack = pack_dw(weights, idx)
    assert pack is not None and is_ohg_pack(pack)
    got = dw_conv_ohg(feats, pack["idx_km"], pack["w_km"], k, interpret=True)
    want = _xla_fast_reference(feats, idx, weights.astype(jnp.bfloat16))
    assert got.shape == want.shape == (batch, m_samples, channels)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dw_conv_ohg_multi_tile():
    """m_samples large enough to span several grid tiles + N chunks."""
    key = jax.random.PRNGKey(7)
    batch, n_points, m_samples, k, channels = 1, 1024, 256, 16, 64
    k1, k2, k3 = jax.random.split(key, 3)
    feats = jax.random.normal(k1, (batch, n_points, channels)).astype(
        jnp.bfloat16
    )
    idx = jax.random.randint(k2, (batch, m_samples, k), 0, n_points)
    weights = jax.random.normal(k3, (batch, m_samples, k, channels))
    pack = pack_dw(weights, idx)
    got = dw_conv_ohg(feats, pack["idx_km"], pack["w_km"], k, interpret=True)
    want = _xla_fast_reference(feats, idx, weights.astype(jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pack_dw_tree_shapes_and_fallback():
    batch, m_samples = 1, 64
    idx = jnp.zeros((batch, m_samples, 32), jnp.int32)
    dw = {
        "motion_encoder": {
            "conv_c1": jnp.zeros((batch, m_samples, 16, 128)),
            "conv_f1": jnp.zeros((batch, m_samples, 32, 32)),
        },
        "gru": {"conv_zr": jnp.zeros((batch, m_samples, 4, 256))},
        # k=3 is not a power of two -> must stay unpacked
        "odd": jnp.zeros((batch, m_samples, 3, 8)),
    }
    packed = pack_dw_tree(dw, idx, n_points=m_samples)
    assert is_ohg_pack(packed["motion_encoder"]["conv_c1"])
    assert is_ohg_pack(packed["gru"]["conv_zr"])
    assert not is_ohg_pack(packed["odd"])
    assert packed["odd"] is dw["odd"]
    # too-long tables are rejected wholesale
    same = pack_dw_tree(dw, idx, n_points=100_000)
    assert not is_ohg_pack(same["gru"]["conv_zr"])


def test_paired_and_single_conv_route_through_pack():
    """PointConvDW / paired_dw_conv with an OHG pack == their fast path."""
    from camliflow_tpu.nn.point_conv import PointConvDW, paired_dw_conv

    key = jax.random.PRNGKey(3)
    batch, n, k = 1, 128, 4
    xyz = jax.random.normal(key, (batch, n, 3))
    feats = jax.random.normal(jax.random.PRNGKey(4), (batch, n, 48))
    idx = jax.random.randint(jax.random.PRNGKey(5), (batch, n, k), 0, n)

    import flax.linen as nn

    class Host(nn.Module):
        def setup(self):
            self.conv_a = PointConvDW(16, act=None, k=k)
            self.conv_b = PointConvDW(16, act=None, k=k)

        def __call__(self, xyz, feats, idx, packed: bool):
            wa = self.conv_a.compute_weights(
                xyz, knn_indices=idx, dtype=jnp.bfloat16
            )
            wb = self.conv_b.compute_weights(
                xyz, knn_indices=idx, dtype=jnp.bfloat16
            )
            wcat = jnp.concatenate([wa, wb], axis=-1)
            if packed:
                wcat = pack_dw(wcat, idx)
                wa = pack_dw(wa, idx)
            a_pair, b_pair = paired_dw_conv(
                self.conv_a, self.conv_b, xyz, feats,
                knn_indices=idx, weights=wcat, fast=True,
            )
            a_single = self.conv_a(
                xyz, feats, knn_indices=idx, weights=wa, fast=True
            )
            return a_pair, b_pair, a_single

    host = Host()
    params = host.init(jax.random.PRNGKey(0), xyz, feats, idx, False)
    ref = host.apply(params, xyz, feats, idx, False)
    got = host.apply(params, xyz, feats, idx, True)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
