"""Parity tests for neural building blocks against hand-built torch oracles
that follow the reference semantics (models/point_conv.py, models/clfm.py,
models/mlp.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from camliflow_tpu import nn as cnn  # noqa: E402
from camliflow_tpu import ops  # noqa: E402


def t(x):
    return torch.from_numpy(np.asarray(x))


def dense_to_torch(params, torch_conv):
    """Copy flax Dense params into a torch Conv1d/Conv2d (k=1) or Linear."""
    kernel = np.asarray(params["kernel"])  # [in, out]
    with torch.no_grad():
        w = torch.from_numpy(kernel.T.copy())
        torch_conv.weight.copy_(w.reshape(torch_conv.weight.shape))
        if "bias" in params and torch_conv.bias is not None:
            torch_conv.bias.copy_(t(params["bias"]))


def test_dense_norm_act_matches_conv1d(rng):
    x = rng.randn(2, 17, 12).astype(np.float32)  # [B, N, C]
    mod = cnn.DenseNormAct(24, norm=None, act="leaky_relu")
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    conv = tnn.Conv1d(12, 24, 1)
    dense_to_torch(params["params"]["Dense_0"], conv)
    want = tF.leaky_relu(conv(t(x).transpose(1, 2)), 0.1).transpose(1, 2).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pointconv_matches_torch_oracle(rng):
    """Oracle follows point_conv.py:35-70 step by step in torch."""
    batch, n, m, cin, cout, k = 2, 40, 16, 6, 10, 4
    xyz = rng.randn(batch, n, 3).astype(np.float32)
    feats = rng.randn(batch, n, cin).astype(np.float32)
    sampled = xyz[:, :m]

    mod = cnn.PointConv(cout, norm=None, act="leaky_relu", k=k)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(sampled))
    got = np.asarray(mod.apply(params, jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(sampled)))

    p = params["params"]
    wn0 = tnn.Conv2d(3, 8, 1)
    wn1 = tnn.Conv2d(8, 16, 1)
    linear = tnn.Linear(16 * (cin + 3), cout)
    dense_to_torch(p["weight_net"]["DenseNormAct_0"]["Dense_0"], wn0)
    dense_to_torch(p["weight_net"]["DenseNormAct_1"]["Dense_0"], wn1)
    dense_to_torch(p["linear"], linear)

    knn_idx = np.asarray(ops.k_nearest_neighbor(jnp.asarray(xyz), jnp.asarray(sampled), k))
    knn_xyz = np.stack([xyz[b][knn_idx[b]] for b in range(batch)])  # [B, m, k, 3]
    rel = knn_xyz - sampled[:, :, None, :]
    # weight net on [B, 3, m, k]
    w = t(rel).permute(0, 3, 1, 2)
    w = tF.leaky_relu(wn0(w), 0.1)
    w = tF.leaky_relu(wn1(w), 0.1)  # [B, 16, m, k]
    w = w.permute(0, 2, 1, 3)  # [B, m, 16, k]
    feats_aug = np.concatenate([xyz, feats], axis=-1)
    knn_feats = np.stack([feats_aug[b][knn_idx[b]] for b in range(batch)])  # [B,m,k,C+3]
    out = torch.matmul(w, t(knn_feats))  # [B, m, 16, C+3]
    out = out.reshape(batch, m, -1)
    want = tF.leaky_relu(linear(out), 0.1).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pointconv_dw_matches_torch_oracle(rng):
    batch, n, cin, cout, k = 2, 30, 5, 8, 4
    xyz = rng.randn(batch, n, 3).astype(np.float32)
    feats = rng.randn(batch, n, cin).astype(np.float32)

    mod = cnn.PointConvDW(cout, norm=None, act="leaky_relu", k=k)
    params = mod.init(jax.random.PRNGKey(2), jnp.asarray(xyz), jnp.asarray(feats))
    got = np.asarray(mod.apply(params, jnp.asarray(xyz), jnp.asarray(feats)))

    p = params["params"]
    mlp = tnn.Conv1d(cin, cout, 1)
    wn0, wn1, wn2 = tnn.Conv2d(3, 8, 1), tnn.Conv2d(8, 32, 1), tnn.Conv2d(32, cout, 1)
    dense_to_torch(p["mlp"]["DenseNormAct_0"]["Dense_0"], mlp)
    dense_to_torch(p["weight_net"]["DenseNormAct_0"]["Dense_0"], wn0)
    dense_to_torch(p["weight_net"]["DenseNormAct_1"]["Dense_0"], wn1)
    dense_to_torch(p["weight_net"]["DenseNormAct_2"]["Dense_0"], wn2)

    knn_idx = np.asarray(ops.k_nearest_neighbor(jnp.asarray(xyz), jnp.asarray(xyz), k))
    knn_xyz = np.stack([xyz[b][knn_idx[b]] for b in range(batch)])
    rel = t(knn_xyz - xyz[:, :, None, :]).permute(0, 3, 1, 2)  # [B,3,n,k]
    w = tF.relu(wn2(tF.relu(wn1(tF.relu(wn0(rel))))))  # [B,cout,n,k]
    f = tF.leaky_relu(mlp(t(feats).transpose(1, 2)), 0.1).transpose(1, 2).detach().numpy()
    knn_f = np.stack([f[b][knn_idx[b]] for b in range(batch)])  # [B,n,k,cout]
    prod = t(knn_f).permute(0, 3, 1, 2) * w
    want = prod.max(dim=-1)[0].transpose(1, 2).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_skfusion_matches_torch_oracle(rng):
    batch, c2, c3, cout = 2, 12, 10, 12
    a = rng.randn(batch, 7, 9, c2).astype(np.float32)
    b = rng.randn(batch, 7, 9, c3).astype(np.float32)
    mod = cnn.SKFusion(cout, norm=None, reduction=2)
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(mod.apply(params, jnp.asarray(a), jnp.asarray(b)))

    p = params["params"]
    al1, al2 = tnn.Conv2d(c2, cout, 1), tnn.Conv2d(c3, cout, 1)
    fc_mid = tnn.Linear(cout, cout // 2, bias=False)
    fc_out = tnn.Linear(cout // 2, cout * 2, bias=False)
    dense_to_torch(p["align1"]["Dense_0"], al1)
    dense_to_torch(p["align2"]["Dense_0"], al2)
    dense_to_torch(p["fc_mid"], fc_mid)
    dense_to_torch(p["fc_out"], fc_out)

    ta = tF.leaky_relu(al1(t(a).permute(0, 3, 1, 2)), 0.1)
    tb = tF.leaky_relu(al2(t(b).permute(0, 3, 1, 2)), 0.1)
    weight = tF.adaptive_avg_pool2d(ta + tb, 1).reshape(batch, -1)
    weight = tF.relu(fc_mid(weight))
    weight = torch.sigmoid(fc_out(weight)).reshape(batch, -1, 2)
    weight = torch.softmax(weight, dim=-1)
    w1 = weight[..., 0].reshape(batch, -1, 1, 1)
    w2 = weight[..., 1].reshape(batch, -1, 1, 1)
    want = (ta * w1 + tb * w2).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_clfm_shapes_and_gradients(rng):
    batch, h, w, n, c2, c3 = 2, 6, 8, 20, 16, 12
    uv = rng.uniform(0, 5, size=(batch, n, 2)).astype(np.float32)
    f2d = rng.randn(batch, h, w, c2).astype(np.float32)
    f3d = rng.randn(batch, n, c3).astype(np.float32)
    mod = cnn.CLFM(c2, c3, fusion_fn="sk")
    params = mod.init(jax.random.PRNGKey(4), jnp.asarray(uv), jnp.asarray(f2d), jnp.asarray(f3d))
    out2d, out3d = mod.apply(params, jnp.asarray(uv), jnp.asarray(f2d), jnp.asarray(f3d))
    assert out2d.shape == (batch, h, w, c2)
    assert out3d.shape == (batch, n, c3)

    # cross-branch detach: d(out2d)/d(f3d) flows only through stop_gradient'd
    # interp path => should be zero
    def loss2d(f3d_in):
        o2d, _ = mod.apply(params, jnp.asarray(uv), jnp.asarray(f2d), f3d_in)
        return jnp.sum(o2d**2)

    g = jax.grad(loss2d)(jnp.asarray(f3d))
    assert float(jnp.abs(g).max()) == 0.0

    def loss3d(f2d_in):
        _, o3d = mod.apply(params, jnp.asarray(uv), f2d_in, jnp.asarray(f3d))
        return jnp.sum(o3d**2)

    g2 = jax.grad(loss3d)(jnp.asarray(f2d))
    assert float(jnp.abs(g2).max()) == 0.0


@pytest.mark.parametrize("fusion_fn", ["add", "concat", "gated"])
def test_clfm_other_fusions(rng, fusion_fn):
    batch, h, w, n, c = 1, 4, 5, 10, 8
    uv = rng.uniform(0, 3, size=(batch, n, 2)).astype(np.float32)
    f2d = rng.randn(batch, h, w, c).astype(np.float32)
    f3d = rng.randn(batch, n, c).astype(np.float32)
    mod = cnn.CLFM(c, c, fusion_fn=fusion_fn)
    params = mod.init(jax.random.PRNGKey(5), jnp.asarray(uv), jnp.asarray(f2d), jnp.asarray(f3d))
    out2d, out3d = mod.apply(params, jnp.asarray(uv), jnp.asarray(f2d), jnp.asarray(f3d))
    assert out2d.shape == (batch, h, w, c)
    assert out3d.shape == (batch, n, c)


def test_resnet_encoder_shape(rng):
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    mod = cnn.ResNetEncoder2D(depth=50, out_channels=128)
    variables = mod.init(jax.random.PRNGKey(6), jnp.asarray(x))
    out = mod.apply(variables, jnp.asarray(x))
    assert out.shape == (1, 8, 12, 128)  # stride 8
    # parameter count sanity: stem + layer1(3 bottlenecks) + layer2(4) + align
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert 1.0e6 < n_params < 2.0e6  # ~1.4M for the 2-stage cut


def test_batchnorm_updates_stats(rng):
    x = rng.randn(4, 10, 8).astype(np.float32)
    mod = cnn.DenseNormAct(8, norm="batch_norm")
    variables = mod.init(jax.random.PRNGKey(7), jnp.asarray(x))
    out, updates = mod.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["Norm_0"]["BatchNorm_0"]["mean"]
    after = updates["batch_stats"]["Norm_0"]["BatchNorm_0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 15, 6).astype(np.float32)
    mod = cnn.InstanceNorm(affine=False)
    params = mod.init(jax.random.PRNGKey(8), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = tF.instance_norm(t(x).transpose(1, 2)).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_compute_precision_policy(rng):
    """compute_precision('bfloat16') switches layer computation dtype while
    parameters stay f32; default stays f32."""
    from camliflow_tpu.nn import layers

    x = jnp.asarray(rng.randn(2, 6, 12).astype(np.float32))
    with layers.compute_precision("bfloat16"):
        mod = cnn.DenseNormAct(8, norm=None)
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
    assert out.dtype == jnp.bfloat16
    assert params["params"]["Dense_0"]["kernel"].dtype == jnp.float32
    # context restored
    assert layers.compute_dtype() is None
    mod2 = cnn.DenseNormAct(8, norm=None)
    params2 = mod2.init(jax.random.PRNGKey(0), x)
    assert mod2.apply(params2, x).dtype == jnp.float32


import flax.linen as fnn  # noqa: E402


class _ZRPair(fnn.Module):
    """Harness module hosting two PointConvDWs for paired_dw_conv tests."""

    k: int = 4

    def setup(self):
        self.conv_z = cnn.PointConvDW(6, act=None, k=self.k)
        self.conv_r = cnn.PointConvDW(6, act=None, k=self.k)

    def __call__(self, xyz, feats, idx, paired: bool, fast: bool = False):
        if paired:
            return cnn.paired_dw_conv(
                self.conv_z, self.conv_r, xyz, feats, knn_indices=idx, fast=fast
            )
        return (
            self.conv_z(xyz, feats, knn_indices=idx),
            self.conv_r(xyz, feats, knn_indices=idx),
        )


def test_paired_dw_conv_matches_independent_calls(rng):
    """The single-gather z/r pair is bit-identical to two independent convs."""
    batch, n, cin, k = 2, 24, 5, 4
    xyz = jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(batch, n, cin).astype(np.float32))
    idx = ops.k_nearest_neighbor(xyz, xyz, k)

    mod = _ZRPair(k=k)
    params = mod.init(jax.random.PRNGKey(0), xyz, feats, idx, True)
    got_z, got_r = mod.apply(params, xyz, feats, idx, True)
    want_z, want_r = mod.apply(params, xyz, feats, idx, False)
    np.testing.assert_array_equal(np.asarray(got_z), np.asarray(want_z))
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))


def test_paired_dw_conv_fast_close(rng):
    """fast=True (bf16 gather) stays within bf16 resolution of exact."""
    batch, n, cin, k = 2, 24, 5, 4
    xyz = jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(batch, n, cin).astype(np.float32))
    idx = ops.k_nearest_neighbor(xyz, xyz, k)

    mod = _ZRPair(k=k)
    params = mod.init(jax.random.PRNGKey(0), xyz, feats, idx, True)
    exact = mod.apply(params, xyz, feats, idx, True)
    fast = mod.apply(params, xyz, feats, idx, True, fast=True)
    for e, f in zip(exact, fast):
        scale = float(np.abs(np.asarray(e)).max())
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(e), atol=scale * 2.0**-7
        )


def test_pointconv_dw_fast_close(rng):
    """PointConvDW fast=True (bf16 features + weights) tracks the f32 path."""
    batch, n, cin, cout, k = 2, 30, 5, 8, 4
    xyz = jnp.asarray(rng.randn(batch, n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(batch, n, cin).astype(np.float32))

    mod = cnn.PointConvDW(cout, norm=None, act="leaky_relu", k=k)
    params = mod.init(jax.random.PRNGKey(2), xyz, feats)
    exact = np.asarray(mod.apply(params, xyz, feats))
    fast = np.asarray(mod.apply(params, xyz, feats, fast=True))
    scale = np.abs(exact).max()
    np.testing.assert_allclose(fast, exact, atol=scale * 2.0**-7)
