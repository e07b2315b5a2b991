"""Correctness of the Correlation3D prefix-level selection kernel (interpret
mode) against the differentiable XLA selection path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from camliflow_tpu.models.camliraft_l import (
    Correlation3D,
    build_cost_volume_pyramid_3d,
)
from camliflow_tpu.ops.geometry import knn_from_dists, squared_distance
from camliflow_tpu.ops.pallas_corr3d import correlation3d_knn_pallas


def _make_case(rng, batch=2, n=96, level_sizes=(128, 64, 32, 16), dim=16):
    xyz1 = rng.randn(batch, n, 3).astype(np.float32)
    xyz2 = rng.randn(batch, level_sizes[0], 3).astype(np.float32)
    feat1 = rng.randn(batch, n, dim).astype(np.float32)
    feat2 = rng.randn(batch, level_sizes[0], dim).astype(np.float32)
    xyzs2 = [jnp.asarray(xyz2[:, :m]) for m in level_sizes]
    pyramid = build_cost_volume_pyramid_3d(
        jnp.asarray(feat1), jnp.asarray(feat2[:, : level_sizes[0]]), xyzs2
    )
    return jnp.asarray(xyz1), jnp.asarray(xyz2), level_sizes, pyramid


@pytest.mark.parametrize("k", [4, 16])
def test_selection_matches_xla_path(rng, k):
    xyz1, xyz2, level_sizes, pyramid = _make_case(rng)
    cv = jnp.concatenate(pyramid, axis=-1)
    got_idx, got_cost = correlation3d_knn_pallas(
        xyz1, xyz2, cv, tuple(level_sizes), k=k, interpret=True
    )
    dists = np.asarray(squared_distance(xyz1, xyz2))
    want = np.concatenate(
        [np.asarray(knn_from_dists(dists[:, :, :m], k=k)) for m in level_sizes],
        axis=-1,
    )
    # selected distances must agree exactly (indices may differ on exact ties)
    got_np = np.asarray(got_idx)
    offsets = np.repeat(np.cumsum([0] + list(level_sizes[:-1])), k)
    for lvl, m in enumerate(level_sizes):
        sl = slice(lvl * k, (lvl + 1) * k)
        np.testing.assert_allclose(
            np.take_along_axis(dists, got_np[:, :, sl], -1),
            np.take_along_axis(dists, want[:, :, sl], -1),
            rtol=1e-5,
            atol=1e-6,
        )
    # in-kernel extracted costs must equal a direct lookup at the indices
    np.testing.assert_allclose(
        np.asarray(got_cost),
        np.take_along_axis(np.asarray(cv), got_np + offsets[None, None, :], -1),
        rtol=1e-6,
        atol=1e-7,
    )
    # with_cost=False (training path): identical indices, no pyramid read
    idx_nc, cost_nc = correlation3d_knn_pallas(
        xyz1, xyz2, None, tuple(level_sizes), k=k, interpret=True,
        with_cost=False,
    )
    np.testing.assert_array_equal(np.asarray(idx_nc), got_np)
    assert cost_nc is None

    # bf16 pyramid storage (fast path): selection identical — distances are
    # f32 regardless — and only the extracted costs round to bf16
    idx16, cost16 = correlation3d_knn_pallas(
        xyz1, xyz2, cv.astype(jnp.bfloat16), tuple(level_sizes), k=k,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(idx16), got_np)
    np.testing.assert_allclose(
        np.asarray(cost16), np.asarray(got_cost), rtol=1e-2, atol=1e-2
    )

    # int8 pyramid storage (fast path): selection identical; extracted costs
    # dequantise to within the documented max|row|/254 envelope
    from camliflow_tpu.ops.geometry import quantize_rows_int8

    q, scale = quantize_rows_int8(cv)
    idx8, cost8 = correlation3d_knn_pallas(
        xyz1, xyz2, q, tuple(level_sizes), k=k, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx8), got_np)
    np.testing.assert_allclose(
        np.asarray(cost8) * np.asarray(scale),
        np.asarray(got_cost),
        atol=float(np.max(np.asarray(scale))) / 2 + 1e-7,
    )


@pytest.mark.parametrize("approx", [False, True])
def test_ilp_bit_parity(rng, approx):
    """CAMLIFLOW_CORR3D_ILP fuses step j of the independent chunk scans and
    level merges into two loops; every computed value must be bit-identical
    to the sequential schedule (only the instruction interleaving changes)."""
    xyz1, xyz2, level_sizes, pyramid = _make_case(rng)
    cv = jnp.concatenate(pyramid, axis=-1)
    base_idx, base_cost = correlation3d_knn_pallas(
        xyz1, xyz2, cv, tuple(level_sizes), k=16, interpret=True,
        approx=approx, ilp=False,
    )
    ilp_idx, ilp_cost = correlation3d_knn_pallas(
        xyz1, xyz2, cv, tuple(level_sizes), k=16, interpret=True,
        approx=approx, ilp=True,
    )
    np.testing.assert_array_equal(np.asarray(ilp_idx), np.asarray(base_idx))
    np.testing.assert_array_equal(np.asarray(ilp_cost), np.asarray(base_cost))
    # training path (indices only)
    nc_idx, _ = correlation3d_knn_pallas(
        xyz1, xyz2, None, tuple(level_sizes), k=16, interpret=True,
        approx=approx, with_cost=False, ilp=True,
    )
    np.testing.assert_array_equal(np.asarray(nc_idx), np.asarray(base_idx))
    # chunk narrower than k (smallest chunk 12 < 16): fuse_chunks bails to
    # the sequential schedule for the chunks but the merges still fuse —
    # values unchanged
    narrow_base, nb_cost = correlation3d_knn_pallas(
        xyz1, xyz2, cv[..., : sum((48, 24, 12))], (48, 24, 12), k=16,
        interpret=True, approx=approx, ilp=False,
    )
    narrow_ilp, ni_cost = correlation3d_knn_pallas(
        xyz1, xyz2, cv[..., : sum((48, 24, 12))], (48, 24, 12), k=16,
        interpret=True, approx=approx, ilp=True,
    )
    np.testing.assert_array_equal(
        np.asarray(narrow_ilp), np.asarray(narrow_base)
    )
    np.testing.assert_array_equal(np.asarray(ni_cost), np.asarray(nb_cost))


def test_module_fast_path_matches(rng):
    """Correlation3D(fast=True) == Correlation3D(fast=False) end to end."""
    xyz1, xyz2, level_sizes, pyramid = _make_case(rng)
    module = Correlation3D(out_channels=64, k=8)
    variables = module.init(
        jax.random.PRNGKey(0), xyz1, xyz2, level_sizes, pyramid
    )

    from camliflow_tpu.ops import pallas_corr3d

    # interpret mode so the fast path runs on CPU; approx=False isolates the
    # selection bit-parity claim (the module passes approx=True — bf16
    # kernel passes whose boundary swaps are envelope-bounded, below)
    orig = pallas_corr3d.correlation3d_knn_pallas

    def interp_exact(*args, **kw):
        kw["interpret"] = True
        kw["approx"] = False
        return orig(*args, **kw)

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    slow = module.apply(variables, xyz1, xyz2, level_sizes, pyramid)
    pallas_corr3d.correlation3d_knn_pallas = interp_exact
    try:
        fast = module.apply(
            variables, xyz1, xyz2, level_sizes, pyramid, fast=True
        )
    finally:
        pallas_corr3d.correlation3d_knn_pallas = orig
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), rtol=1e-4, atol=1e-5
    )

    # approx=True (what the model uses): bf16 distances may swap near-tied
    # neighbours at the k-boundary; feature-level delta stays envelope-small
    pallas_corr3d.correlation3d_knn_pallas = interp
    try:
        fast_approx = module.apply(
            variables, xyz1, xyz2, level_sizes, pyramid, fast=True
        )
    finally:
        pallas_corr3d.correlation3d_knn_pallas = orig
    d = np.abs(np.asarray(fast_approx) - np.asarray(slow))
    assert np.mean(d) < 5e-3 and np.max(d) < 0.5, (np.mean(d), np.max(d))

    # int8 pyramid + per-row scale (what the refinement cores store on the
    # fast path): same outputs within the quantisation envelope
    from camliflow_tpu.ops.geometry import quantize_rows_int8

    q, scale = quantize_rows_int8(jnp.concatenate(pyramid, axis=-1))
    pallas_corr3d.correlation3d_knn_pallas = interp_exact
    try:
        fast8 = module.apply(
            variables, xyz1, xyz2, level_sizes, q, fast=True,
            pyramid_scale=scale,
        )
    finally:
        pallas_corr3d.correlation3d_knn_pallas = orig
    np.testing.assert_allclose(
        np.asarray(fast8), np.asarray(slow), rtol=1e-2, atol=5e-2
    )


def test_train_select_flag_grad_parity(rng, monkeypatch):
    """CAMLIFLOW_CORR3D_TRAIN_SELECT=1 routes the TRAINING-path selection
    through the Pallas kernel without changing forward values or gradients:
    the k-NN indices are bit-compatible with the XLA top_k path (no exact
    ties in random data) and enter the graph under stop_gradient, so every
    downstream gather/VJP sees identical integers."""
    xyz1, xyz2, level_sizes, pyramid = _make_case(rng)
    module = Correlation3D(out_channels=64, k=8)
    variables = module.init(
        jax.random.PRNGKey(0), xyz1, xyz2, level_sizes, pyramid
    )
    cv = jnp.concatenate(pyramid, axis=-1)

    def loss_fn(params, pyr, x1):
        out = module.apply(params, x1, xyz2, level_sizes, pyr, train=False)
        return jnp.sum(out * out)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2))
    monkeypatch.setenv("CAMLIFLOW_CORR3D_TRAIN_SELECT", "0")
    base = loss_fn(variables, cv, xyz1)
    g_base = grad_fn(variables, cv, xyz1)
    monkeypatch.setenv("CAMLIFLOW_CORR3D_TRAIN_SELECT", "1")
    flagged = loss_fn(variables, cv, xyz1)
    g_flag = grad_fn(variables, cv, xyz1)

    np.testing.assert_array_equal(np.asarray(base), np.asarray(flagged))
    for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_flag)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padding_and_odd_sizes(rng):
    """Query counts that don't divide the tile size still round-trip."""
    xyz1 = jnp.asarray(rng.randn(1, 77, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.randn(1, 48, 3).astype(np.float32))
    level_sizes = (48, 24)

    pyr = jnp.asarray(rng.randn(1, 77, 72).astype(np.float32))
    got_idx, got_cost = correlation3d_knn_pallas(
        xyz1, xyz2, pyr, level_sizes, k=3, interpret=True
    )
    assert got_idx.shape == (1, 77, 6)
    assert got_cost.shape == (1, 77, 6)
    assert int(np.asarray(got_idx).max()) < 48


@pytest.mark.slow  # dead-kernel semantics pin (PERF.md gather-probe verdict)
def test_fused_tail_matches_xla_tail(rng):
    """corr3d_tail_pallas == the module's XLA tail (gather + cost MLP +
    merge), on both the plain and the int8+scale pyramid paths. Both runs
    share the same selection kernel output, so this isolates the tail."""
    from camliflow_tpu.ops.geometry import quantize_rows_int8
    from camliflow_tpu.ops.pallas_corr3d import prepare_corr3d_tail_params

    xyz1, xyz2, level_sizes, pyramid = _make_case(rng)
    module = Correlation3D(out_channels=64, k=8)
    variables = module.init(
        jax.random.PRNGKey(0), xyz1, xyz2, level_sizes, pyramid
    )
    tail = prepare_corr3d_tail_params(variables["params"])

    want = module.apply(variables, xyz1, xyz2, level_sizes, pyramid, fast=True)
    got = module.apply(
        variables, xyz1, xyz2, level_sizes, pyramid, fast=True,
        tail_params=tail,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )

    q, scale = quantize_rows_int8(jnp.concatenate(pyramid, axis=-1))
    want8 = module.apply(
        variables, xyz1, xyz2, level_sizes, q, fast=True, pyramid_scale=scale
    )
    got8 = module.apply(
        variables, xyz1, xyz2, level_sizes, q, fast=True, pyramid_scale=scale,
        tail_params=tail,
    )
    np.testing.assert_allclose(
        np.asarray(got8), np.asarray(want8), rtol=1e-4, atol=1e-5
    )


def test_module_flat_tail_bit_identical(rng, monkeypatch):
    """CAMLIFLOW_CORR3D_FLAT_TAIL=1: the flat [B, N*L*k, 4] payload tail
    produces BIT-identical Correlation3D output to the 4-D payload — the
    reshape + repeat-broadcast are value-preserving and the cost MLP
    contracts the same last dim row-for-row."""
    xyz1, xyz2, level_sizes, pyramid = _make_case(rng)
    module = Correlation3D(out_channels=64, k=8)
    variables = module.init(
        jax.random.PRNGKey(0), xyz1, xyz2, level_sizes, pyramid
    )

    monkeypatch.setenv("CAMLIFLOW_CORR3D_FLAT_TAIL", "0")
    want = module.apply(variables, xyz1, xyz2, level_sizes, pyramid)
    monkeypatch.setenv("CAMLIFLOW_CORR3D_FLAT_TAIL", "1")
    got = module.apply(variables, xyz1, xyz2, level_sizes, pyramid)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # gradients agree to f32 sum-order: the repeat VJP segment-sums the
    # xyz1 cotangent in a different accumulation order than the 4-D
    # broadcast VJP (~1e-5 relative on this case)
    def loss(v, flag):
        monkeypatch.setenv("CAMLIFLOW_CORR3D_FLAT_TAIL", flag)
        return jnp.sum(
            module.apply(v, xyz1, xyz2, level_sizes, pyramid, train=True) ** 2
        )

    g0 = jax.grad(loss)(variables, "0")
    g1 = jax.grad(loss)(variables, "1")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        g0,
        g1,
    )
