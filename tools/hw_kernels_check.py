"""On-hardware parity check for the gated Pallas kernels.

Runs the fused kernels with interpret=False on the real chip against the
exact Flax modules at realistic flagship shapes. Max deltas printed; the
interpret-mode tests already pin CPU semantics, this pins the Mosaic
lowering.

Each kernel family validates in its own section wrapped in try/except so a
Mosaic crash in one kernel cannot abort the rest of the (unattended) queue —
the per-kernel flags flip independently, so partial results are actionable.
Exit code = number of failed sections.
"""
import sys
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

rng = np.random.RandomState(0)
print("devices:", jax.devices(), flush=True)

FAILED = []


def check(name, got, want, scale_ref=None):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    d = np.max(np.abs(got - want))
    s = np.max(np.abs(want if scale_ref is None else scale_ref))
    print(f"{name}: max|d|={d:.3e} scale={s:.3e} rel={d/max(s,1e-9):.3e}",
          flush=True)
    return d, s


def section(name):
    def deco(fn):
        t0 = time.time()
        print(f"--- section: {name} ---", flush=True)
        try:
            fn()
            print(f"--- section {name} OK ({time.time()-t0:.0f}s) ---",
                  flush=True)
        except Exception:
            FAILED.append(name)
            print(f"--- section {name} FAILED ({time.time()-t0:.0f}s) ---",
                  flush=True)
            traceback.print_exc()
            sys.stdout.flush()
            sys.stderr.flush()
        return fn
    return deco


@section("clfm")
def _clfm():
    from camliflow_tpu.nn.clfm import CLFM, fusion_interp_cache
    from camliflow_tpu.ops.pallas_clfm import (
        clfm_fused_pallas,
        grid_sample_cache,
        hoist_interp_score,
        prepare_clfm_params,
    )

    for c2, c3 in ((324, 128), (128, 128)):
        b, h, w, n = 1, 68, 120, 8192
        t0 = time.time()
        clfm = CLFM(c2, c3)
        feat_2d = jnp.asarray(rng.randn(b, h, w, c2).astype(np.float32))
        feat_3d = jnp.asarray(rng.randn(b, n, c3).astype(np.float32))
        uv = jnp.asarray(
            (rng.rand(b, n, 2) * [w - 1, h - 1]).astype(np.float32)
        )
        cache = fusion_interp_cache(uv, h, w)
        variables = clfm.init(
            jax.random.PRNGKey(0), uv, feat_2d, feat_3d, interp_cache=cache
        )
        o2_ref, o3_ref = jax.jit(
            lambda v, u, f2, f3: clfm.apply(v, u, f2, f3, interp_cache=cache)
        )(variables, uv, feat_2d, feat_3d)

        params = prepare_clfm_params(variables["params"])
        score = hoist_interp_score(variables["params"]["interp"], cache[1])
        tap_idx, tap_w = grid_sample_cache(uv, h, w)
        o2, o3 = clfm_fused_pallas(
            feat_2d, feat_3d, score, cache[0], tap_idx, tap_w, params,
            interpret=False,
        )
        check(f"clfm({c2},{c3}) out2d", o2, o2_ref)
        check(f"clfm({c2},{c3}) out3d", o3, o3_ref)
        print(f"  ({time.time()-t0:.0f}s)", flush=True)


@section("update3d")
def _update3d():
    from camliflow_tpu.models.camliraft_l import (
        FlowHead3D,
        GRU3D,
        MotionEncoder3D,
    )
    from camliflow_tpu.ops.geometry import k_nearest_neighbor
    from camliflow_tpu.ops.pallas_update3d import (
        gru_flowhead_3d_pallas,
        motion_encoder_3d_pallas,
        prepare_gru_flowhead_3d_params,
        prepare_motion_encoder_3d_params,
        to_kernel_layout,
    )

    n = 8192
    xyz = jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32))
    knn = k_nearest_neighbor(xyz, xyz, 32)

    flow = jnp.asarray(
        0.1 * rng.standard_normal((1, n, 3)).astype(np.float32)
    )
    corr = jnp.asarray(rng.standard_normal((1, n, 128)).astype(np.float32))
    module = MotionEncoder3D()
    mvars = module.init(jax.random.PRNGKey(0), xyz, flow, corr, knn)
    want = jax.jit(
        lambda v: module.apply(v, xyz, flow, corr, knn, fast=True)
    )(mvars)
    dw = module.apply(mvars, xyz, knn, method=MotionEncoder3D.precompute_weights)
    dw = to_kernel_layout(
        jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), dw)
    )
    me_p = prepare_motion_encoder_3d_params(mvars["params"])
    got = motion_encoder_3d_pallas(flow, corr, knn, dw, me_p)
    check("motion_encoder_3d", got, want)

    h0 = jnp.asarray(rng.standard_normal((1, n, 128)).astype(np.float32))
    x3d = jnp.asarray(rng.standard_normal((1, n, 64)).astype(np.float32))
    motion = jnp.asarray(
        rng.standard_normal((1, n, 128)).astype(np.float32)
    )
    x = jnp.concatenate([x3d, motion], axis=-1)
    gru = GRU3D(hidden_dim=128)
    gvars = gru.init(jax.random.PRNGKey(1), xyz, h0, x, knn)
    head = FlowHead3D()
    hvars = head.init(jax.random.PRNGKey(2), xyz, h0, knn)
    h_want = jax.jit(lambda v: gru.apply(v, xyz, h0, x, knn, fast=True))(gvars)
    d_want = jax.jit(lambda v: head.apply(v, xyz, h_want, knn, fast=True))(
        hvars
    )
    dwg = {
        **gru.apply(gvars, xyz, knn, method=GRU3D.precompute_weights),
        "flow_conv1": head.apply(
            hvars, xyz, knn, method=FlowHead3D.precompute_weights
        )["conv1"],
        "flow_conv2": head.apply(
            hvars, xyz, knn, method=FlowHead3D.precompute_weights
        )["conv2"],
    }
    dwg = to_kernel_layout(
        jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), dwg)
    )
    gf_p = prepare_gru_flowhead_3d_params(gvars["params"], hvars["params"])
    h_got, d_got = gru_flowhead_3d_pallas(h0, x3d, motion, knn, dwg, gf_p)
    check("gru_3d hidden", h_got, h_want)
    check("flowhead_3d delta", d_got, d_want)


@section("corr3d_tail")
def _corr3d_tail():
    from camliflow_tpu.models.camliraft_l import (
        Correlation3D,
        build_cost_volume_pyramid_3d,
    )
    from camliflow_tpu.ops.geometry import quantize_rows_int8
    from camliflow_tpu.ops.pallas_corr3d import prepare_corr3d_tail_params

    b, n = 1, 4096
    level_sizes = (2048, 1024, 512, 256)
    xyz1 = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    xyz2 = jnp.asarray(
        rng.standard_normal((b, level_sizes[0], 3)).astype(np.float32)
    )
    f1 = jnp.asarray(rng.standard_normal((b, n, 64)).astype(np.float32))
    f2 = jnp.asarray(
        rng.standard_normal((b, level_sizes[0], 64)).astype(np.float32)
    )
    xyzs2 = [xyz2[:, :m] for m in level_sizes]
    pyr = build_cost_volume_pyramid_3d(f1, f2, xyzs2)
    module = Correlation3D(out_channels=128, k=16)
    cvars = module.init(jax.random.PRNGKey(3), xyz1, xyz2, level_sizes, pyr)
    q, scale = quantize_rows_int8(jnp.concatenate(pyr, axis=-1))
    want = jax.jit(
        lambda v: module.apply(
            v, xyz1, xyz2, level_sizes, q, fast=True, pyramid_scale=scale
        )
    )(cvars)
    got = jax.jit(
        lambda v: module.apply(
            v, xyz1, xyz2, level_sizes, q, fast=True, pyramid_scale=scale,
            tail_params=prepare_corr3d_tail_params(v["params"]),
        )
    )(cvars)
    check("corr3d_tail", got, want)


@section("pallas_gather")
def _pallas_gather():
    from camliflow_tpu.ops.geometry import gather_points
    from camliflow_tpu.ops.pallas_gather import gather_points_kmajor

    gdata = jnp.asarray(rng.standard_normal((2, 4096, 67)).astype(np.float32))
    gidx = jnp.asarray(
        rng.randint(0, 4096, size=(2, 2048, 16)).astype(np.int32)
    )
    g_got = jax.jit(lambda d, i: gather_points_kmajor(d, i))(gdata, gidx)
    g_want = jnp.transpose(gather_points(gdata, gidx), (0, 2, 1, 3))
    check("pallas_gather", g_got, g_want)


@section("fps_gather")
def _fps_gather():
    from camliflow_tpu.ops import pallas_fps

    pc = jnp.asarray(rng.standard_normal((2, 8192, 3)).astype(np.float32))
    base = np.asarray(
        pallas_fps._fps_pallas_impl(pc, 4096, interpret=False,
                                    coord_gather=False)
    )
    gat = np.asarray(
        pallas_fps._fps_pallas_impl(pc, 4096, interpret=False,
                                    coord_gather=True)
    )
    d = int(np.sum(base != gat))
    print(f"fps coord-gather mismatches: {d}", flush=True)
    assert d == 0, "FPS DYNAMIC-GATHER MISMATCH"

    for name, flag in (("onehot", False), ("gather", True)):
        r = pallas_fps._fps_pallas_impl(pc, 4096, interpret=False,
                                        coord_gather=flag)
        float(jnp.sum(r[0, :1]))  # sync
        t0 = time.time()
        for _ in range(10):
            r = pallas_fps._fps_pallas_impl(pc, 4096, interpret=False,
                                            coord_gather=flag)
        float(jnp.sum(r[0, :1]))
        print(f"fps {name}: {(time.time()-t0)/10*1000:.2f} ms/call",
              flush=True)


@section("fused_pyramid")
def _fused_pyramid():
    # padded_pyramid_from_features (one einsum/level vs padded pooled
    # frame-2 features) vs the two-step build+pool+pad+quant, at the
    # flagship's level-0 shape (960x540 /8 = 120x68). Parity: dequantised
    # values within one int8 step; timing: 10-call loop, device-synced.
    from camliflow_tpu.ops.correlation import (
        all_pairs_correlation_pyramid,
        pad_pyramid_for_lookup,
        padded_pyramid_from_features,
    )

    h, w, c = 68, 120, 256
    f1 = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))

    two_step = jax.jit(
        lambda a, b: pad_pyramid_for_lookup(
            all_pairs_correlation_pyramid(a, b, 4), 4, storage="int8"
        )
    )
    fused = jax.jit(
        lambda a, b: padded_pyramid_from_features(
            a, b, num_levels=4, radius=4, storage="int8"
        )
    )
    want, got = two_step(f1, f2), fused(f1, f2)
    for lvl, ((gq, gs), (wq, ws)) in enumerate(zip(got, want)):
        gv = np.asarray(gq, np.float32) * np.asarray(gs)[:, None, None]
        wv = np.asarray(wq, np.float32) * np.asarray(ws)[:, None, None]
        step = np.asarray(ws)[:, None, None] + 1e-12
        worst = float(np.max(np.abs(gv - wv) / step))
        print(f"fused_pyramid L{lvl}: worst |d|/qstep = {worst:.3f}",
              flush=True)
        assert worst <= 1.5, f"L{lvl} exceeds one quant step: {worst}"

    for name, fn in (("two_step", two_step), ("fused", fused)):
        out = fn(f1, f2)
        float(jnp.sum(out[0][0][0, :1].astype(jnp.float32)))  # sync
        t0 = time.time()
        for _ in range(10):
            out = fn(f1, f2)
        float(jnp.sum(out[0][0][0, :1].astype(jnp.float32)))
        print(f"fused_pyramid {name}: {(time.time()-t0)/10*1000:.2f} ms/call",
              flush=True)


if FAILED:
    print(f"HW KERNEL CHECK: {len(FAILED)} section(s) FAILED: {FAILED}",
          flush=True)
else:
    print("HW KERNEL CHECK FULLY DONE (all sections OK)", flush=True)
sys.exit(len(FAILED))
