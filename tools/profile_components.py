#!/usr/bin/env python
"""Per-component iteration-cost profiler for the CamLiRAFT hot path (TPU).

Times each in-loop component under a `lax.scan` inside ONE jit and reports
per-iteration ms via a scan-length difference (cancels dispatch floor and
fixed setup). Fixed-cost components are timed the same way (the "iteration"
is just a repeat of the op).

Usage: python tools/profile_components.py [group ...]
Groups: loop2d loop3d fixed full  (default: loop2d loop3d)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

# full-res CamLiRAFT geometry: 960x540 padded to 960x544, 1/8-res features
H8, W8 = 68, 120
HW = H8 * W8
N3D = 2048  # xyz1 level
LEVELS_2D = [(68, 120), (34, 60), (17, 30), (8, 15)]
LEVEL_SIZES_3D = (2048, 1024, 512, 256)


def fetch(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jax.device_get(jnp.sum(leaf).astype(jnp.float32)))


def time_scan(name, step, carry0, consts=None, lo=4, hi=24, reps=3):
    """step: (carry, consts) -> carry. Large arrays MUST ride in `consts`
    (jit args) — closure-captured constants get embedded in the HLO and
    overflow the remote-compile tunnel's request-size limit."""

    def factory(iters):
        @jax.jit
        def run(c, k):
            return jax.lax.scan(
                lambda c, _: (step(c, k), 0.0), c, None, length=iters
            )[0]

        return run

    times = {}
    for iters in (lo, hi):
        run = factory(iters)
        fetch(run(carry0, consts))  # compile + warmup
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(run(carry0, consts))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    per_iter = (times[hi] - times[lo]) / (hi - lo) * 1000
    print(f"{name:28s} {per_iter:8.3f} ms/iter   (call@{lo}={times[lo]*1e3:.1f}ms)")
    return per_iter


def rngs(*shapes, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(*s).astype(np.float32), dtype=dtype) for s in shapes]


def group_loop2d():
    from camliflow_tpu.models.raft import (
        FlowHead2D,
        GRU2D,
        MotionEncoder2D,
        UpdateBlock2D,
    )
    from camliflow_tpu.ops.correlation import corr_lookup_2d_padded
    from camliflow_tpu.ops.image import mesh_grid

    from camliflow_tpu.ops.correlation import pad_pyramid_for_lookup

    key = jax.random.PRNGKey(0)
    raw = [
        jnp.asarray(
            np.random.RandomState(i).randn(HW, h, w, 1).astype(np.float32)
        )
        for i, (h, w) in enumerate(LEVELS_2D)
    ]
    grid = mesh_grid(1, H8, W8)
    (flow0,) = rngs((1, H8, W8, 2))
    flow0 = flow0 * 3.0

    for storage in ("split", "bf16", "int8"):
        pyr = jax.jit(
            lambda p, s=storage: pad_pyramid_for_lookup(p, storage=s)
        )(raw)

        def lookup_step(flow, k, s=storage):
            corr = corr_lookup_2d_padded(k["pyr"], k["grid"] + flow, radius=4, storage=s)
            # consume EVERY channel (full reduce) — slicing lets XLA prune
            # the other levels' einsums entirely (DCE trap, verify skill)
            return flow * (1.0 + 1e-9 * jnp.mean(corr))

        time_scan(
            f"corr_lookup_2d[{storage}]", lookup_step, flow0,
            {"pyr": pyr, "grid": grid},
        )

    (corr0,) = rngs((1, H8, W8, 324), seed=1)
    me = MotionEncoder2D()
    me_vars = me.init(key, flow0, corr0)

    def me_step(c, k):
        flow, corr = c
        m = me.apply(k["vars"], flow, corr)
        return (m[..., -2:], corr * (1.0 + 1e-9 * jnp.mean(m)))

    time_scan("motion_encoder_2d", me_step, (flow0, corr0), {"vars": me_vars})

    h0, x0 = rngs((1, H8, W8, 128), (1, H8, W8, 256), seed=2)
    gru = GRU2D()
    gru_vars = gru.init(key, h0, x0)
    time_scan(
        "gru_2d",
        lambda h, k: gru.apply(k["vars"], h, k["x"]),
        h0,
        {"vars": gru_vars, "x": x0},
    )

    fh = FlowHead2D()
    fh_vars = fh.init(key, h0)

    def fh_step(h, k):
        d = fh.apply(k["vars"], h)
        return h * (1.0 + 1e-9 * jnp.mean(d))

    time_scan("flow_head_2d", fh_step, h0, {"vars": fh_vars})

    # whole 2D iteration (RAFT update block, no upsample; exact split pyramid)
    ub = UpdateBlock2D(upsample_each=False)
    pyr_split = jax.jit(lambda p: pad_pyramid_for_lookup(p, storage="split"))(raw)
    ub_consts = {"pyramid": pyr_split, "grid": grid, "x": x0[..., :128]}
    ub_vars = ub.init(key, (h0, flow0), ub_consts)

    def ub_step(c, k):
        return ub.apply(k["vars"], c, k["consts"])[0]

    time_scan(
        "update_block_2d (full)",
        ub_step,
        (h0, flow0),
        {"vars": ub_vars, "consts": ub_consts},
    )


def group_loop3d():
    from camliflow_tpu.models.camliraft_l import (
        Correlation3D,
        FlowHead3D,
        GRU3D,
        MotionEncoder3D,
    )
    from camliflow_tpu.nn.clfm import CLFM, fusion_interp_cache
    from camliflow_tpu.ops.geometry import backwarp_3d, k_nearest_neighbor

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    xyz1 = jnp.asarray(rng.randn(1, N3D, 3).astype(np.float32))
    xyz2 = xyz1 + 0.05 * jnp.asarray(rng.randn(1, N3D, 3).astype(np.float32))
    pyramid = [
        jnp.asarray(rng.randn(1, N3D, m).astype(np.float32)) for m in LEVEL_SIZES_3D
    ]
    knn_indices = k_nearest_neighbor(xyz1, xyz1, k=32)
    (flow0,) = rngs((1, N3D, 3))
    flow0 = flow0 * 0.02

    def warp_step(flow, k):
        w = backwarp_3d(k["xyz1"], k["xyz2"], flow, fast=True)
        return flow + 1e-6 * (w - k["xyz1"])

    time_scan("backwarp_3d (fast)", warp_step, flow0, {"xyz1": xyz1, "xyz2": xyz2})

    corr3 = Correlation3D(out_channels=128, k=16)
    c3_vars = corr3.init(key, xyz1, xyz2, LEVEL_SIZES_3D, pyramid)
    c3_consts = {"vars": c3_vars, "xyz1": xyz1, "xyz2": xyz2, "pyr": pyramid}

    for fast, label in (
        (True, "correlation_3d (pallas)"),
        (False, "correlation_3d (xla)"),
    ):

        def c3_step(flow, k, fast=fast):
            w = backwarp_3d(k["xyz1"], k["xyz2"], flow, fast=True)
            c = corr3.apply(
                k["vars"], k["xyz1"], w, LEVEL_SIZES_3D, k["pyr"], fast=fast
            )
            return flow + 1e-6 * c[..., :3]

        time_scan(label, c3_step, flow0, c3_consts)

    (corr0,) = rngs((1, N3D, 128), seed=3)
    me = MotionEncoder3D()
    me_vars = me.init(key, xyz1, flow0, corr0, knn_indices)
    dw_me = me.apply(me_vars, xyz1, knn_indices, method=me.precompute_weights)
    me_consts = {"vars": me_vars, "xyz1": xyz1, "knn": knn_indices, "dw": dw_me}

    def me_step(c, k):
        flow, corr = c
        m = me.apply(k["vars"], k["xyz1"], flow, corr, k["knn"], dw=k["dw"])
        return (m[..., -3:], corr * (1.0 + 1e-9 * jnp.mean(m)))

    time_scan("motion_encoder_3d", me_step, (flow0, corr0), me_consts)

    h0, x0 = rngs((1, N3D, 128), (1, N3D, 256), seed=4)
    gru = GRU3D()
    gru_vars = gru.init(key, xyz1, h0, x0, knn_indices)
    dw_gru = gru.apply(gru_vars, xyz1, knn_indices, method=gru.precompute_weights)
    gru_consts = {
        "vars": gru_vars,
        "xyz1": xyz1,
        "x": x0,
        "knn": knn_indices,
        "dw": dw_gru,
    }
    time_scan(
        "gru_3d",
        lambda h, k: gru.apply(k["vars"], k["xyz1"], h, k["x"], k["knn"], dw=k["dw"]),
        h0,
        gru_consts,
    )

    fh = FlowHead3D()
    fh_vars = fh.init(key, xyz1, h0, knn_indices)
    dw_fh = fh.apply(fh_vars, xyz1, knn_indices, method=fh.precompute_weights)
    fh_consts = {"vars": fh_vars, "xyz1": xyz1, "knn": knn_indices, "dw": dw_fh}

    def fh_step(h, k):
        d = fh.apply(k["vars"], k["xyz1"], h, k["knn"], dw=k["dw"])
        return h * (1.0 + 1e-9 * jnp.mean(d))

    time_scan("flow_head_3d", fh_step, h0, fh_consts)

    # CLFM fusions at in-loop sizes
    uv1 = jnp.stack(
        [
            jnp.asarray(rng.uniform(0, W8 - 1, (1, N3D)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, H8 - 1, (1, N3D)).astype(np.float32)),
        ],
        axis=-1,
    )
    cache = fusion_interp_cache(uv1, H8, W8)
    (f2d_324,) = rngs((1, H8, W8, 324), seed=5)
    (f3d_128,) = rngs((1, N3D, 128), seed=6)
    clfm_corr = CLFM(324, 128)
    cc_vars = clfm_corr.init(key, uv1, f2d_324, f3d_128, interp_cache=cache)
    cc_consts = {"vars": cc_vars, "uv": uv1, "cache": cache}

    def cc_step(c, k):
        a, b = c
        return clfm_corr.apply(k["vars"], k["uv"], a, b, interp_cache=k["cache"])

    time_scan("clfm_corr (324,128)", cc_step, (f2d_324, f3d_128), cc_consts)

    (f2d_128,) = rngs((1, H8, W8, 128), seed=7)
    clfm_m = CLFM(128, 128)
    cm_vars = clfm_m.init(key, uv1, f2d_128, f3d_128, interp_cache=cache)
    cm_consts = {"vars": cm_vars, "uv": uv1, "cache": cache}

    def cm_step(c, k):
        a, b = c
        return clfm_m.apply(k["vars"], k["uv"], a, b, interp_cache=k["cache"])

    time_scan("clfm_motion (128,128)", cm_step, (f2d_128, f3d_128), cm_consts)


def group_loopfull():
    """One full CamLiRAFT fused iteration (2D + 3D + CLFM), as in the model."""
    from camliflow_tpu.models.camliraft import FusedUpdateBlock
    from camliflow_tpu.nn.clfm import fusion_interp_cache
    from camliflow_tpu.ops.correlation import pad_pyramid_for_lookup
    from camliflow_tpu.ops.geometry import k_nearest_neighbor
    from camliflow_tpu.ops.image import mesh_grid

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    raw = [
        jnp.asarray(rng.randn(HW, h, w, 1).astype(np.float32))
        for (h, w) in LEVELS_2D
    ]
    xyz1 = jnp.asarray(rng.randn(1, N3D, 3).astype(np.float32))
    xyzs2 = [
        jnp.asarray(rng.randn(1, m, 3).astype(np.float32))
        for m in LEVEL_SIZES_3D
    ]
    pyramid_3d = [
        jnp.asarray(rng.randn(1, N3D, m).astype(np.float32))
        for m in LEVEL_SIZES_3D
    ]
    uv1 = jnp.stack(
        [
            jnp.asarray(rng.uniform(0, W8 - 1, (1, N3D)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, H8 - 1, (1, N3D)).astype(np.float32)),
        ],
        axis=-1,
    )
    pc1 = jnp.asarray(rng.randn(1, 8192, 3).astype(np.float32))
    knn_indices = k_nearest_neighbor(xyz1, xyz1, k=32)
    up_idx = k_nearest_neighbor(xyz1, pc1, k=3)

    for fast in (False, True):
        storage = "int8" if fast else "split"
        block = FusedUpdateBlock(
            upsample_each=False, fast_inference=fast, lookup_storage=storage,
            name="update",
        )
        consts = {
            "xyz1": xyz1,
            "xyzs2": xyzs2,
            "uv1": uv1,
            "grid": mesh_grid(1, H8, W8),
            "x_2d": jnp.asarray(rng.randn(1, H8, W8, 128).astype(np.float32)),
            "x_3d": jnp.asarray(rng.randn(1, N3D, 128).astype(np.float32)),
            "pyramid_2d": jax.jit(
                lambda p: pad_pyramid_for_lookup(p, storage=storage)
            )(raw),
            "pyramid_3d": pyramid_3d,
            "knn_indices": knn_indices,
            "up_idx": up_idx,
            "up_weights": jnp.full((1, 8192, 3), 1.0 / 3),
            "interp_cache_uv1": fusion_interp_cache(uv1, H8, W8),
        }
        h2 = jnp.asarray(rng.randn(1, H8, W8, 128).astype(np.float32))
        h3 = jnp.asarray(rng.randn(1, N3D, 128).astype(np.float32))
        carry0 = (
            h2,
            h3,
            jnp.zeros((1, H8, W8, 2)),
            jnp.zeros((1, N3D, 3)),
        )
        variables = block.init(key, carry0, consts)
        consts["dw"] = block.apply(
            variables, xyz1, knn_indices, method=block.precompute
        )

        def step(c, k):
            return block.apply(k["vars"], c, k["consts"])[0]

        time_scan(
            f"fused update block (fast={fast})",
            step,
            carry0,
            {"vars": variables, "consts": consts},
        )


def group_fixed():
    from camliflow_tpu.models.raft import ConvexUpsampler2D
    from camliflow_tpu.nn.clfm import fusion_interp_cache
    from camliflow_tpu.nn.resnet import ResNetEncoder2D
    from camliflow_tpu.ops.correlation import (
        all_pairs_correlation_pyramid,
        pad_pyramid_for_lookup,
    )
    from camliflow_tpu.ops.geometry import build_pc_pyramid, k_nearest_neighbor

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 544, 960, 3).astype(np.float32))
    enc = ResNetEncoder2D(depth=50)
    enc_vars = enc.init(key, images)

    def enc_step(x, k):
        f = enc.apply(k["vars"], x)
        return x * (1.0 + 1e-9 * jnp.mean(f))

    time_scan("resnet50 (2 frames)", enc_step, images, {"vars": enc_vars}, lo=2, hi=8)

    f1, f2 = rngs((1, H8, W8, 256), (1, H8, W8, 256), seed=8)

    def pyr_step(c, k):
        a, b = c
        pyr = all_pairs_correlation_pyramid(a, b, 4)
        pyr = pad_pyramid_for_lookup(pyr)
        return (a * (1.0 + 1e-9 * jnp.mean(pyr[0])), b)

    time_scan("all_pairs pyramid + pad", pyr_step, (f1, f2), lo=2, hi=8)

    pc1 = jnp.asarray(rng.randn(1, 8192, 3).astype(np.float32))
    pc2 = pc1 + 0.05

    def fps_step(c, k):
        xyzs1, xyzs2, _, _ = build_pc_pyramid(
            c, k["pc2"], [4096, 2048, 1024, 512, 256]
        )
        return c * (1.0 + 1e-9 * jnp.mean(xyzs1[-1]))

    time_scan("build_pc_pyramid (FPS)", fps_step, pc1, {"pc2": pc2}, lo=2, hi=8)

    xyz1 = jnp.asarray(rng.randn(1, N3D, 3).astype(np.float32))

    def knn_step(c, k):
        idx = k_nearest_neighbor(c, c, k=32)
        return c * (1.0 + 1e-9 * jnp.mean(idx.astype(jnp.float32)))

    time_scan("knn 2048x2048 k=32", knn_step, xyz1, lo=2, hi=8)

    def up_knn_step(c, k):
        idx = k_nearest_neighbor(k["xyz1"], c, k=3)
        return c * (1.0 + 1e-9 * jnp.mean(idx.astype(jnp.float32)))

    time_scan("knn up 2048->8192 k=3", up_knn_step, pc1, {"xyz1": xyz1}, lo=2, hi=8)

    from camliflow_tpu.models.camliraft_l import (
        Encoder3D,
        build_cost_volume_pyramid_3d,
    )

    xyzs1, xyzs2, _, _ = jax.jit(
        lambda a, b: build_pc_pyramid(a, b, [4096, 2048, 1024, 512, 256])
    )(pc1, pc2)
    stacked = [jnp.concatenate([a, b], axis=0) for a, b in zip(xyzs1[:3], xyzs2[:3])]
    enc3 = Encoder3D()
    enc3_vars = enc3.init(key, stacked)

    def enc3_step(c, k):
        f = enc3.apply(k["vars"], c)[2]
        return [x * (1.0 + 1e-9 * jnp.mean(f)) for x in c]

    time_scan(
        "encoder3d (2-frame stack)", enc3_step, stacked, {"vars": enc3_vars}, lo=2, hi=8
    )

    feat1, feat2 = rngs((1, N3D, 128), (1, N3D, 128), seed=11)

    def pyr3_step(c, k):
        pyr = build_cost_volume_pyramid_3d(c[0], c[1], k["xyzs2"])
        return (c[0] * (1.0 + 1e-9 * jnp.mean(pyr[-1])), c[1])

    time_scan(
        "cost_volume_pyramid_3d",
        pyr3_step,
        (feat1, feat2),
        {"xyzs2": xyzs2[2:]},
        lo=2,
        hi=8,
    )

    uv1 = jnp.asarray(rng.uniform(0, 60, (1, N3D, 2)).astype(np.float32))

    def cache_step(c, k):
        idx, off = fusion_interp_cache(c, H8, W8)
        return c * (1.0 + 1e-9 * jnp.mean(off))

    time_scan("fusion_interp_cache", cache_step, uv1, lo=2, hi=8)

    h0, flow0 = rngs((1, H8, W8, 128), (1, H8, W8, 2), seed=9)
    ups = ConvexUpsampler2D()
    ups_vars = ups.init(key, h0, flow0)

    def ups_step(c, k):
        u = ups.apply(k["vars"], c[0], c[1])
        return (c[0] * (1.0 + 1e-9 * jnp.mean(u)), c[1])

    time_scan("convex_upsampler", ups_step, (h0, flow0), {"vars": ups_vars}, lo=2, hi=8)


def group_full():
    sys.path.insert(0, ".")
    import bench

    forward, variables, inputs = bench.build(1)
    fetch(forward(variables, inputs)["flow_2d"])
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(forward(variables, inputs)["flow_2d"])
        print(f"full camliraft forward: {(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    groups = sys.argv[1:] or ["loop2d", "loop3d"]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for g in groups:
        print(f"--- {g} ---", flush=True)
        globals()[f"group_{g}"]()
