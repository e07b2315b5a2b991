#!/usr/bin/env python
"""A/B the corr3d selection-kernel knobs on the real chip.

The kernel is serial-step bound (PERF.md round-3: chunking halved the
per-step scan width with zero ms/call change), so the levers are (a) wider
query tiles = fewer kernel instances = fewer total serial steps, and (b)
Python-unrolled extraction loops = no fori_loop carry overhead.

Runs each (CAMLIFLOW_CORR3D_TILE, CAMLIFLOW_CORR3D_UNROLL) config in a
SUBPROCESS — the knobs are read at trace time and the jit cache does not
key on env, so one process cannot A/B them.

Usage: python tools/ab_corr3d.py            # 4-config sweep
       python tools/ab_corr3d.py child      # one config (env already set)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from profile_components import LEVEL_SIZES_3D, N3D, rngs, time_scan

    from camliflow_tpu.models.camliraft_l import Correlation3D
    from camliflow_tpu.ops.geometry import backwarp_3d

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    xyz1 = jnp.asarray(rng.randn(1, N3D, 3).astype(np.float32))
    xyz2 = xyz1 + 0.05 * jnp.asarray(rng.randn(1, N3D, 3).astype(np.float32))
    pyramid = [
        jnp.asarray(rng.randn(1, N3D, m).astype(np.float32))
        for m in LEVEL_SIZES_3D
    ]
    (flow0,) = rngs((1, N3D, 3))
    flow0 = flow0 * 0.02

    corr3 = Correlation3D(out_channels=128, k=16)
    c3_vars = corr3.init(key, xyz1, xyz2, LEVEL_SIZES_3D, pyramid)
    # match the in-model fast path: int8 pyramid + per-row scales
    # (camliraft_l.py quantize_rows_int8 consts) — the f32 variant sits at
    # 31.5M and XLA's scoped-vmem promotion of the loop-const operand then
    # OOMs nondeterministically at the 16M limit
    from camliflow_tpu.ops.geometry import quantize_rows_int8

    pyr_q, pyr_scale = quantize_rows_int8(jnp.concatenate(pyramid, axis=-1))
    consts = {
        "vars": c3_vars, "xyz1": xyz1, "xyz2": xyz2,
        "pyr": pyr_q, "scale": pyr_scale,
    }

    def c3_step(flow, k):
        w = backwarp_3d(k["xyz1"], k["xyz2"], flow, fast=True)
        c = corr3.apply(
            k["vars"], k["xyz1"], w, LEVEL_SIZES_3D, k["pyr"], fast=True,
            pyramid_scale=k["scale"],
        )
        return flow + 1e-6 * c[..., :3]

    tag = (
        f"tile={os.environ.get('CAMLIFLOW_CORR3D_TILE', '256')} "
        f"unroll={os.environ.get('CAMLIFLOW_CORR3D_UNROLL', '0')} "
        f"ilp={os.environ.get('CAMLIFLOW_CORR3D_ILP', '0')}"
    )
    time_scan(f"corr3d pallas {tag}", c3_step, flow0, consts)


# (tile, unroll, ilp) triples; pass names on argv to run a subset, e.g.
# `python tools/ab_corr3d.py baseline ilp`
CONFIGS = {
    "baseline": ("256", "0", "0"),
    "tile512": ("512", "0", "0"),
    "tile1024": ("1024", "0", "0"),
    "tile2048": ("2048", "0", "0"),
    "ilp": ("256", "0", "1"),
    "ilp512": ("512", "0", "1"),
}


def main(names):
    names = names or ["baseline", "tile512", "tile1024", "tile2048"]
    for name in names:
        tile, unroll, ilp = CONFIGS[name]
        env = dict(os.environ)
        env["CAMLIFLOW_CORR3D_TILE"] = tile
        env["CAMLIFLOW_CORR3D_UNROLL"] = unroll
        env["CAMLIFLOW_CORR3D_ILP"] = ilp
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "child"],
                env=env, capture_output=True, text=True,
                timeout=int(os.environ.get("AB_CHILD_TIMEOUT", "1200")),
            )
        except subprocess.TimeoutExpired:
            # a degraded remote-compile service can blow the per-child
            # budget — report and keep sweeping the remaining configs
            print(f"{name}: child timed out", flush=True)
            continue
        out = (r.stdout + r.stderr).strip().splitlines()
        hits = [l for l in out if "corr3d pallas" in l]
        print(hits[-1] if hits else f"{name}: no result line", flush=True)
        if r.returncode != 0:
            print(f"  (rc={r.returncode}) " + "\n  ".join(out[-6:]), flush=True)


if __name__ == "__main__":
    if sys.argv[1:2] == ["child"]:
        child()
    else:
        main(sys.argv[1:])
