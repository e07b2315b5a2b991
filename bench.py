#!/usr/bin/env python
"""Benchmark: CamLiRAFT inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.json): >= 50 frame-pairs/sec/chip at 960x540 images +
8192 points (CamLiRAFT, n_iters_eval=20).
"""

import json
import os
import sys
import time

import jax

# persistent compilation cache: full-res CamLiRAFT takes minutes to compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 50.0  # frame-pairs/sec/chip target from BASELINE.json


def build(batch_size: int, n_iters: int = 20):
    from camliflow_tpu.models import camliraft as m
    from camliflow_tpu.utils.config import load_yaml

    cfgs = load_yaml("conf/model/camliraft.yaml")["model"]
    cfgs["n_iters_eval"] = n_iters

    rng = np.random.RandomState(0)
    height, width, n_points = 540, 960, 8192
    images = rng.randint(0, 255, size=(batch_size, height, width, 6)).astype(
        np.float32
    )
    pc1 = rng.randn(batch_size, n_points, 3).astype(np.float32)
    pc1[..., 2] = np.abs(pc1[..., 2]) * 15.0 + 5.0
    pc2 = pc1 + 0.05 * rng.randn(batch_size, n_points, 3).astype(np.float32)
    inputs = {
        "images": jnp.asarray(images),
        "pcs": jnp.asarray(np.concatenate([pc1, pc2], axis=-1)),
        "intrinsics": jnp.asarray(
            np.tile([1050.0, 479.5, 269.5], (batch_size, 1)).astype(np.float32)
        ),
    }

    model = m.CamLiRAFT(cfgs=cfgs.to_dict(), train_mode=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)

    @jax.jit
    def forward(variables, inputs):
        return model.apply(variables, inputs)

    return forward, variables, inputs


def main():
    # the model is latency-bound (batching does not amortise): measure small
    # batch sizes and report the best frame-pairs/sec
    best = None
    for batch_size in (1, 4):
        try:
            forward, variables, inputs = build(batch_size)

            def sync(result):
                # a host fetch of a fresh scalar drains the in-order device
                # queue; block_until_ready alone does not synchronise through
                # the remote-TPU tunnel used in this environment
                return float(jnp.sum(result["flow_2d"][0, 0, 0]))

            sync(forward(variables, inputs))  # compile + warmup
            sync(forward(variables, inputs))

            n_steps = 10
            t0 = time.perf_counter()
            for _ in range(n_steps):
                out = forward(variables, inputs)
            sync(out)
            dt = time.perf_counter() - t0

            fps = batch_size * n_steps / dt
            if best is None or fps > best["value"]:
                best = {
                    "metric": "camliraft_inference_960x540_8192pts",
                    "value": round(fps, 3),
                    "unit": "frame-pairs/sec/chip",
                    "vs_baseline": round(fps / BASELINE_FPS, 4),
                    "batch_size": batch_size,
                    "n_iters": 20,
                    # the 50 fps north star is stated for TPU v5p
                    # (BASELINE.md); this environment measures on whatever
                    # chip the tunnel exposes — record both.
                    "baseline_hw": "v5p",
                    "measured_hw": str(jax.devices()[0].device_kind),
                    "device": str(jax.devices()[0].device_kind),
                }
        except Exception as e:  # OOM at this batch size -> skip it
            print(f"batch_size={batch_size} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if best is None:
        raise SystemExit("all batch sizes failed")
    print(json.dumps(best))


if __name__ == "__main__":
    main()
