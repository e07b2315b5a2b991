#!/usr/bin/env python
"""Benchmark: inference throughput on one chip.

Prints ONE JSON line for the driver: the primary CamLiRAFT metric
{"metric", "value", "unit", "vs_baseline"} with the other two headline
models (CamLiRAFT-L, RAFT) embedded under "secondary" so every round's
BENCH_r{N}.json records all three.

North star (BASELINE.json): >= 50 frame-pairs/sec/chip at 960x540 images +
8192 points (CamLiRAFT, n_iters_eval=20), stated for TPU v5p; this
environment measures v5e (see BASELINE.md for the bandwidth extrapolation).
"""

import json
import sys
import time

import jax

# persistent compilation cache: full-res CamLiRAFT takes minutes to compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 50.0  # frame-pairs/sec/chip target from BASELINE.json


def make_inputs(batch_size: int, with_images=True, with_pcs=True):
    rng = np.random.RandomState(0)
    height, width, n_points = 540, 960, 8192
    inputs = {
        "intrinsics": jnp.asarray(
            np.tile([1050.0, 479.5, 269.5], (batch_size, 1)).astype(np.float32)
        )
    }
    if with_images:
        images = rng.randint(0, 255, size=(batch_size, height, width, 6))
        inputs["images"] = jnp.asarray(images.astype(np.float32))
    if with_pcs:
        pc1 = rng.randn(batch_size, n_points, 3).astype(np.float32)
        pc1[..., 2] = np.abs(pc1[..., 2]) * 15.0 + 5.0
        pc2 = pc1 + 0.05 * rng.randn(batch_size, n_points, 3).astype(np.float32)
        inputs["pcs"] = jnp.asarray(np.concatenate([pc1, pc2], axis=-1))
    return inputs


def build(model_name: str, batch_size: int, n_iters: int = 20):
    from camliflow_tpu.models.factory import model_factory
    from camliflow_tpu.utils.config import load_yaml

    cfgs = load_yaml(f"conf/model/{model_name}.yaml")["model"]
    cfgs["n_iters_eval"] = n_iters
    spec = model_factory(cfgs)
    inputs = make_inputs(
        batch_size,
        with_images=model_name in ("camliraft", "raft"),
        with_pcs=model_name in ("camliraft", "camliraft_l"),
    )
    model = spec.module_cls(cfgs=cfgs.to_dict(), train_mode=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)

    @jax.jit
    def forward(variables, inputs):
        return model.apply(variables, inputs)

    return forward, variables, inputs


def measure(model_name: str, batch_size: int = 1, n_steps: int = 10):
    """frame-pairs/sec at bs=1 (the model is latency-bound: PERF.md measured
    bs=4 at the same per-pair time, so the second compile is not worth the
    bench budget)."""
    forward, variables, inputs = build(model_name, batch_size)
    out_key = "flow_2d" if model_name in ("camliraft", "raft") else "flow_3d"

    def sync(result):
        # a host fetch of a fresh scalar drains the in-order device queue;
        # block_until_ready alone does not synchronise through the remote-TPU
        # tunnel used in this environment
        leaf = result[out_key]
        return float(jnp.sum(leaf[(0,) * (leaf.ndim - 1)][0]))

    sync(forward(variables, inputs))  # compile + warmup
    sync(forward(variables, inputs))

    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = forward(variables, inputs)
    sync(out)
    dt = time.perf_counter() - t0
    return batch_size * n_steps / dt


def main():
    # fail fast if the remote-TPU tunnel is down: jax.devices() on the axon
    # backend blocks forever, which would silently burn the entire bench
    # budget. First device contact is seconds when the tunnel is up.
    import threading

    devices = []
    probe = threading.Thread(
        target=lambda: devices.extend(jax.devices()), daemon=True
    )
    probe.start()
    probe.join(timeout=300)
    if not devices:
        print("TPU unreachable: jax.devices() timed out", file=sys.stderr)
        sys.exit(1)

    result = {
        "metric": "camliraft_inference_960x540_8192pts",
        "value": 0.0,
        "unit": "frame-pairs/sec/chip",
        "vs_baseline": 0.0,
        "batch_size": 1,
        "n_iters": 20,
        # the 50 fps north star is stated for TPU v5p (BASELINE.md); this
        # environment measures on whatever chip the tunnel exposes.
        "baseline_hw": "v5p",
        "measured_hw": str(jax.devices()[0].device_kind),
        "device": str(jax.devices()[0].device_kind),
        "secondary": [],
    }
    # Deadline watchdog: the remote-compile service has shown hour-scale
    # degradation windows (2026-08-19: a tiny matmul compile took >7 min).
    # A compile that blocks forever cannot be interrupted in-process, so at
    # the deadline print whatever has finished and hard-exit 0 — one partial
    # JSON line always beats an empty BENCH_r*.json. BENCH_DEADLINE_S=0
    # disables.
    import os
    import threading

    deadline = float(os.environ.get("BENCH_DEADLINE_S", "10800"))
    finished = threading.Event()

    def watchdog():
        if not finished.wait(timeout=deadline):
            result["deadline_hit"] = True
            print(json.dumps(result), flush=True)
            os._exit(0)

    if deadline > 0:
        threading.Thread(target=watchdog, daemon=True).start()

    # EVERY model is try/except-wrapped — round 3's lesson: one flagship
    # compile failure must never leave an empty BENCH_r*.json. A failed
    # flagship keeps value=0 but the secondaries (and the error) still land.
    try:
        fps = measure("camliraft")
        result["value"] = round(fps, 3)
        result["vs_baseline"] = round(fps / BASELINE_FPS, 4)
    except Exception as e:
        print(f"camliraft failed: {type(e).__name__}: {e}", file=sys.stderr)
        result["error"] = f"{type(e).__name__}: {str(e)[:500]}"
    for name, metric in (
        ("camliraft_l", "camliraft_l_inference_8192pts"),
        ("raft", "raft_inference_960x540"),
    ):
        try:
            sec_fps = measure(name)
            result["secondary"].append(
                {
                    "metric": metric,
                    "value": round(sec_fps, 3),
                    "unit": "frame-pairs/sec/chip",
                }
            )
        except Exception as e:  # secondary models must not sink the bench
            print(f"{name} failed: {type(e).__name__}: {e}", file=sys.stderr)
    finished.set()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
