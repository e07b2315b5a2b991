#!/usr/bin/env python
"""Device-synced whole-model timing + fast-vs-exact numerics measurement.

Usage:
  python tools/measure_model.py time [camliraft|camliraft_l|raft] [n_steps]
  python tools/measure_model.py numerics   # fast-vs-exact flow deltas on chip
  python tools/measure_model.py bytes      # compiled cost_analysis() summary

`numerics` is the on-hardware gate for the approximate fast path
(model.fast_inference): it runs the SAME inputs through fast_inference=auto
(int8 lookup + Pallas kernels + bf16 gathers on TPU) and fast_inference=off
(exact path) and reports max |flow delta| — the verify skill asserts the
documented envelope (~1e-2 px 2D, ~1e-4 m 3D).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def build(model_name, n_iters=20, fast="auto"):
    import os

    from bench import make_inputs
    from camliflow_tpu.models.factory import model_factory
    from camliflow_tpu.utils.config import load_yaml

    cfgs = load_yaml(f"conf/model/{model_name}.yaml")["model"]
    cfgs["n_iters_eval"] = n_iters
    cfgs["fast_inference"] = fast
    if os.environ.get("MEASURE_COMPUTE_DTYPE"):
        cfgs["compute_dtype"] = os.environ["MEASURE_COMPUTE_DTYPE"]
    if os.environ.get("MEASURE_LOOKUP_STORAGE"):
        cfgs["lookup_storage"] = os.environ["MEASURE_LOOKUP_STORAGE"]
    spec = model_factory(cfgs)
    inputs = make_inputs(
        1,
        with_images=model_name in ("camliraft", "raft"),
        with_pcs=model_name in ("camliraft", "camliraft_l"),
    )
    model = spec.module_cls(cfgs=cfgs.to_dict(), train_mode=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)

    @jax.jit
    def forward(variables, inputs):
        return model.apply(variables, inputs)

    return forward, variables, inputs


def sync(result, key):
    leaf = result[key]
    return float(jnp.sum(leaf[(0,) * (leaf.ndim - 1)][0]))


def cmd_time(model_name="camliraft", n_steps=10):
    out_key = "flow_2d" if model_name in ("camliraft", "raft") else "flow_3d"
    forward, variables, inputs = build(model_name)
    t0 = time.perf_counter()
    sync(forward(variables, inputs), out_key)
    print(f"compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    sync(forward(variables, inputs), out_key)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = forward(variables, inputs)
        sync(out, out_key)
        best = min(best, (time.perf_counter() - t0) / n_steps)
    print(f"{model_name}: {best*1e3:.1f} ms/frame = {1/best:.2f} fps", flush=True)


def cmd_numerics(models=("camliraft",)):
    """Default: flagship only — each (model, mode) pair costs a ~10 min
    full-res compile; camliraft exercises every fast-path kernel the other
    models use."""
    for model_name in models:
        outs = {}
        for mode in ("auto", "off"):
            forward, variables, inputs = build(model_name, fast=mode)
            out = forward(variables, inputs)
            outs[mode] = jax.tree.map(np.asarray, out)
            print(f"{model_name} fast={mode} done", flush=True)
        for key in ("flow_2d", "flow_3d"):
            if key not in outs["auto"]:
                continue
            delta = np.abs(outs["auto"][key] - outs["off"][key])
            scale = np.abs(outs["off"][key]).max()
            print(
                f"{model_name} {key}: max|fast-exact|={delta.max():.3e} "
                f"mean={delta.mean():.3e} scale={scale:.3g}", flush=True,
            )


def build_train(model_name="camliraft"):
    """Training-step closure at the PERF.md protocol (640x384, bs=2,
    n_iters_train=10): returns (train_step, state, batch, cfgs). Shared by
    cmd_train and tools/device_trace.py's train mode.
    MEASURE_COMPUTE_DTYPE / MEASURE_TRAIN_SHAPE env overrides apply."""
    import os

    from camliflow_tpu.models.factory import (
        model_factory,
        optimizer_factory,
    )
    from camliflow_tpu.runtime.train_state import TrainState, make_train_step
    from camliflow_tpu.utils.config import Config, load_yaml

    cfgs = load_yaml(f"conf/model/{model_name}.yaml")["model"]
    cfgs["n_iters_train"] = 10
    cfgs["batch_size"] = 2
    if os.environ.get("MEASURE_COMPUTE_DTYPE"):
        cfgs["compute_dtype"] = os.environ["MEASURE_COMPUTE_DTYPE"]
    if os.environ.get("MEASURE_LOSS_IN_SCAN"):
        cfgs["loss_in_scan"] = os.environ["MEASURE_LOSS_IN_SCAN"] != "0"
    if os.environ.get("MEASURE_REMAT_SCAN"):
        cfgs["remat_scan"] = os.environ["MEASURE_REMAT_SCAN"] != "0"
    spec = model_factory(cfgs)

    rng = np.random.RandomState(0)
    b, h, w, n = 2, 384, 640, 8192
    if os.environ.get("MEASURE_TRAIN_SHAPE"):  # "b,h,w,n" (CPU smoke tests)
        b, h, w, n = (int(x) for x in
                      os.environ["MEASURE_TRAIN_SHAPE"].split(","))
    images = rng.randint(0, 255, size=(b, h, w, 6)).astype(np.float32)
    pc1 = rng.randn(b, n, 3).astype(np.float32)
    pc1[..., 2] = np.abs(pc1[..., 2]) * 15.0 + 5.0
    pc2 = pc1 + 0.05 * rng.randn(b, n, 3).astype(np.float32)
    batch = {
        "images": jnp.asarray(images),
        "pcs": jnp.asarray(np.concatenate([pc1, pc2], axis=-1)),
        "intrinsics": jnp.asarray(
            np.tile([1050.0, (w - 1) / 2, (h - 1) / 2], (b, 1)).astype(
                np.float32
            )
        ),
        "flow_2d": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
        "flow_3d": jnp.asarray(pc2 - pc1),
    }

    model = spec.module_cls(cfgs=cfgs.to_dict(), train_mode=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    training_cfgs = Config(
        {
            "opt": "adamw", "weight_decay": 1e-6, "grad_max_norm": 1,
            "epochs": 1, "lr_2d": 2e-4, "lr_3d": 2e-3, "warmup_epochs": 0,
            "min_lr": 1e-5,
        }
    )
    tx = optimizer_factory(training_cfgs, variables["params"], steps_per_epoch=10)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    train_step = make_train_step(model, spec.loss_fn, tx, cfgs, donate=False)
    return train_step, state, batch, cfgs


def cmd_train(model_name="camliraft", n_steps=5):
    """Device-synced training-step timing (fwd+bwd+adamw), PERF.md protocol:
    640x384 images, bs=2, n_iters_train=10. MEASURE_COMPUTE_DTYPE=bfloat16
    gives the AMP A/B."""
    train_step, state, batch, cfgs = build_train(model_name)
    b, w, h = batch["images"].shape[0], batch["images"].shape[2], batch["images"].shape[1]

    t0 = time.perf_counter()
    state, loss, _, _ = train_step(state, batch)
    float(loss)  # device sync
    print(f"compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    state, loss, _, _ = train_step(state, batch)
    float(loss)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, loss, _, _ = train_step(state, batch)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / n_steps)
    print(
        f"{model_name} train step (bs={b}, {w}x{h}, 10 iters): "
        f"{best*1e3:.1f} ms = {b/best:.2f} pairs/sec/chip "
        f"(compute_dtype={cfgs.get('compute_dtype', 'float32')})",
        flush=True,
    )


def cmd_compile(models=("camliraft",)):
    """AOT compile-only smoke: lower + backend-compile each model's eval
    forward at FULL resolution on the real chip, no execution. This is the
    cheap gate (one compile, no timing loop) that every default-path kernel
    or formulation change MUST pass before landing — round 3 shipped a
    Mosaic-uncompilable default because only interpret-mode tests ran.
    Exit code = number of models that failed to compile."""
    failed = 0
    for model_name in models:
        t0 = time.perf_counter()
        try:
            forward, variables, inputs = build(model_name)
            forward.lower(variables, inputs).compile()
            print(f"{model_name}: compile OK "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            failed += 1
            print(f"{model_name}: COMPILE FAILED ({time.perf_counter()-t0:.0f}s) "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    raise SystemExit(failed)


def cmd_bytes():
    from bench import make_inputs
    from camliflow_tpu.models.factory import model_factory
    from camliflow_tpu.utils.config import load_yaml

    cfgs = load_yaml("conf/model/camliraft.yaml")["model"]
    cfgs["n_iters_eval"] = 20
    spec = model_factory(cfgs)
    inputs = make_inputs(1)
    model = spec.module_cls(cfgs=cfgs.to_dict(), train_mode=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    compiled = (
        jax.jit(lambda v, i: model.apply(v, i)).lower(variables, inputs).compile()
    )
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    print(f"bytes accessed: {cost.get('bytes accessed', 0)/1e9:.2f} GB; "
          f"flops: {cost.get('flops', 0)/1e9:.1f} G", flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "time":
        cmd_time(*(sys.argv[2:3] or ["camliraft"]),
                 *(int(a) for a in sys.argv[3:4]))
    elif cmd == "numerics":
        cmd_numerics(tuple(sys.argv[2:]) or ("camliraft",))
    elif cmd == "train":
        cmd_train(*(sys.argv[2:3] or ["camliraft"]),
                  *(int(a) for a in sys.argv[3:4]))
    elif cmd == "compile":
        cmd_compile(tuple(sys.argv[2:]) or ("camliraft",))
    elif cmd == "bytes":
        cmd_bytes()
    else:
        raise SystemExit(f"unknown command {cmd}")
