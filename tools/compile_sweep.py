#!/usr/bin/env python
"""Compile-ability sweep over the supported fast-path flag matrix.

Round 3 shipped a Mosaic-uncompilable DEFAULT because interpret-mode tests
can't catch backend lowering failures, and no single run exercised the
storage x flag combinations users can reach. This tool AOT lower+compiles
the flagship eval forward (and optionally the train step) on the real chip
for every SUPPORTED combination — no execution, no timing loop — and exits
with the number of failures.

Usage:
  python tools/compile_sweep.py            # eval combos (default set)
  python tools/compile_sweep.py train      # train combos only
  python tools/compile_sweep.py all        # everything (~1h: many full-res
                                           # compiles in one process)

Each combo is a (name, env, build) triple; env vars are set before the
trace (all CAMLIFLOW_* gates are read at trace time). Combos documented as
broken on this toolchain (e.g. CORR3D_APPROX, the five dead gather kernels
— PERF.md round-4 gather-probe verdict) are intentionally NOT in the matrix:
the sweep guards what we ship, not what we archived.
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, ".")

EVAL_COMBOS = [
    # (name, env overrides) — build(model, fast=...) via MEASURE_* envs
    ("default-auto", {}),
    ("exact-off", {"MEASURE_FAST": "off"}),
    ("storage-bf16", {"MEASURE_LOOKUP_STORAGE": "bf16"}),
    ("corr-bf16-out", {"CAMLIFLOW_CORR_BF16_OUT": "1"}),
    ("corr3d-tile128", {"CAMLIFLOW_CORR3D_TILE": "128"}),
    # h-major is the default since 2026-08-20; guard the legacy layout too
    ("lookup-wmajor", {"CAMLIFLOW_LOOKUP_HMAJOR": "0"}),
    ("lookup-mmblend", {"CAMLIFLOW_LOOKUP_MMBLEND": "1"}),
    ("lookup-fold", {"CAMLIFLOW_LOOKUP_FOLD": "1"}),
    (
        "lookup-fold-wmajor",
        {"CAMLIFLOW_LOOKUP_FOLD": "1", "CAMLIFLOW_LOOKUP_HMAJOR": "0"},
    ),
]

TRAIN_COMBOS = [
    ("train-default", {}),
    # the Trainer's default since round 5 (training.amp=true -> bf16
    # train compute); measure_model reaches it via the env override
    ("train-amp-bf16", {"MEASURE_COMPUTE_DTYPE": "bfloat16"}),
    ("train-no-pallas-select", {"CAMLIFLOW_CORR3D_TRAIN_SELECT": "0"}),
    ("train-loss-in-scan", {"MEASURE_LOSS_IN_SCAN": "1"}),
    ("train-remat", {"MEASURE_REMAT_SCAN": "1"}),
]

_SWEEP_KEYS = (
    "MEASURE_FAST",
    "MEASURE_LOOKUP_STORAGE",
    "MEASURE_LOSS_IN_SCAN",
    "MEASURE_REMAT_SCAN",
    "CAMLIFLOW_CORR_BF16_OUT",
    "CAMLIFLOW_CORR3D_TILE",
    "CAMLIFLOW_CORR3D_TRAIN_SELECT",
    "CAMLIFLOW_LOOKUP_FOLD",
    "CAMLIFLOW_LOOKUP_HMAJOR",
    "CAMLIFLOW_LOOKUP_MMBLEND",
)


def _with_env(env):
    for key in _SWEEP_KEYS:
        os.environ.pop(key, None)
    os.environ.update(env)


def run_eval_combo(name, env):
    from tools.measure_model import build

    _with_env(env)
    fast = env.get("MEASURE_FAST", "auto")
    forward, variables, inputs = build("camliraft", fast=fast)
    forward.lower(variables, inputs).compile()


def run_train_combo(name, env):
    from tools.measure_model import build_train

    _with_env(env)
    train_step, state, batch, _ = build_train("camliraft")
    train_step.lower(state, batch).compile()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "eval"
    combos = []
    if which in ("eval", "all"):
        combos += [(n, e, run_eval_combo) for n, e in EVAL_COMBOS]
    if which in ("train", "all"):
        combos += [(n, e, run_train_combo) for n, e in TRAIN_COMBOS]
    failed = 0
    for name, env, runner in combos:
        t0 = time.perf_counter()
        try:
            runner(name, env)
            print(f"{name}: compile OK ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            failed += 1
            print(
                f"{name}: COMPILE FAILED ({time.perf_counter()-t0:.0f}s) "
                f"{type(e).__name__}: {str(e)[:300]}",
                flush=True,
            )
    print(f"sweep: {len(combos) - failed}/{len(combos)} OK", flush=True)
    raise SystemExit(failed)


if __name__ == "__main__":
    main()
