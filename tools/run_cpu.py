#!/usr/bin/env python
"""Run a repo CLI (train.py / eval.py / ...) on the CPU backend.

The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so the
env var cannot select CPU — and with the TPU tunnel busy or down, touching
the axon backend hangs. This wrapper flips the backend via jax.config BEFORE
anything touches devices, then executes the target script in-process.

Usage: python tools/run_cpu.py train.py trainset=... model=... [...]
"""

import runpy
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

script = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(str(REPO / script), run_name="__main__")
