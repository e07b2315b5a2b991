"""Tiny on-hardware probe for the tpu.dynamic_gather lowering (the one
mechanism every gated round-3 kernel shares). Compiles in seconds — run it
FIRST when the tunnel returns; the full check (hw_kernels_check.py) follows.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from camliflow_tpu.ops.pallas_gather import gather_points_kmajor

rng = np.random.RandomState(0)
print("devices:", jax.devices(), flush=True)
data = jnp.asarray(rng.randn(2, 256, 35).astype(np.float32))
idx = jnp.asarray(rng.randint(0, 256, size=(2, 96, 8)).astype(np.int32))
got = np.asarray(jax.jit(gather_points_kmajor)(data, idx))
want = np.stack(
    [np.asarray(data)[b][np.asarray(idx)[b]] for b in range(2)]
).transpose(0, 2, 1, 3)
d = np.max(np.abs(got - want))
print(f"dynamic_gather probe max|d| = {d:.3e}", flush=True)
assert d == 0.0, "DYNAMIC_GATHER LOWERING MISMATCH"
print("DYNAMIC_GATHER PROBE PASS", flush=True)
