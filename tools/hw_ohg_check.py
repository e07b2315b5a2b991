#!/usr/bin/env python
"""On-chip validation for the one-hot MXU gather kernel (ops/pallas_ohg.py).

Runs, at the flagship's in-loop shapes (N = M = 2048):
  1. compile + bit-parity vs the XLA fast-path tail for each (k, C) the
     refinement scan uses;
  2. a scan-amortised timing A/B: Pallas kernel vs the XLA
     gather+multiply+max chain (20 steps inside one jit, device-synced).

Usage: python tools/hw_ohg_check.py
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from camliflow_tpu.ops.pallas_ohg import dw_conv_ohg, pack_dw  # noqa: E402

CASES = [  # (k, C) of the nine in-loop PointConvDW convs
    (16, 128),  # me conv_c1
    (32, 32),   # me conv_f1
    (16, 16),   # me conv_f2
    (16, 125),  # me conv
    (4, 256),   # gru conv_zr (paired)
    (4, 128),   # gru conv_q
    (32, 128),  # flow head conv1
    (32, 64),   # flow head conv2
]


def xla_chain(feats, idx, w):
    knn = jax.vmap(lambda f, i: f[i])(feats, idx)
    return jnp.max(knn * w, axis=2).astype(jnp.float32)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]))  # scalar fetch: real device sync via the tunnel
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch, n = 1, 2048
    for k, c in CASES:
        key = jax.random.PRNGKey(k * 997 + c)
        k1, k2, k3 = jax.random.split(key, 3)
        feats = jax.random.normal(k1, (batch, n, c)).astype(jnp.bfloat16)
        idx = jax.random.randint(k2, (batch, n, k), 0, n)
        w = jax.random.normal(k3, (batch, n, k, c)).astype(jnp.bfloat16)
        pack = pack_dw(w, idx)
        assert pack is not None, (k, c)

        @jax.jit
        def run_pallas(feats, pack=pack, k=k):
            def body(f, _):
                o = dw_conv_ohg(f, pack["idx_km"], pack["w_km"], k)
                # feed a hash of the output back so the scan can't be DCE'd
                return f + (jnp.sum(o) * 0).astype(f.dtype), jnp.sum(o)
            f, sums = jax.lax.scan(body, feats, None, length=20)
            return sums

        @jax.jit
        def run_xla(feats, idx=idx, w=w):
            def body(f, _):
                o = xla_chain(f, idx, w)
                return f + (jnp.sum(o) * 0).astype(f.dtype), jnp.sum(o)
            f, sums = jax.lax.scan(body, feats, None, length=20)
            return sums

        got = np.asarray(
            jax.jit(lambda f: dw_conv_ohg(f, pack["idx_km"], pack["w_km"], k))(
                feats
            )
        )
        want = np.asarray(jax.jit(lambda f: xla_chain(f, idx, w))(feats))
        exact = np.array_equal(got, want)
        t_p = timed(run_pallas, feats) / 20 * 1e3
        t_x = timed(run_xla, feats) / 20 * 1e3
        print(
            f"k={k:2d} C={c:3d}: bit-exact={exact} "
            f"pallas {t_p:.3f} ms/iter vs xla {t_x:.3f} ms/iter "
            f"({t_x / t_p:.2f}x)",
            flush=True,
        )
        if not exact:
            print(
                f"  max|diff|={np.abs(got - want).max():.3e}", flush=True
            )


if __name__ == "__main__":
    main()
