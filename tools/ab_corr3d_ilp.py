#!/usr/bin/env python
"""Kernel-level one-process A/B of the corr3d ILP schedule.

`ilp` is a STATIC ARG of correlation3d_knn_pallas, so both variants live in
one jit cache (unlike TILE/UNROLL, which are trace-time env reads needing
subprocesses). Measures the selection kernel directly at flagship shapes
(N=2048, levels (2048,1024,512,256), k=16, int8 pyramid, with_cost=True),
scan-length-difference timed to cancel the tunnel dispatch floor.

Usage: python tools/ab_corr3d_ilp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from profile_components import LEVEL_SIZES_3D, N3D, time_scan

    from camliflow_tpu.ops.geometry import quantize_rows_int8
    from camliflow_tpu.ops.pallas_corr3d import correlation3d_knn_pallas

    rng = np.random.RandomState(0)
    xyz1 = jnp.asarray(rng.randn(1, N3D, 3).astype(np.float32))
    xyz2 = xyz1 + 0.05 * jnp.asarray(rng.randn(1, N3D, 3).astype(np.float32))
    pyr_q, _ = quantize_rows_int8(
        jnp.asarray(
            rng.randn(1, N3D, sum(LEVEL_SIZES_3D)).astype(np.float32)
        )
    )
    consts = {"xyz2": xyz2, "pyr": pyr_q}

    def make_step(ilp):
        def step(x1, k):
            idx, cost = correlation3d_knn_pallas(
                x1, k["xyz2"], k["pyr"], LEVEL_SIZES_3D, k=16, ilp=ilp
            )
            # consume both outputs fully (DCE trap) and keep the carry moving
            bump = jnp.sum(cost) + jnp.sum(idx.astype(jnp.float32))
            return x1 * (1.0 + 1e-12 * bump)

        return step

    # parity on-chip first (same inputs, both schedules)
    idx_a, cost_a = correlation3d_knn_pallas(
        xyz1, xyz2, pyr_q, LEVEL_SIZES_3D, k=16, ilp=False
    )
    idx_b, cost_b = correlation3d_knn_pallas(
        xyz1, xyz2, pyr_q, LEVEL_SIZES_3D, k=16, ilp=True
    )
    assert np.array_equal(np.asarray(idx_a), np.asarray(idx_b)), "idx mismatch"
    assert np.array_equal(
        np.asarray(cost_a), np.asarray(cost_b)
    ), "cost mismatch"
    print("on-chip bit-parity OK (idx + cost)", flush=True)

    for ilp in (False, True):
        time_scan(f"corr3d select ilp={int(ilp)}", make_step(ilp), xyz1, consts)

    # training-path variant (with_cost=False)
    def make_step_nc(ilp):
        def step(x1, k):
            idx, _ = correlation3d_knn_pallas(
                x1, k["xyz2"], None, LEVEL_SIZES_3D, k=16, with_cost=False,
                ilp=ilp,
            )
            return x1 * (1.0 + 1e-12 * jnp.sum(idx.astype(jnp.float32)))

        return step

    for ilp in (False, True):
        time_scan(
            f"corr3d nocost ilp={int(ilp)}", make_step_nc(ilp), xyz1, consts
        )


if __name__ == "__main__":
    main()
