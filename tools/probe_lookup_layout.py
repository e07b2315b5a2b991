#!/usr/bin/env python
"""Probe: 2D lookup one-hot einsum chain — w-major vs h-major table layout.

The in-model fast-path lookup (ops/correlation.py::corr_lookup_2d_padded)
contracts the level-0 selection as
    stage1: [rows, Q, w] x [rows, w, h] -> [rows, Q, h]   (h = 68 lanes)
    stage2: [rows, Q*h'] ...             -> [rows, Q, P]
i.e. the fat stage-1 einsum emits h=68 output lanes — 53% MXU column
utilisation at the flagship's 960x540/8 level-0 (w=120, h=68). Storing the
table h-major flips the contraction:
    stage1: [rows, P, h] x [rows, h, w] -> [rows, P, w]   (w = 120 lanes)
    stage2: contract w between two [rows, *, w] operands  -> [rows, Q, P]
same FLOPs, 94% lanes on the fat stage. This probe times both chains (plus
the two-tap folded variants) standalone at level-0 shape, one-hot built from
coords in-step exactly like the model (iota + compare + cast), outputs fully
consumed. Scan-length-difference timing cancels the tunnel dispatch floor.

Small compiles (~1 min each even on a degraded remote-compile service) —
decision data BEFORE building a gated model path.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from profile_components import time_scan

    rows, w, h = 8160, 120, 68
    r = 4
    span, patch = 2 * r + 1, 2 * r + 2
    rng = np.random.RandomState(0)
    table_f = rng.randn(rows, w, h).astype(np.float32)
    table_wmaj = jnp.asarray(table_f).astype(jnp.bfloat16)  # [rows, w, h]
    table_hmaj = jnp.asarray(
        table_f.transpose(0, 2, 1)
    ).astype(jnp.bfloat16)  # [rows, h, w]
    coords0 = jnp.asarray(
        rng.rand(rows, 2).astype(np.float32) * np.array([w - 1, h - 1])
    )
    consts = {"wmaj": table_wmaj, "hmaj": table_hmaj}

    def onehot(start, ids, n_taps):
        taps = jax.lax.broadcasted_iota(jnp.int32, (1, n_taps, 1), 1)
        return (ids == start[:, None, None] + taps).astype(jnp.bfloat16)

    def twotap(start, frac, ids, n_taps):
        taps = jax.lax.broadcasted_iota(jnp.int32, (1, n_taps, 1), 1)
        t = start[:, None, None] + taps
        f = frac[:, None, None].astype(jnp.bfloat16)
        return (ids == t).astype(jnp.bfloat16) * (jnp.bfloat16(1) - f) + (
            ids == t + 1
        ).astype(jnp.bfloat16) * f

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h), 2)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)

    def prep(c):
        cx = jnp.clip(c[:, 0], -(r + 1.0), w + r)
        cy = jnp.clip(c[:, 1], -(r + 1.0), h + r)
        x0, y0 = jnp.floor(cx), jnp.floor(cy)
        return (
            (x0 - r).astype(jnp.int32), (y0 - r).astype(jnp.int32),
            cx - x0, cy - y0,
        )

    def blend(patches, fx, fy):
        fx = fx[:, None, None]
        fy = fy[:, None, None]
        return (
            (1.0 - fx) * (1.0 - fy) * patches[:, :-1, :-1]
            + (1.0 - fx) * fy * patches[:, :-1, 1:]
            + fx * (1.0 - fy) * patches[:, 1:, :-1]
            + fx * fy * patches[:, 1:, 1:]
        )

    def consume(c, out):
        return c * (1.0 + 1e-12 * jnp.sum(out)) + 1e-3

    # A) current w-major exact chain: Q=patch col stage then row stage
    def step_wmaj(c, k):
        sx, sy, fx, fy = prep(c)
        col_sel = onehot(sx, col_ids, patch)  # [rows, P, w]
        row_sel = onehot(sy, row_ids, patch)  # [rows, P, h]
        cslab = jnp.einsum(
            "rqw,rwh->rqh", col_sel, k["wmaj"],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        patches = jnp.einsum(
            "rth,rph->rtp", cslab, row_sel, preferred_element_type=jnp.float32
        )
        return consume(c, blend(patches, fx, fy))

    # B) h-major exact chain: row stage first (fat stage emits w lanes)
    def step_hmaj(c, k):
        sx, sy, fx, fy = prep(c)
        col_sel = onehot(sx, col_ids, patch)
        row_sel = onehot(sy, row_ids, patch)
        rslab = jnp.einsum(
            "rph,rhw->rpw", row_sel, k["hmaj"],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        patches = jnp.einsum(
            "rqw,rpw->rqp", col_sel, rslab, preferred_element_type=jnp.float32
        )
        return consume(c, blend(patches, fx, fy))

    # C) folded two-tap, w-major (the CAMLIFLOW_LOOKUP_FOLD formulation)
    def step_fold_wmaj(c, k):
        sx, sy, fx, fy = prep(c)
        col_sel = twotap(sx, fx, col_ids, span)
        row_sel = twotap(sy, fy, row_ids, span)
        cslab = jnp.einsum(
            "rqw,rwh->rqh", col_sel, k["wmaj"],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        out = jnp.einsum(
            "rth,rph->rtp", cslab, row_sel, preferred_element_type=jnp.float32
        )
        return consume(c, out)

    # D) folded two-tap, h-major
    def step_fold_hmaj(c, k):
        sx, sy, fx, fy = prep(c)
        col_sel = twotap(sx, fx, col_ids, span)
        row_sel = twotap(sy, fy, row_ids, span)
        rslab = jnp.einsum(
            "rph,rhw->rpw", row_sel, k["hmaj"],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        out = jnp.einsum(
            "rqw,rpw->rqp", col_sel, rslab, preferred_element_type=jnp.float32
        )
        return consume(c, out)

    names = {
        "A exact w-major (current)": step_wmaj,
        "B exact h-major": step_hmaj,
        "C fold w-major (FOLD gate)": step_fold_wmaj,
        "D fold h-major": step_fold_hmaj,
    }
    only = sys.argv[1:]
    for name, step in names.items():
        if only and not any(s in name for s in only):
            continue
        time_scan(name, step, coords0, consts)


if __name__ == "__main__":
    main()
