"""Pallas TPU kernel for the Correlation3D neighbour selection.

Correlation3D (reference camliraft_l_core.py:40-101) runs every refinement
iteration: for each of 4 prefix-nested pyramid levels, select the k nearest
warped frame-2 points per query and gather (a) their relative positions and
(b) their cost-volume entries. The XLA selection path (dense distance matrix
+ 4 hierarchical lax.top_k) spends its time in top_k's sort network and the
[B, N, M] HBM round-trips.

This kernel does all 4 levels' selections in one VMEM-resident pass per
query tile: distance tile on the MXU (levels are column-prefixes of one
matrix), then per level k exact (min + first-index tie-break) extraction
passes on the VPU, landing indices in an accumulator via one-hot lane
selects. The (rel_xyz, cost) payload gathers stay in XLA — measured 2.6x
faster than extracting the payload in-kernel with masked reductions (the
extra in-kernel passes cost more than two batched XLA gathers).

Output: [B, N, L*k] int32 indices into the warped cloud, grouped by level,
each level's neighbours in ascending-distance order with the same
lowest-index tie-break as `knn_from_dists` — bit-compatible with the XLA
path.

The selection is forward-only (no VJP): the refinement cores use it for
inference; training keeps the differentiable XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import _on_tpu

# 256-query tiles: halves the per-tile fori_loop overhead vs 128. The
# round-2 OOM at 256 (16.04 MB scoped vmem) was with in-kernel payload
# extraction; the selection-only kernel fits comfortably.
# CAMLIFLOW_CORR3D_TILE overrides for A/B runs (the kernel is serial-step
# bound, so fewer/wider tiles shift the step-count/VMEM trade).
# NB: TILE/UNROLL are read at TRACE time inside the jit-cached
# correlation3d_knn_pallas — the jit cache keys only on args, so changing
# them mid-process is silently ignored. A/B them across fresh processes
# (tools/ab_corr3d.py runs each config in a subprocess for this reason).
_TILE_N = 256


def _tile_n() -> int:
    import os

    return int(os.environ.get("CAMLIFLOW_CORR3D_TILE", str(_TILE_N)))


def _serial_loop(n_steps: int, body, state):
    """fori_loop or a Python unroll (CAMLIFLOW_CORR3D_UNROLL=1).

    fori_loop(unroll=...) does not lower inside Pallas on this toolchain
    (MLIR closed_call KeyError), but a trace-time Python unroll produces
    straight-line Mosaic with no loop-carry overhead — the A/B knob for the
    step-overhead hypothesis (PERF.md: chunking halved the scan work per
    step yet ms/call stayed flat)."""
    import os

    if os.environ.get("CAMLIFLOW_CORR3D_UNROLL", "0") != "0":
        for j in range(n_steps):
            state = body(j, state)
        return state
    return jax.lax.fori_loop(0, n_steps, body, state)


def _ilp_enabled() -> bool:
    """CAMLIFLOW_CORR3D_ILP=1: run step j of all INDEPENDENT selection
    loops in one fused loop body (4 chunk scans over disjoint dist_ref
    columns, then the 3+ level merges over disjoint carries) — 112 -> 32
    serial steps per tile at the model's (2048,1024,512,256)/k=16,
    bit-identical values.

    ADJUDICATED NEGATIVE on-chip 2026-08-19 (tools/ab_corr3d_ilp.py,
    bit-parity OK): with_cost 0.624 -> 1.230 ms/iter, nocost 0.329 ->
    0.973. fori_loop carries round-trip VMEM on this Mosaic, so fusing N
    loops multiplies per-step carry traffic by ~N — fewer steps lose to
    fatter state, the same shape as the round-3 interleave+unroll loss.
    The kernel is pass-work-bound, not step-latency-bound; the flag stays
    "0" (kept for future-toolchain re-tests)."""
    import os

    return os.environ.get("CAMLIFLOW_CORR3D_ILP", "0") != "0"


def _corr3d_knn_kernel(
    *refs,
    level_sizes,
    k,
    compute_dtype=jnp.float32,
    with_cost=True,
    ilp=False,
):
    """Chunked prefix selection.

    The levels are column-prefixes of one distance matrix, so the k-nearest
    of level l equals a k-way MERGE of the k-nearest of its disjoint column
    chunks [m_{l+1}, m_l). Each chunk is selected ONCE and shared by every
    level containing it — total selection columns drop from sum(m_l) (each
    level re-scanning its whole prefix) to m_0, about half at the model's
    (2048,1024,512,256). During a chunk's selection the masked-reduce cost
    extraction runs against every containing level's pyramid block (same
    total extraction work as before); merges then carry (dist, idx, cost)
    triples and preserve the ascending-distance, lowest-index-first order
    bit-exactly.

    `with_cost=False` (the TRAINING-path selection, whose cost extraction
    output would be discarded — Pallas bodies cannot be dead-code-eliminated
    from outside): no pyramid ref is passed, all masked-reduce cost
    extraction passes and their output writes are skipped.
    """
    if with_cost:
        (xyz1_ref, xyz2_ref, pyr_ref, idx_out_ref, cost_out_ref,
         dist_ref, acc_ref, cost_acc_ref) = refs
    else:
        xyz1_ref, xyz2_ref, idx_out_ref, dist_ref, acc_ref = refs
    n_queries = xyz1_ref.shape[1]
    n_levels = len(level_sizes)
    q = xyz1_ref[0].astype(jnp.float32)  # [T, 3]
    p = xyz2_ref[0].astype(jnp.float32)  # [M0, 3]
    d_full = -2.0 * jax.lax.dot_general(
        q,
        p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d_full = d_full + jnp.sum(q * q, axis=-1)[:, None]
    d_full = d_full + jnp.sum(p * p, axis=-1)[None, :]
    # approx mode packs (bf16-rounded distance, column index) into ONE s32
    # sort key: bitcast(f32(bf16(max(d, 0)))) | col. The bf16 round zeroes
    # the low 16 mantissa bits (so OR-ing col < 2^16 is lossless), and
    # non-negative f32 bit patterns order like their values — a single s32
    # min-reduction per step returns the min distance AND the lowest-index
    # tie-break, the winner mask (keys == kmin) is unique (keys are
    # distinct), and the separate idx-extraction min + its where() pass
    # disappear. Selection semantics: ascending bf16 distance, lowest index
    # first — selection can flip only between bf16-equal neighbours, and the
    # per-level cost/payload sum is order-invariant within a level
    # (camliraft_l.py:192), so only k-boundary swaps of near-equidistant
    # points differ from the exact path.
    approx16 = compute_dtype == jnp.bfloat16
    if approx16:
        d_rounded = jnp.maximum(d_full, 0.0).astype(jnp.bfloat16)
        keys = jax.lax.bitcast_convert_type(
            d_rounded.astype(jnp.float32), jnp.int32
        ) | jax.lax.broadcasted_iota(jnp.int32, d_full.shape, 1)
        # ... but STORE and REDUCE the keys as f32: non-negative f32 bit
        # patterns order identically as integers and as floats, and f32
        # min-reductions have the fast VPU path while s32 reductions lower
        # ~50% slower (measured on-chip 2026-08-19: s32-key chain 1.143
        # ms/iter vs 0.758 exact). Only the [T, 1] winner is bitcast back
        # to s32 to unpack its index.
        dist_ref[...] = jax.lax.bitcast_convert_type(keys, jnp.float32)
    else:
        dist_ref[...] = d_full

    sizes = list(level_sizes)  # descending
    bounds = [0] + sizes[::-1]  # ascending chunk boundaries
    # chunk c covers columns [bounds[c], bounds[c+1]); level l uses chunks
    # 0..(n_levels-1-l)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (n_queries, k), 1)
    # (f32 +inf marks removed entries in both modes: packed keys are always
    # finite — their exponent field never reaches 0xFF)

    # per-chunk k-best + one cost row per containing level. Exact mode
    # carries (dist f32, idx s32) pairs; approx mode carries the packed s32
    # keys (idx embedded). Cost accumulators are f32 in both modes — the
    # [T, k] accumulator selects then always pair a 32-bit mask with 32-bit
    # operands (Mosaic cannot relayout i1 vectors across lane bitwidths;
    # that relayout was the round-3 approx compile failure).
    chunk_d = []  # exact: f32 distances; approx: s32 keys
    chunk_i = []  # exact only (approx indices ride the keys)
    chunk_cost = []  # chunk_cost[c][l] for levels l with m_l >= bounds[c+1]
    # ilp mode: defer the chunk loops and fuse their step-j bodies into one
    # loop (the chunks read/write disjoint dist_ref columns — independent
    # dependency chains; requires every chunk to run the same k steps).
    # Values are identical either way; only the instruction interleaving
    # changes.
    chunk_jobs = []  # (body, state0) when deferred
    fuse_chunks = ilp and all(
        min(k, bounds[c + 1] - bounds[c]) == k for c in range(len(bounds) - 1)
    )
    for c in range(len(bounds) - 1):
        lo, hi = bounds[c], bounds[c + 1]
        width = hi - lo
        cols = lo + jax.lax.broadcasted_iota(
            jnp.int32, (n_queries, width), 1
        )
        levels_here = [l for l in range(n_levels) if sizes[l] >= hi]
        pyrs = []
        off = 0
        for l in range(n_levels):
            if l in levels_here and with_cost:
                # converted to f32 ONCE per chunk (outside the step loop) so
                # the in-loop masked-reduce extraction pairs a 32-bit mask
                # with 32-bit operands in both modes. (16-bit extraction was
                # probed 2026-08-19 and is unreachable on this target: s16
                # iota "not supported by hardware", s16 reductions and s16
                # compares both fail to lower.) The HBM read of the stored
                # pyramid stays s8/bf16 either way — only the VMEM-resident
                # chunk slice is widened.
                pyrs.append(
                    (l, pyr_ref[0, :, off + lo : off + hi].astype(jnp.float32))
                )
            off += sizes[l]

        c_sel0 = {l: jnp.zeros((n_queries, k), jnp.float32) for l, _ in pyrs}

        def extract(mask, pyrs):
            """One masked-reduce pass per containing level."""
            return {
                l: jnp.sum(
                    jnp.where(mask, pyr, jnp.zeros_like(pyr)),
                    axis=1, keepdims=True,
                ).astype(jnp.float32)
                for l, pyr in pyrs
            }

        if approx16:
            k_sel0 = jnp.full((n_queries, k), jnp.inf, jnp.float32)

            def body(j, state, lo=lo, hi=hi, pyrs=pyrs):
                k_sel, c_sel = state
                kc = dist_ref[:, lo:hi]
                kmin = jnp.min(kc, axis=1, keepdims=True)  # ONE f32 pass:
                # min distance AND lowest-index tie-break (keys are unique)
                mask = kc == kmin  # unique winner
                dist_ref[:, lo:hi] = jnp.where(mask, jnp.inf, kc)
                k_sel = jnp.where(lane_k == j, kmin, k_sel)
                ext = extract(mask, pyrs)
                c_sel = {
                    l: jnp.where(lane_k == j, ext[l], c_sel[l]) for l in ext
                }
                return k_sel, c_sel

            n_steps = min(k, width)
            if fuse_chunks:
                chunk_jobs.append((body, (k_sel0, c_sel0)))
                continue
            k_sel, c_sel = _serial_loop(n_steps, body, (k_sel0, c_sel0))
            chunk_d.append(k_sel)
            chunk_i.append(None)
        else:
            d_sel0 = jnp.full((n_queries, k), jnp.inf, jnp.float32)
            i_sel0 = jnp.full((n_queries, k), 0, jnp.int32)

            def body(j, state, lo=lo, hi=hi, cols=cols, pyrs=pyrs):
                d_sel, i_sel, c_sel = state
                d = dist_ref[:, lo:hi]
                dmin = jnp.min(d, axis=1, keepdims=True)
                idx = jnp.min(
                    jnp.where(d == dmin, cols, jnp.int32(2**30)),
                    axis=1, keepdims=True,
                )
                mask = cols == idx
                d_sel = jnp.where(lane_k == j, dmin, d_sel)
                i_sel = jnp.where(lane_k == j, idx, i_sel)
                c_sel = {
                    l: jnp.where(lane_k == j, v, c_sel[l])
                    for l, v in extract(mask, pyrs).items()
                }
                dist_ref[:, lo:hi] = jnp.where(mask, jnp.inf, d)
                return d_sel, i_sel, c_sel

            n_steps = min(k, width)
            if fuse_chunks:
                chunk_jobs.append((body, (d_sel0, i_sel0, c_sel0)))
                continue
            d_sel, i_sel, c_sel = _serial_loop(
                n_steps, body, (d_sel0, i_sel0, c_sel0)
            )
            chunk_d.append(d_sel)
            chunk_i.append(i_sel)
        chunk_cost.append(c_sel)

    if fuse_chunks:
        bodies = [b for b, _ in chunk_jobs]

        def fused_chunks_body(j, states):
            return tuple(b(j, s) for b, s in zip(bodies, states))

        states = _serial_loop(
            k, fused_chunks_body, tuple(s for _, s in chunk_jobs)
        )
        for st in states:
            if approx16:
                k_sel, c_sel = st
                chunk_d.append(k_sel)
                chunk_i.append(None)
            else:
                d_sel, i_sel, c_sel = st
                chunk_d.append(d_sel)
                chunk_i.append(i_sel)
            chunk_cost.append(c_sel)

    # per-level merge of its chunks' candidates (straight-line: candidate
    # counts are static; [T, <=4k] lanes — cheap next to the chunk scans).
    # ilp mode: the 3+ multi-chunk merges have disjoint dependency chains
    # (each level owns its candidate set), so their step-j bodies fuse into
    # ONE k-step loop — but the shared acc_ref scratch can't serve
    # interleaved levels, so fused merges carry their accumulators in the
    # loop state instead (same values, same output writes).
    merge_jobs = []  # (level, body, state0) when ilp
    for l in range(n_levels):
        n_chunks = n_levels - l
        cand_d = jnp.concatenate(chunk_d[:n_chunks], axis=1)
        cand_c = (
            jnp.concatenate(
                [chunk_cost[c][l] for c in range(n_chunks)], axis=1
            )
            if with_cost
            else None
        )
        if n_chunks == 1:
            acc_ref[...] = (
                jax.lax.bitcast_convert_type(cand_d, jnp.int32) & 0xFFFF
                if approx16
                else chunk_i[0]
            )
            if with_cost:
                cost_acc_ref[...] = cand_c
        elif ilp:
            acc_i0 = jnp.zeros((n_queries, k), jnp.int32)
            acc_c0 = jnp.zeros((n_queries, k), jnp.float32)
            if approx16:

                def body_ilp(j, state, cand_c=cand_c):
                    ck, acc_i, acc_c = state
                    kmin = jnp.min(ck, axis=1, keepdims=True)
                    mask = ck == kmin  # unique winner (keys are distinct)
                    idx = (
                        jax.lax.bitcast_convert_type(kmin, jnp.int32) & 0xFFFF
                    )
                    acc_i = jnp.where(lane_k == j, idx, acc_i)
                    if with_cost:
                        sel_c = jnp.sum(
                            jnp.where(mask, cand_c, jnp.zeros_like(cand_c)),
                            axis=1, keepdims=True,
                        )
                        acc_c = jnp.where(lane_k == j, sel_c, acc_c)
                    return jnp.where(mask, jnp.inf, ck), acc_i, acc_c

            else:
                cand_i = jnp.concatenate(chunk_i[:n_chunks], axis=1)

                def body_ilp(j, state, cand_c=cand_c, cand_i=cand_i):
                    d, acc_i, acc_c = state
                    dmin = jnp.min(d, axis=1, keepdims=True)
                    sel_i = jnp.min(
                        jnp.where(d == dmin, cand_i, jnp.int32(2**30)),
                        axis=1, keepdims=True,
                    )
                    mask = (d == dmin) & (cand_i == sel_i)
                    acc_i = jnp.where(lane_k == j, sel_i, acc_i)
                    if with_cost:
                        sel_c = jnp.sum(
                            jnp.where(mask, cand_c, jnp.zeros_like(cand_c)),
                            axis=1, keepdims=True,
                        )
                        acc_c = jnp.where(lane_k == j, sel_c, acc_c)
                    return jnp.where(mask, jnp.inf, d), acc_i, acc_c

            merge_jobs.append((l, body_ilp, (cand_d, acc_i0, acc_c0)))
            continue
        elif approx16:
            def merge_keys(j, state, cand_c=cand_c):
                ck, = state
                kmin = jnp.min(ck, axis=1, keepdims=True)
                mask = ck == kmin  # unique winner (keys are distinct)
                idx = (
                    jax.lax.bitcast_convert_type(kmin, jnp.int32) & 0xFFFF
                )  # [T, 1] — the only integer op in the merge
                acc_ref[...] = jnp.where(lane_k == j, idx, acc_ref[...])
                if with_cost:
                    sel_c = jnp.sum(
                        jnp.where(mask, cand_c, jnp.zeros_like(cand_c)),
                        axis=1, keepdims=True,
                    )
                    cost_acc_ref[...] = jnp.where(
                        lane_k == j, sel_c, cost_acc_ref[...]
                    )
                return (jnp.where(mask, jnp.inf, ck),)

            _serial_loop(k, merge_keys, (cand_d,))
        else:
            cand_i = jnp.concatenate(chunk_i[:n_chunks], axis=1)

            def merge(j, state, cand_c=cand_c, cand_i=cand_i):
                d, = state
                dmin = jnp.min(d, axis=1, keepdims=True)
                sel_i = jnp.min(
                    jnp.where(d == dmin, cand_i, jnp.int32(2**30)),
                    axis=1, keepdims=True,
                )
                mask = (d == dmin) & (cand_i == sel_i)
                acc_ref[...] = jnp.where(lane_k == j, sel_i, acc_ref[...])
                if with_cost:
                    sel_c = jnp.sum(
                        jnp.where(mask, cand_c, jnp.zeros_like(cand_c)),
                        axis=1, keepdims=True,
                    )
                    cost_acc_ref[...] = jnp.where(
                        lane_k == j, sel_c, cost_acc_ref[...]
                    )
                return (jnp.where(mask, jnp.inf, d),)

            _serial_loop(k, merge, (cand_d,))
        idx_out_ref[0, :, l * k : (l + 1) * k] = acc_ref[...]
        if with_cost:
            cost_out_ref[0, :, l * k : (l + 1) * k] = cost_acc_ref[...]

    if merge_jobs:
        merge_bodies = [b for _, b, _ in merge_jobs]

        def fused_merges_body(j, states):
            return tuple(b(j, s) for b, s in zip(merge_bodies, states))

        states = _serial_loop(
            k, fused_merges_body, tuple(s for _, _, s in merge_jobs)
        )
        for (l, _, _), (_, acc_i, acc_c) in zip(merge_jobs, states):
            idx_out_ref[0, :, l * k : (l + 1) * k] = acc_i
            if with_cost:
                cost_out_ref[0, :, l * k : (l + 1) * k] = acc_c


@functools.partial(
    jax.jit,
    static_argnames=(
        "level_sizes", "k", "interpret", "approx", "with_cost", "ilp"
    ),
)
def correlation3d_knn_pallas(
    xyz1: jax.Array,
    xyz2_warp: jax.Array,
    pyramid_cat: jax.Array | None,
    level_sizes: tuple[int, ...],
    k: int = 16,
    interpret: bool | None = None,
    approx: bool = False,
    with_cost: bool = True,
    ilp: bool | None = None,
) -> tuple[jax.Array, jax.Array | None]:
    """Per-level prefix KNN selection + cost extraction.

    Args:
      xyz1: [B, N, 3] query points.
      xyz2_warp: [B, M0, 3] warped frame-2 points (levels are row-prefixes).
      pyramid_cat: [B, N, sum(level_sizes)] per-query cost-volume rows,
        levels concatenated along columns.
      level_sizes: per-level prefix lengths, descending.
      k: neighbours per level.
      approx: bf16 distance/cost compute inside the kernel (half the vreg
        passes). Selection can differ from the exact path only between
        bf16-tied neighbours; int8-origin costs stay exact. Used by the
        model fast path (which already runs the int8/bf16 envelope).
      with_cost: False skips the in-kernel cost extraction entirely — no
        pyramid ref is read (pass pyramid_cat=None) and the masked-reduce
        passes disappear from every selection step. Used by the training
        path, which only needs the indices (the differentiable cost gather
        stays XLA).
      ilp: fuse step j of the independent selection loops (4 chunk scans,
        then the 3+ level merges) into two loops — 112 -> 32 serial steps
        per tile at the model shape, identical values. None reads
        CAMLIFLOW_CORR3D_ILP (trace-time; default off per the hard rule).
    Returns:
      (indices [B, N, L*k] int32, costs [B, N, L*k] f32 or None). With
      approx=False, selection semantics match the XLA path bit-exactly
      (ascending distance within a level, lowest-index tie-break); the
      rel_xyz payload is left to one XLA gather (see module docstring).
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    if ilp is None:
        ilp = _ilp_enabled()
    compute_dtype = jnp.bfloat16 if approx else jnp.float32
    batch, n_queries, _ = xyz1.shape
    m0 = xyz2_warp.shape[1]
    if with_cost:
        m_total = pyramid_cat.shape[2]
        assert m_total == sum(level_sizes), (m_total, level_sizes)
    n_levels = len(level_sizes)

    tile_n = _tile_n()
    pad_n = (-n_queries) % tile_n
    xyz1_p = jnp.pad(xyz1, ((0, 0), (0, pad_n), (0, 0)))
    total_n = n_queries + pad_n
    n_tiles = total_n // tile_n

    tile_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (1, tile_n, w), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        tile_spec(3),
        pl.BlockSpec(
            (1, m0, 3), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [xyz1_p, xyz2_warp]
    out_shape = [
        jax.ShapeDtypeStruct((batch, total_n, n_levels * k), jnp.int32)
    ]
    out_specs = [tile_spec(n_levels * k)]
    scratch_shapes = [
        # f32 in both modes: exact scans raw distances, approx scans packed
        # (bf16 distance | column) sort keys bitcast to f32 (see kernel)
        pltpu.VMEM((tile_n, m0), jnp.float32),
        pltpu.VMEM((tile_n, k), jnp.int32),
    ]
    if with_cost:
        pyr_p = jnp.pad(pyramid_cat, ((0, 0), (0, pad_n), (0, 0)))
        in_specs.append(tile_spec(m_total))
        operands.append(pyr_p)
        out_shape.append(
            jax.ShapeDtypeStruct((batch, total_n, n_levels * k), jnp.float32)
        )
        out_specs.append(tile_spec(n_levels * k))
        # cost accumulator stays f32 in both modes (32-bit lane selects)
        scratch_shapes.append(pltpu.VMEM((tile_n, k), jnp.float32))

    # Wider tiles (fewer serial extraction-loop trips) and the Python
    # unroll (straight-line steps keep more intermediates live) blow the
    # DEFAULT 16 MB scoped-vmem cap (512 -> 36.2M, 1024 -> 72.8M, unroll@256
    # -> >16M; measured on v5e), not physical VMEM — raise the cap for those
    # non-default knobs only so the default path's artifact is bit-unchanged.
    import os

    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
        if tile_n > _TILE_N
        or os.environ.get("CAMLIFLOW_CORR3D_UNROLL", "0") != "0"
        else None
    )
    outs = pl.pallas_call(
        functools.partial(
            _corr3d_knn_kernel, level_sizes=tuple(level_sizes), k=k,
            compute_dtype=compute_dtype, with_cost=with_cost, ilp=ilp,
        ),
        out_shape=tuple(out_shape),
        grid=(batch, n_tiles),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)
    if with_cost:
        idx, cost = outs
        return idx[:, :n_queries], cost[:, :n_queries]
    (idx,) = outs
    return idx[:, :n_queries], None


# ---------------------------------------------------------------------------
# Fused Correlation3D tail: rel-xyz gather + cost MLP + per-level sum + merge
# ---------------------------------------------------------------------------


def corr3d_approx_enabled() -> bool:
    """Trace-time switch for bf16 (approx) corr3d selection.

    The round-3 Mosaic failure ("Invalid relayout ... vector<256x256xi1>")
    was the 16-bit-lane i1 mask of the bf16 `d == dmin` compare feeding a
    32-bit s32 `cols` select — Mosaic cannot relayout i1 vectors across
    bitwidths. Round 5 reworked the approx path to keep every mask and its
    select operands at one bitwidth (int16 width-dim index math + a 16-bit
    lane iota for the [T, k] accumulators). Default stays OFF pending the
    on-chip compile + numerics gate + timing A/B (CLAUDE.md hard rule).
    Export CAMLIFLOW_CORR3D_APPROX=1 to enable.
    """
    import os

    return os.environ.get("CAMLIFLOW_CORR3D_APPROX", "0") != "0"


def corr3d_train_select_enabled() -> bool:
    """Trace-time switch: route the TRAINING-path Correlation3D k-NN
    selection through the Pallas kernel (indices only; the differentiable
    cost/xyz gathers stay XLA, so gradients are bit-unchanged — see
    camliraft_l.py::Correlation3D and the grad-parity test in
    tests/test_pallas_corr3d.py). Default ON since 2026-08-19: hardware-
    validated per the CLAUDE.md rule — the flagged camliraft_l train CLI
    drive compiled + ran on-chip, and the camliraft train step measured
    522.5 -> 496.1 ms/step (the Pallas selection replaces the dense
    [B,N,M0] distance matrix, its ~118 MB relayout copies, and 4 top_k
    sorts per iteration). Export CAMLIFLOW_CORR3D_TRAIN_SELECT=0 to get
    the pure-XLA selection back."""
    import os

    return os.environ.get("CAMLIFLOW_CORR3D_TRAIN_SELECT", "1") != "0"


def corr3d_flat_tail_enabled() -> bool:
    """Trace-time switch: build the XLA Correlation3D tail payload
    (rel_xyz || cost) in FLAT [B, N*L*k, 4] form instead of
    [B, N, L*k, 4]. The 4-D form draws a {3,2,1,0}->{1,3,2,0} relayout
    copy on the rel-xyz tensor (0.94 ms/frame on both RAFT cores,
    compute-line trace 2026-08-20); the 2-D row-major form gives every
    consumer (subtract, concat, cost-MLP matmul) one shared layout.
    Bit-identical values (reshape + equivalent broadcast; pinned by
    tests/test_pallas_corr3d.py).

    ADJUDICATED NEGATIVE on-chip (2026-08-20, v5e, fresh processes,
    10 steps): camliraft_l 47.3 -> 51.8 ms/frame (-10%), camliraft
    82.9 -> 87.4 (-5%). The jnp.repeat materialisation of xyz1 over
    L*k rows plus the widened [B, N*L*k, C] MLP launch cost more than
    the 0.94 ms relayout they remove — same verdict family as the three
    blend restructures: XLA's layout assignment around the 4-D tail is
    the local optimum. Stays default OFF permanently on this toolchain;
    tests pin semantics. Export CAMLIFLOW_CORR3D_FLAT_TAIL=1 to enable.
    """
    import os

    return os.environ.get("CAMLIFLOW_CORR3D_FLAT_TAIL", "0") != "0"


def corr3d_tail_enabled() -> bool:
    """Trace-time switch for the fused Correlation3D tail kernel.

    Hardware verdict 2026-08-19 (tools/probe_gather_matrix.py): this toolchain's Mosaic backend rejects EVERY dim-0 tpu.dynamic_gather (any dtype, any shape), so this kernel cannot compile on the current chip stack; the flag stays "0" until a toolchain upgrade (PERF.md round-4 gather-probe verdict).
    Export CAMLIFLOW_CORR3D_TAIL=1 to re-test after an upgrade.
    """
    import os

    return os.environ.get("CAMLIFLOW_CORR3D_TAIL", "0") != "0"


def prepare_corr3d_tail_params(params) -> tuple:
    """Loop-invariant MLP operands from a `Correlation3D` param tree.

    The tail is norm-free (cost_mlp is MLP(norm=None, act=relu), merge is
    DenseNormAct(norm=None, act=leaky_relu) — camliraft_l.py:187-197), so six
    dense (kernel, bias) pairs fully describe it.
    """
    mlp = params["cost_mlp"]
    k1 = mlp["DenseNormAct_0"]["Dense_0"]["kernel"]  # [4, C1]
    b1 = mlp["DenseNormAct_0"]["Dense_0"]["bias"]
    k2 = mlp["DenseNormAct_1"]["Dense_0"]["kernel"]  # [C1, C1]
    b2 = mlp["DenseNormAct_1"]["Dense_0"]["bias"]
    km = params["merge"]["Dense_0"]["kernel"]  # [L*C1, Cout]
    bm = params["merge"]["Dense_0"]["bias"]
    return tuple(
        jnp.asarray(x, jnp.float32) for x in (k1, b1, k2, b2, km, bm)
    )


def _corr3d_tail_kernel(
    xyz1_ref,
    xyz2_ref,
    idx_ref,
    cost_ref,
    scale_ref,
    k1_ref, b1_ref, k2_ref, b2_ref, km_ref, bm_ref,
    out_ref,
    *,
    n_levels: int,
    k: int,
):
    """Per-tap chain, statically unrolled over the L*k selected neighbours:
    gather rel_xyz (VMEM `take_along_axis` — the technique update3d's dw
    convs use; the XLA gather this replaces was 4 ms/frame), dequantised
    cost, 2-layer cost MLP, per-level accumulation, merge dense. All f32 —
    matching the exact XLA tail up to sum-order rounding."""
    xyz1 = xyz1_ref[0].astype(jnp.float32)  # [N, 3]
    xyz2 = xyz2_ref[0].astype(jnp.float32)  # [M0, 3]
    scale = scale_ref[0].astype(jnp.float32)  # [N, 1]
    n = xyz1.shape[0]
    # Mosaic's take_along_axis lowers only same-shape gathers (probed
    # 2026-08-18): pad the table up to the query count (indices stay < M0)
    if xyz2.shape[0] < n:
        xyz2 = jnp.pad(xyz2, ((0, n - xyz2.shape[0]), (0, 0)))
    k1 = k1_ref[...].astype(jnp.float32)  # [4, C1]
    b1 = b1_ref[...].astype(jnp.float32)
    k2 = k2_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)

    accs = [None] * n_levels
    for j in range(n_levels * k):
        col = jnp.broadcast_to(idx_ref[0, :, j][:, None], (n, 3))
        rel = jnp.take_along_axis(xyz2, col, axis=0) - xyz1  # [N, 3]
        cj = cost_ref[0, :, j][:, None].astype(jnp.float32) * scale  # [N, 1]
        # payload @ k1 as four rank-1 broadcasts: lane-3 operands make poor
        # MXU matmuls; the VPU form is exact f32 (and skips the lane concat
        # of rel||cost, which Mosaic would relayout)
        h = (
            rel[:, 0:1] * k1[0][None, :]
            + rel[:, 1:2] * k1[1][None, :]
            + rel[:, 2:3] * k1[2][None, :]
            + cj * k1[3][None, :]
            + b1[None, :]
        )
        h = jnp.maximum(h, 0.0)
        h2 = (
            jax.lax.dot_general(
                h,
                k2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            + b2[None, :]
        )
        h2 = jnp.maximum(h2, 0.0)
        lvl = j // k
        accs[lvl] = h2 if accs[lvl] is None else accs[lvl] + h2

    c1 = accs[0].shape[1]
    out = bm_ref[...].astype(jnp.float32)[None, :]
    for lvl in range(n_levels):
        # virtual concat: per-level row blocks of the merge kernel
        out = out + jax.lax.dot_general(
            accs[lvl],
            km_ref[lvl * c1 : (lvl + 1) * c1].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[0] = jnp.where(out >= 0.0, out, 0.1 * out)  # leaky_relu(0.1)


@functools.partial(
    jax.jit, static_argnames=("n_levels", "k", "interpret")
)
def corr3d_tail_pallas(
    xyz1: jax.Array,
    xyz2_warp: jax.Array,
    idx_cat: jax.Array,
    knn_cost: jax.Array,
    scale: jax.Array | None,
    params: tuple,
    n_levels: int,
    k: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused Correlation3D tail (camliraft_l_core.py:75-101 semantics).

    Consumes `correlation3d_knn_pallas` output directly: the rel-xyz gather,
    int8 cost dequant, shared 2-layer cost MLP, per-level k-sum and the merge
    dense all run in one VMEM-resident pass per batch row — replacing the
    XLA tail's [B, N, L*k, 3] gather (~4 ms/frame at flagship shapes) and
    ~8 batched ops per iteration. Forward-only (inference fast path).

    Args:
      xyz1: [B, N, 3] query points.
      xyz2_warp: [B, M0, 3] warped frame-2 points.
      idx_cat: [B, N, L*k] int32 selected neighbour indices (by level).
      knn_cost: [B, N, L*k] f32 selected (possibly int8-quantised) costs.
      scale: [B, N, 1] per-row dequant scale, or None.
      params: `prepare_corr3d_tail_params` output.
    Returns:
      [B, N, Cout] f32 correlation features.
    """
    from .pallas_update3d import _batched_spec, _const_spec

    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    batch, n, _ = xyz1.shape
    cout = params[5].shape[0]
    if scale is None:
        scale = jnp.ones((batch, n, 1), jnp.float32)
    data = [
        xyz1.astype(jnp.float32),
        xyz2_warp.astype(jnp.float32),
        idx_cat.astype(jnp.int32),
        knn_cost.astype(jnp.float32),
        scale.astype(jnp.float32),
    ]
    out_sd = jax.ShapeDtypeStruct((batch, n, cout), jnp.float32)
    return pl.pallas_call(
        functools.partial(_corr3d_tail_kernel, n_levels=n_levels, k=k),
        out_shape=out_sd,
        grid=(batch,),
        in_specs=[_batched_spec(a) for a in data]
        + [_const_spec(p) for p in params],
        out_specs=_batched_spec(out_sd),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*data, *params)
