"""Pallas TPU mega-kernel for the in-loop CLFM fusion calls.

STATUS: STRUCTURALLY UNBUILDABLE on the current toolchain — depends on dim-0
`tpu.dynamic_gather`, which the Mosaic backend rejects for every dtype/shape
(tools/probe_gather_matrix.py, PERF.md round-4 gather-probe verdict). Gate
CAMLIFLOW_CLFM stays "0"; interpret-mode tests pin semantics for a future
Mosaic. Do not invest further here until the toolchain updates.

Each refinement iteration of the fused CamLiRAFT loop runs two CLFM calls
(corr fusion and motion fusion, reference models/camliraft_core.py:110-123
via models/clfm.py:7-214). In XLA each call is ~15 small ops — the 3D->2D
scatter interp (gather + score blend + 1x1 conv), an SK fusion head
(2 aligns, a global mean, 2 fcs, softmax blend), the 2D->3D bilinear sample
+ MLP, and a second SK head. At ~80 us of launch/DMA boundary per op the two
calls are a large slice of the per-iteration op-boundary floor (PERF.md
round 3: the loop is boundary-bound, not compute-bound). This kernel runs
ONE whole CLFM call in a single VMEM-resident pass.

Everything data-independent across iterations is hoisted out of the scan:

- the interp score MLP: its input is only the (pixel-grid -> projected
  point) offsets, which are loop-invariant — `hoist_interp_score` bakes the
  two score convs into a [B, HW, C3] bf16 gate read by the kernel;
- the bilinear sample taps: `grid_sample_cache` precomputes the 4 corner
  flat indices + validity-folded lerp weights of `grid_sample_points`
  (ops/gridsample.py) at the loop-invariant uv;
- all 1x1-conv / fc weights: `prepare_clfm_params` reshapes them to bf16
  MXU operands once, with the SK fc_out kernel pre-split into the even/odd
  columns (the [2C] -> [C, 2] pair reshape would be a strided lane slice
  in-kernel).

In-kernel gathers are `jnp.take_along_axis` on VMEM-resident tables
(`tpu.dynamic_gather`, same pattern as ops/pallas_update3d.py): the 3D->2D
side gathers the k=1 nearest point's features per pixel; the 2D->3D side
gathers the 4 bilinear corners per point. The SK pair-softmax is computed as
sigmoid(s1 - s2) (exact for a 2-way softmax).

Numerics: bf16 matmuls/gathers with f32 accumulation — the standard
fast-inference contract (forward-only; the exact path and training keep the
Flax modules, and the on-hardware numerics gate guards the envelope).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import _on_tpu
from .pallas_update3d import _batched_spec, _const_spec, _leaky, _matmul

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def clfm_pallas_enabled() -> bool:
    """Trace-time switch for the fused CLFM kernel.

    Hardware verdict 2026-08-19 (tools/probe_gather_matrix.py): this
    toolchain's Mosaic backend rejects EVERY dim-0 tpu.dynamic_gather (any
    dtype, any shape), so this kernel cannot compile on the current chip
    stack; the flag stays "0" until a toolchain upgrade (PERF.md round-4
    gather-probe verdict). Export CAMLIFLOW_CLFM=1 to re-test after an
    upgrade.
    """
    return os.environ.get("CAMLIFLOW_CLFM", "0") != "0"


# ---------------------------------------------------------------------------
# Hoisted loop-invariant pieces
# ---------------------------------------------------------------------------


def hoist_interp_score(interp_params: dict, knn_offset: jax.Array) -> jax.Array:
    """Bake FusionAwareInterp's score MLP (nn/clfm.py:66-74) into a bf16
    gate. The MLP input is only the loop-invariant pixel->point offsets, so
    one evaluation outside the scan serves every iteration.

    Args:
      interp_params: the CLFM "interp" param subtree.
      knn_offset: [B, HW, 1, 2] cached offsets (`fusion_interp_cache`).
    Returns:
      [B, HW, C3] bf16 sigmoid gate.
    """
    norm = jnp.linalg.norm(knn_offset, axis=-1, keepdims=True)
    x = jnp.concatenate([knn_offset, norm], axis=-1).astype(_F32)
    p0 = interp_params["score_net_0"]["Dense_0"]
    p1 = interp_params["score_net_1"]["Dense_0"]
    h = jax.nn.leaky_relu(x @ p0["kernel"] + p0["bias"], negative_slope=0.1)
    s = jax.nn.sigmoid(h @ p1["kernel"] + p1["bias"])  # [B, HW, 1, C3]
    return s[:, :, 0, :].astype(_BF16)


def grid_sample_cache(uv: jax.Array, height: int, width: int):
    """Precompute the 4-corner taps of `grid_sample_points(feat_2d, uv)`
    (ops/gridsample.py:23-78, padding_mode='zeros') at loop-invariant uv.

    Returns:
      (flat_idx [B, N, 4] int32, weights [B, N, 4] f32) — weights carry the
      bilinear lerp factors with out-of-bounds validity folded in, so the
      sample is exactly sum_t feat_2d.reshape(B, HW, C)[flat_idx[t]] * w[t].
    """
    from .gridsample import bilinear_taps

    uv = uv.astype(_F32)
    return bilinear_taps(uv[..., 0], uv[..., 1], height, width)


def prepare_clfm_params(params: dict) -> tuple:
    """bf16 MXU operands from a CLFM param tree (fusion_fn='sk', norm=None,
    k=1 — the in-loop configuration). Call OUTSIDE the scan.

    The SK fc_out kernels are pre-split into even/odd columns so the kernel
    computes the two softmax logit banks directly (nn/clfm.py:191-198)."""

    def dna(tree):  # DenseNormAct(norm=None) = dense + bias
        p = tree["Dense_0"]
        return p["kernel"].astype(_BF16), p["bias"].astype(_F32)

    def sk(tree):
        a1_k, a1_b = dna(tree["align1"])
        a2_k, a2_b = dna(tree["align2"])
        mid = tree["fc_mid"]["kernel"].astype(_BF16)
        out = tree["fc_out"]["kernel"]
        return (
            a1_k, a1_b, a2_k, a2_b, mid,
            out[:, 0::2].astype(_BF16), out[:, 1::2].astype(_BF16),
        )

    oc_k, oc_b = dna(params["interp"]["out_conv"])
    m3_k, m3_b = dna(params["mlps3d"])
    return (oc_k, oc_b) + sk(params["fuse2d"]) + (m3_k, m3_b) + sk(
        params["fuse3d"]
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _sk_fuse(a, b, mid_ref, even_ref, odd_ref):
    """SKFusion head (nn/clfm.py:176-198) on VMEM values: a/b are the
    aligned f32 features; the pair softmax is sigmoid(s1 - s2)."""
    m = jnp.mean(a + b, axis=0, keepdims=True)  # [1, C]
    mid = jnp.maximum(_matmul(m, mid_ref), 0.0)  # [1, C//r]
    s1 = jax.nn.sigmoid(_matmul(mid, even_ref))  # [1, C]
    s2 = jax.nn.sigmoid(_matmul(mid, odd_ref))
    w1 = jax.nn.sigmoid(s1 - s2)
    return a * w1 + b * (1.0 - w1)


def _gather_rows(table, idx):
    """table[idx] for a VMEM-resident [R, C] table and [P] int32 row ids."""
    col = jnp.broadcast_to(idx[:, None], (idx.shape[0], table.shape[1]))
    return jnp.take_along_axis(table, col, axis=0)


def _clfm_kernel(
    f2d_ref, f3d_ref, score_ref, nn_idx_ref, tap_idx_ref, tap_w_ref,
    oc_k, oc_b,
    a1_k, a1_b, a2_k, a2_b, mid2, even2, odd2,
    m3_k, m3_b,
    a13_k, a13_b, a23_k, a23_b, mid3, even3, odd3,
    out2d_ref, out3d_ref,
):
    f2d = f2d_ref[0].astype(_BF16)  # [HW, C2]
    f3d = f3d_ref[0].astype(_BF16)  # [N, C3]

    # --- 3D -> 2D: nearest-point scatter interp + out_conv (clfm.py:44-80)
    g = _gather_rows(f3d, nn_idx_ref[0, :, 0])  # [HW, C3]
    interp = _matmul(
        (score_ref[0] * g).astype(_F32), oc_k, oc_b, act="leaky_relu"
    )  # [HW, C3] f32

    # --- fuse2d (SK)
    a = _matmul(f2d.astype(_F32), a1_k, a1_b, act="leaky_relu")
    b = _matmul(interp, a2_k, a2_b, act="leaky_relu")
    out2d_ref[0] = _sk_fuse(a, b, mid2, even2, odd2)

    # --- 2D -> 3D: bilinear sample at uv + mlps3d (clfm.py:253-256)
    samp = None
    for t in range(4):
        v = _gather_rows(f2d, tap_idx_ref[0, :, t]).astype(_F32)
        v = v * tap_w_ref[0, :, t][:, None]
        samp = v if samp is None else samp + v  # [N, C2] f32
    sm = _matmul(samp, m3_k, m3_b, act="leaky_relu")

    # --- fuse3d (SK)
    a3 = _matmul(sm, a13_k, a13_b, act="leaky_relu")
    b3 = _matmul(f3d.astype(_F32), a23_k, a23_b, act="leaky_relu")
    out3d_ref[0] = _sk_fuse(a3, b3, mid3, even3, odd3)


@functools.partial(jax.jit, static_argnames=("interpret",))
def clfm_fused_pallas(
    feat_2d: jax.Array,
    feat_3d: jax.Array,
    score: jax.Array,
    nn_idx: jax.Array,
    tap_idx: jax.Array,
    tap_w: jax.Array,
    params: tuple,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One whole CLFM call (nn/clfm.py:209-261, fusion_fn='sk', k=1) as a
    single Pallas kernel, bf16 compute.

    Args:
      feat_2d: [B, H, W, C2] image-branch features.
      feat_3d: [B, N, C3] point-branch features.
      score: [B, HW, C3] bf16 hoisted interp gate (`hoist_interp_score`).
      nn_idx: [B, HW, 1] int32 nearest projected point per pixel
        (`fusion_interp_cache` indices).
      tap_idx/tap_w: [B, N, 4] bilinear taps (`grid_sample_cache`).
      params: `prepare_clfm_params` output.
    Returns:
      (out_2d [B, H, W, C2] f32, out_3d [B, N, C3] f32).
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    batch, height, width, c2 = feat_2d.shape
    n, c3 = feat_3d.shape[1], feat_3d.shape[2]
    hw = height * width

    data = [
        feat_2d.reshape(batch, hw, c2).astype(_F32),
        feat_3d.astype(_F32),
        score.astype(_BF16),
        nn_idx.astype(jnp.int32),
        tap_idx.astype(jnp.int32),
        tap_w.astype(_F32),
    ]
    out2d, out3d = pl.pallas_call(
        _clfm_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, hw, c2), _F32),
            jax.ShapeDtypeStruct((batch, n, c3), _F32),
        ),
        grid=(batch,),
        in_specs=[_batched_spec(a) for a in data]
        + [_const_spec(p) for p in params],
        out_specs=(
            _batched_spec(jax.ShapeDtypeStruct((batch, hw, c2), _F32)),
            _batched_spec(jax.ShapeDtypeStruct((batch, n, c3), _F32)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*data, *params)
    return out2d.reshape(batch, height, width, c2), out3d
