"""Pallas TPU mega-kernels for the 3D refinement update chain.

STATUS: STRUCTURALLY UNBUILDABLE on the current toolchain — depends on dim-0
`tpu.dynamic_gather`, which the Mosaic backend rejects for every dtype/shape
(tools/probe_gather_matrix.py, PERF.md round-4 gather-probe verdict). Gate
CAMLIFLOW_UPDATE3D stays "0"; interpret-mode tests pin semantics for a
future Mosaic. Do not invest further here until the toolchain updates.

The point-branch update (reference camliraft_l_core.py:104-155 via
models/point_conv.py:102-130) is 9 PointConvDW convs per iteration, each a
dense MLP + KNN feature gather + weight multiply + max-over-k. In XLA every
gather materialises its [N, k, C] neighbourhood in HBM and the hoisted
geometric weights are re-read each iteration (~107 MB bf16 per iteration
combined — the dominant in-loop 3D cost; device-trace evidence in PERF.md
round 3). These kernels run whole sub-chains in one VMEM-resident pass:

- `motion_encoder_3d_pallas`: conv_c1 (k=16) + conv_f1 (k=32) + conv_f2
  (k=16) + conv (k=16) + flow concat (camliraft_l_core.py:137-155).
- `gru_flowhead_3d_pallas`: the 3-gate point-conv GRU (k=4) + the 2-conv
  flow head (k=32) + final fc (camliraft_l_core.py:104-134).

TPU formulation: the per-conv feature table [N, C] lives in VMEM, and the
KNN gather is k sublane `tpu.dynamic_gather`s (`jnp.take_along_axis` along
axis 0 with per-row indices broadcast across lanes) — the [N, k, C]
neighbourhood never exists; each of the k gathered [N, C] slabs is fused
into its multiply + running max. The geometric dw weights ride in as bf16
VMEM operands (hoisted outside the scan, as in the XLA path).

Numerics: matmuls run bf16 with f32 accumulation; gates/state math in f32;
the gather-multiply-max runs bf16 like the XLA fast path (PointConvDW
`fast=True`). Forward-only — training and the exact path keep the XLA/Flax
chain, and the on-hardware numerics gate guards the envelope.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import _on_tpu


def update3d_enabled() -> bool:
    """Trace-time switch for the fused 3D update kernels.

    Hardware verdict 2026-08-19 (tools/probe_gather_matrix.py): this toolchain's Mosaic backend rejects EVERY dim-0 tpu.dynamic_gather (any dtype, any shape), so this kernel cannot compile on the current chip stack; the flag stays "0" until a toolchain upgrade (PERF.md round-4 gather-probe verdict).
    Export CAMLIFLOW_UPDATE3D=1 to re-test after an upgrade.
    """
    return os.environ.get("CAMLIFLOW_UPDATE3D", "0") != "0"

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _leaky(x):
    return jnp.where(x >= 0.0, x, 0.1 * x)


def _matmul(x, w_ref, b_ref=None, *, act=None, parts=None):
    """x @ w + b with bf16 operands and f32 accumulation.

    `parts`: optional list of (array, cin_slice) pairs — a virtual concat:
    the full input is the channel-concat of the arrays, and each is
    multiplied against its weight-row block (lane-dim concats need relayouts
    in Mosaic; per-block matmuls don't).
    """
    if parts is None:
        parts = [(x, slice(None))]
    acc = None
    for xs, sl in parts:
        d = jax.lax.dot_general(
            xs.astype(_BF16),
            w_ref[sl, :].astype(_BF16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
        )
        acc = d if acc is None else acc + d
    if b_ref is not None:
        acc = acc + b_ref[...].astype(_F32)[None, :]
    if act == "leaky_relu":
        acc = _leaky(acc)
    return acc


def _dw_conv(table, idx_ref, dw_ref, k: int):
    """max_j gather(table, idx[:, j]) * dw[j]  — all in VMEM.

    table: [N, C] bf16 (the conv's per-point MLP output).
    idx_ref: [1, N, >=k] int32 neighbour indices (prefix-sliced to k).
    dw_ref: [1, k, N, C] geometric weights in KERNEL layout (k leading so
      each tap slice is a contiguous [N, C] slab of full vregs — the
      [N, k, C] precompute layout would make every slice sublane-strided;
      `to_kernel_layout` transposes once outside the scan) — bf16, or int8
      whose per-channel scale has been folded into the conv's MLP params by
      `quantize_dw_int8` (int8 halves the per-iteration HBM re-read of the
      hoisted weights; values up to ±127 are exact in bf16).
    Returns [N, C] bf16 (bit-matching the XLA fast path's bf16 mul+max).
    """
    acc = None
    for j in range(k):
        col = jnp.broadcast_to(idx_ref[0, :, j][:, None], table.shape)
        g = jnp.take_along_axis(table, col, axis=0)
        t = g * dw_ref[0, j].astype(_BF16)
        acc = t if acc is None else jnp.maximum(acc, t)
    return acc


def to_kernel_layout(dw):
    """[B, N, k, C] precompute layout -> [B, k, N, C] kernel layout, applied
    to every leaf. Call OUTSIDE the refinement scan (loop-invariant)."""
    return jax.tree_util.tree_map(
        lambda w: jnp.transpose(w, (0, 2, 1, 3)), dw
    )


def quantize_dw_int8(dw: dict, me_params: tuple, gf_params: tuple):
    """Per-channel int8 quantisation of the hoisted PointConvDW geometric
    weights, with the dequant scale folded into each conv's MLP params.

    The dw conv is `out[q, c] = max_j table[idx[q,j], c] * w[q, j, c]` and
    every conv MLP activation (leaky_relu / identity) is positively
    homogeneous, so scaling the MLP's output column c by s[c] and storing
    w/s[c] as int8 leaves the output unchanged up to the int8 rounding
    (max|channel|/254). This halves the dominant HBM stream of the fused
    update kernels — the per-iteration re-read of the [N, k, C] weights.

    Returns (dw_quantised, me_params', gf_params') matching
    `prepare_motion_encoder_3d_params` / `prepare_gru_flowhead_3d_params`
    layout. The quantised dw comes back in KERNEL layout ([B, k, N, C],
    `to_kernel_layout`) — it feeds only the fused kernels.
    """

    def quant(w):
        amax = jnp.max(jnp.abs(w.astype(_F32)), axis=tuple(range(w.ndim - 1)))
        s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
        q = jnp.clip(jnp.round(w.astype(_F32) / s), -127, 127).astype(jnp.int8)
        return q, s

    def fold(params, i, s):
        # scale kernel column + bias of the conv whose (kernel, bias) sit at
        # positions (2i, 2i+1)
        out = list(params)
        out[2 * i] = out[2 * i] * s[None, :].astype(out[2 * i].dtype)
        out[2 * i + 1] = out[2 * i + 1] * s.astype(out[2 * i + 1].dtype)
        return tuple(out)

    me = dict(dw["motion_encoder"])
    for i, name in enumerate(("conv_c1", "conv_f1", "conv_f2", "conv")):
        me[name], s = quant(me[name])
        me_params = fold(me_params, i, s)
    gru = dict(dw["gru"])
    fh = dict(dw["flow_head"])
    for i, (tree, name) in enumerate(
        ((gru, "conv_zr"), (gru, "conv_q"), (fh, "conv1"), (fh, "conv2"))
    ):
        tree[name], s = quant(tree[name])
        gf_params = fold(gf_params, i, s)
    dw_q = dict(dw)
    dw_q["motion_encoder"] = me
    dw_q["gru"] = gru
    dw_q["flow_head"] = fh
    return to_kernel_layout(dw_q), me_params, gf_params


# ---------------------------------------------------------------------------
# MotionEncoder3D
# ---------------------------------------------------------------------------


def _motion_encoder_3d_kernel(
    flow_ref,
    corr_ref,
    idx_ref,
    dwc1_ref, dwf1_ref, dwf2_ref, dwo_ref,
    kc1_ref, bc1_ref, kf1_ref, bf1_ref, kf2_ref, bf2_ref, ko_ref, bo_ref,
    out_ref,
):
    flow = flow_ref[0].astype(_F32)  # [N, 3]
    corr = corr_ref[0].astype(_F32)  # [N, 128]

    # conv_c1: mlp(corr) -> gather k=16 -> *w -> max
    fc = _matmul(corr, kc1_ref, bc1_ref, act="leaky_relu").astype(_BF16)
    corr_feat = _dw_conv(fc, idx_ref, dwc1_ref, 16)  # [N, 128] bf16

    # conv_f1 (k=32) -> conv_f2 (k=16) on the flow
    ff = _matmul(flow, kf1_ref, bf1_ref, act="leaky_relu").astype(_BF16)
    flow_feat = _dw_conv(ff, idx_ref, dwf1_ref, 32)  # [N, 32]
    f2 = _matmul(
        flow_feat.astype(_F32), kf2_ref, bf2_ref, act="leaky_relu"
    ).astype(_BF16)
    flow_feat = _dw_conv(f2, idx_ref, dwf2_ref, 16)  # [N, 16]

    # merge conv over concat(corr_feat, flow_feat) — virtual concat
    cc = corr_feat.shape[1]
    fo = _matmul(
        None,
        ko_ref,
        bo_ref,
        act="leaky_relu",
        parts=[(corr_feat, slice(0, cc)), (flow_feat, slice(cc, None))],
    ).astype(_BF16)
    out = _dw_conv(fo, idx_ref, dwo_ref, 16)  # [N, 125]
    # the flow concat (camliraft_l_core.py:155) happens in the wrapper —
    # a 125-lane in-kernel store would be a misaligned lane write
    out_ref[0] = out.astype(_F32)


def _mlp_params(tree):
    """(kernel, bias) of a PointConvDW 1-layer `mlp`."""
    p = tree["mlp"]["DenseNormAct_0"]["Dense_0"]
    return p["kernel"], p["bias"].astype(_F32)


def prepare_motion_encoder_3d_params(params):
    """Loop-invariant MLP operands from the `MotionEncoder3D` param tree."""
    out = []
    for name in ("conv_c1", "conv_f1", "conv_f2", "conv"):
        out += list(_mlp_params(params[name]))
    return tuple(out)


def _dw_cast(w):
    return w if w.dtype == jnp.int8 else w.astype(_BF16)


def _batched_spec(x):
    nd = x.ndim
    return pl.BlockSpec(
        (1,) + x.shape[1:],
        (lambda n: lambda b: (b,) + (0,) * (n - 1))(nd),
        memory_space=pltpu.VMEM,
    )


def _const_spec(x):
    nd = x.ndim
    return pl.BlockSpec(
        x.shape, (lambda n: lambda b: (0,) * n)(nd), memory_space=pltpu.VMEM
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def motion_encoder_3d_pallas(
    flow: jax.Array,
    corr: jax.Array,
    knn_indices: jax.Array,
    dw: dict,
    params: tuple,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused MotionEncoder3D (camliraft_l_core.py:137-155), bf16 compute.

    Args:
      flow: [B, N, 3] f32 current 3D flow.
      corr: [B, N, 128] f32 correlation features.
      knn_indices: [B, N, >=32] int32 (k-prefixes per conv).
      dw: hoisted geometric weights in kernel layout (`to_kernel_layout`):
        {conv_c1 [B,16,N,128], conv_f1 [B,32,N,32], conv_f2 [B,16,N,16],
        conv [B,16,N,125]}, bf16 or int8.
      params: `prepare_motion_encoder_3d_params` output.
    Returns:
      [B, N, 128] f32 motion features (conv output || flow).
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    batch, n, _ = flow.shape
    dws = [
        _dw_cast(dw[k])
        for k in ("conv_c1", "conv_f1", "conv_f2", "conv")
    ]
    cout = dws[-1].shape[-1]
    idx = knn_indices[:, :, :32].astype(jnp.int32)

    flow = flow.astype(_F32)
    data = [flow, corr.astype(_F32), idx, *dws]
    out = pl.pallas_call(
        _motion_encoder_3d_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, n, cout), _F32),
        grid=(batch,),
        in_specs=[_batched_spec(a) for a in data]
        + [_const_spec(p) for p in params],
        out_specs=_batched_spec(jax.ShapeDtypeStruct((batch, n, cout), _F32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*data, *params)
    return jnp.concatenate([out, flow], axis=-1)


# ---------------------------------------------------------------------------
# GRU3D + FlowHead3D
# ---------------------------------------------------------------------------


def _gru_flowhead_3d_kernel(
    h_ref,
    x_ref,
    motion_ref,
    idx_ref,
    dwzr_ref, dwq_ref, dwf1_ref, dwf2_ref,
    kzr_ref, bzr_ref, kq_ref, bq_ref,
    kf1_ref, bf1_ref, kf2_ref, bf2_ref, kfc_ref, bfc_ref,
    h_out_ref,
    delta_out_ref,
):
    h = h_ref[0].astype(_F32)  # [N, Ch]
    x3d = x_ref[0].astype(_F32)  # [N, Cx]
    motion = motion_ref[0].astype(_F32)  # [N, Cm]
    ch = h.shape[1]
    cx = x3d.shape[1]

    # GRU input x = concat(x3d, motion); hx = concat(h, x) — all virtual
    hx_parts = [
        (h, slice(0, ch)),
        (x3d, slice(ch, ch + cx)),
        (motion, slice(ch + cx, None)),
    ]
    # conv_z/conv_r fused: one [Chx, 2*Ch] matmul + one k=4 dw conv (their
    # mlps have act=None)
    zr_feats = _matmul(None, kzr_ref, bzr_ref, parts=hx_parts).astype(_BF16)
    zr = _dw_conv(zr_feats, idx_ref, dwzr_ref, 4).astype(_F32)  # [N, 2*Ch]
    z = jax.nn.sigmoid(zr[:, :ch])
    r = jax.nn.sigmoid(zr[:, ch:])

    rhx_parts = [
        (r * h, slice(0, ch)),
        (x3d, slice(ch, ch + cx)),
        (motion, slice(ch + cx, None)),
    ]
    qf = _matmul(None, kq_ref, bq_ref, parts=rhx_parts).astype(_BF16)
    q = jnp.tanh(_dw_conv(qf, idx_ref, dwq_ref, 4).astype(_F32))
    h_new = (1.0 - z) * h + z * q
    h_out_ref[0] = h_new

    # flow head: two k=32 dw convs + fc (camliraft_l_core.py:104-116)
    f1 = _matmul(h_new, kf1_ref, bf1_ref, act="leaky_relu").astype(_BF16)
    f1 = _dw_conv(f1, idx_ref, dwf1_ref, 32)
    f2 = _matmul(
        f1.astype(_F32), kf2_ref, bf2_ref, act="leaky_relu"
    ).astype(_BF16)
    f2 = _dw_conv(f2, idx_ref, dwf2_ref, 32)
    delta_out_ref[0] = _matmul(f2.astype(_F32), kfc_ref, bfc_ref)


def prepare_gru_flowhead_3d_params(gru_params, flowhead_params):
    """Loop-invariant MLP operands from the `GRU3D` + `FlowHead3D` trees.
    conv_z and conv_r are channel-concatenated into one matmul (they consume
    the same hx — mirrors `paired_dw_conv`)."""
    kz, bz = _mlp_params(gru_params["conv_z"])
    kr, br = _mlp_params(gru_params["conv_r"])
    kq, bq = _mlp_params(gru_params["conv_q"])
    out = [
        jnp.concatenate([kz, kr], axis=1),
        jnp.concatenate([bz, br], axis=0),
        kq,
        bq,
    ]
    for name in ("conv1", "conv2"):
        out += list(_mlp_params(flowhead_params[name]))
    p = flowhead_params["fc"]
    out += [p["kernel"], p["bias"].astype(_F32)]
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_flowhead_3d_pallas(
    h: jax.Array,
    x3d: jax.Array,
    motion: jax.Array,
    knn_indices: jax.Array,
    dw: dict,
    params: tuple,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused GRU3D + FlowHead3D (camliraft_l_core.py:104-134), bf16 compute.

    Args:
      h: [B, N, Ch] f32 hidden state.
      x3d: [B, N, Cx] context features (loop const).
      motion: [B, N, Cm] motion features.
      knn_indices: [B, N, >=32] int32.
      dw: hoisted geometric weights in kernel layout (`to_kernel_layout`):
        {conv_zr [B,4,N,2*Ch], conv_q [B,4,N,Ch], flow_conv1 [B,32,N,128],
        flow_conv2 [B,32,N,64]}, bf16 or int8.
      params: `prepare_gru_flowhead_3d_params` output.
    Returns:
      (h' [B, N, Ch] f32, delta [B, N, 3] f32).
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    batch, n, ch = h.shape
    dws = [
        _dw_cast(dw[k])
        for k in ("conv_zr", "conv_q", "flow_conv1", "flow_conv2")
    ]
    idx = knn_indices[:, :, :32].astype(jnp.int32)

    data = [h.astype(_F32), x3d.astype(_F32), motion.astype(_F32), idx, *dws]
    h_out, delta = pl.pallas_call(
        _gru_flowhead_3d_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, n, ch), _F32),
            jax.ShapeDtypeStruct((batch, n, 3), _F32),
        ),
        grid=(batch,),
        in_specs=[_batched_spec(a) for a in data]
        + [_const_spec(p) for p in params],
        out_specs=(
            _batched_spec(jax.ShapeDtypeStruct((batch, n, ch), _F32)),
            _batched_spec(jax.ShapeDtypeStruct((batch, n, 3), _F32)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*data, *params)
    return h_out, delta
