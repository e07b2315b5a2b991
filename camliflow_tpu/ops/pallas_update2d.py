"""Pallas TPU mega-kernels for the 2D refinement update chain.

The RAFT-style 2D update (reference models/raft_core.py:110-181) is ~14
small convs per iteration on a [H/8, W/8, C] map (8160 px at 960x540). Each
conv is only tens of microseconds of MXU work, so the XLA chain is dominated
by per-op launch/boundary overhead and HBM round-trips of every intermediate
(device-trace evidence in PERF.md round 3). These kernels run whole
sub-chains in one VMEM-resident pass:

- `motion_encoder_2d_pallas`: conv_c1 (1x1) -> conv_c2 (3x3) -> conv_f1
  (7x7) -> conv_f2 (3x3) -> conv (3x3) -> concat flow
  (reference raft_core.py:142-166).
- `gru_flowhead_2d_pallas`: the separable 1x5 + 5x1 ConvGRU (6 convs) plus
  the 2-conv flow head (reference raft_core.py:110-139, 169-181).

TPU formulation: feature maps stay flattened [H*W, C] (lane dim = channels,
full-height MXU tiles); a conv tap (dy, dx) is a static row-shift by
dy*W + dx followed by a zero-mask of the wrapped border columns, and the
conv itself is one [HW, Cin] x [Cin, Cout] bf16 matmul per tap with f32
accumulation. Taps of convs that share an input (convz/convr; the x-half of
convq) share their shifted operands. Vertical shifts (dy*W rows) are pure
sublane-block moves; only horizontal taps need the (i mod W) border mask.

Numerics: inputs/weights are cast to bf16 for the MXU, accumulation and the
gate nonlinearities run in f32, and the state/delta outputs are returned in
f32 — the same fast-inference contract as the int8 lookup + bf16 gathers
(forward-only, guarded by the on-hardware numerics gate; see PARITY.md).
Training and the exact path keep the XLA/Flax chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import _on_tpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _col_mask(hw: int, width: int, dx: int):
    """[HW, 1] mask of output rows whose source column i%W + dx stays
    in-bounds (a flat shift by dx wraps across image rows; those taps must
    read zeros instead)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % width
    return jnp.logical_and(col + dx >= 0, col + dx < width)


def _shift_flat(x, shift: int, mask=None):
    """out[i] = x[i + shift] with zero fill (static shift); `mask` zeroes
    border columns for horizontal taps."""
    hw = x.shape[0]
    if shift > 0:
        zeros = jnp.zeros((shift, x.shape[1]), x.dtype)
        out = jnp.concatenate([x[shift:], zeros], axis=0)
    elif shift < 0:
        zeros = jnp.zeros((-shift, x.shape[1]), x.dtype)
        out = jnp.concatenate([zeros, x[: hw + shift]], axis=0)
    else:
        out = x
    if mask is not None:
        out = jnp.where(mask, out, jnp.zeros_like(out))
    return out


def _taps(kh: int, kw: int):
    """(dy, dx) offsets of a kh x kw SAME conv, torch-ordered (matches the
    [kh, kw, cin, cout] weight reshape to [kh*kw, cin, cout])."""
    return [
        (dy - (kh - 1) // 2, dx - (kw - 1) // 2)
        for dy in range(kh)
        for dx in range(kw)
    ]


def _shifted(x, taps, width: int, masks: dict):
    """Shared shifted operands for every tap of a conv input."""
    out = []
    for dy, dx in taps:
        mask = None
        if dx != 0:
            key = dx
            if key not in masks:
                masks[key] = _col_mask(x.shape[0], width, dx)
            mask = masks[key]
        out.append(_shift_flat(x, dy * width + dx, mask))
    return out


def _conv_from_shifted(shifted, w_ref, b_ref, *, cin_slice=None):
    """Sum_t shifted[t] @ w[t] + b, f32 accumulation.

    `cin_slice` selects the input-channel block of a conv whose full input
    is a concat of several tensors (the concat itself is never formed).
    """
    acc = None
    for t, xs in enumerate(shifted):
        w = w_ref[t] if cin_slice is None else w_ref[t, cin_slice, :]
        d = jax.lax.dot_general(
            xs,
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
        )
        acc = d if acc is None else acc + d
    if b_ref is not None:
        acc = acc + b_ref[...].astype(_F32)[None, :]
    return acc


def _nan_to_num(x):
    # match jnp.nan_to_num (raft.py:61,78,92): NaN -> 0 AND +-inf clamped to
    # the finite max, so an overflow can't propagate through the VMEM chain
    x = jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)
    bound = jnp.finfo(x.dtype).max
    return jnp.clip(x, -bound, bound)


# ---------------------------------------------------------------------------
# GRU2D + FlowHead2D
# ---------------------------------------------------------------------------


def _gru_flowhead_body(
    h,
    x_parts,
    x_slices,
    wz1_ref, bz1_ref, wr1_ref, br1_ref, wq1_ref, bq1_ref,
    wz2_ref, bz2_ref, wr2_ref, br2_ref, wq2_ref, bq2_ref,
    wf1_ref, bf1_ref, wf2_ref, bf2_ref,
    *,
    width: int,
    masks: dict,
):
    """Separable ConvGRU + flow head on VMEM values.

    `x_parts`/`x_slices`: the non-hidden blocks of the virtual hx concat
    with their input-channel weight slices (the concat is never formed).
    Returns (h' bf16, delta f32)."""
    ch = h.shape[1]

    for kh, kw, wz, bz, wr, br, wq, bq in (
        (1, 5, wz1_ref, bz1_ref, wr1_ref, br1_ref, wq1_ref, bq1_ref),
        (5, 1, wz2_ref, bz2_ref, wr2_ref, br2_ref, wq2_ref, bq2_ref),
    ):
        taps = _taps(kh, kw)
        h_sh = _shifted(h, taps, width, masks)
        x_sh = [_shifted(x, taps, width, masks) for x in x_parts]

        def zr_conv(w_ref, b_ref):
            acc = _conv_from_shifted(h_sh, w_ref, None, cin_slice=slice(0, ch))
            for sh, sl in zip(x_sh, x_slices):
                acc = acc + _conv_from_shifted(sh, w_ref, None, cin_slice=sl)
            return acc + b_ref[...].astype(_F32)[None, :]

        z = jax.nn.sigmoid(zr_conv(wz, bz))
        r = jax.nn.sigmoid(zr_conv(wr, br))

        rh = (r * h.astype(_F32)).astype(_BF16)
        rh_sh = _shifted(rh, taps, width, masks)
        q_acc = _conv_from_shifted(rh_sh, wq, None, cin_slice=slice(0, ch))
        for sh, sl in zip(x_sh, x_slices):
            q_acc = q_acc + _conv_from_shifted(sh, wq, None, cin_slice=sl)
        q = jnp.tanh(q_acc + bq[...].astype(_F32)[None, :])

        h_f32 = (1.0 - z) * h.astype(_F32) + z * q
        h = _nan_to_num(h_f32).astype(_BF16)

    # flow head: 3x3 relu 3x3 (raft_core.py:169-181)
    taps3 = _taps(3, 3)
    mid = _conv_from_shifted(_shifted(h, taps3, width, masks), wf1_ref, bf1_ref)
    mid = jnp.maximum(mid, 0.0).astype(_BF16)
    delta = _conv_from_shifted(_shifted(mid, taps3, width, masks), wf2_ref, bf2_ref)
    return h, _nan_to_num(delta)


def _gru_flowhead_kernel(
    h_ref,
    x2d_ref,
    motion_ref,
    wz1_ref, bz1_ref, wr1_ref, br1_ref, wq1_ref, bq1_ref,
    wz2_ref, bz2_ref, wr2_ref, br2_ref, wq2_ref, bq2_ref,
    wf1_ref, bf1_ref, wf2_ref, bf2_ref,
    h_out_ref,
    delta_out_ref,
    *,
    width: int,
):
    h = h_ref[0].astype(_BF16)  # [HW, Ch]
    x2d = x2d_ref[0].astype(_BF16)  # [HW, Cx1]
    motion = motion_ref[0].astype(_BF16)  # [HW, Cx2]
    ch = h.shape[1]
    cx1 = x2d.shape[1]
    h_new, delta = _gru_flowhead_body(
        h,
        (x2d, motion),
        (slice(ch, ch + cx1), slice(ch + cx1, None)),
        wz1_ref, bz1_ref, wr1_ref, br1_ref, wq1_ref, bq1_ref,
        wz2_ref, bz2_ref, wr2_ref, br2_ref, wq2_ref, bq2_ref,
        wf1_ref, bf1_ref, wf2_ref, bf2_ref,
        width=width,
        masks={},
    )
    h_out_ref[0] = h_new.astype(_F32)
    delta_out_ref[0] = delta


def _w3(kernel):
    """[kh, kw, cin, cout] -> [kh*kw, cin, cout] bf16."""
    kh, kw, cin, cout = kernel.shape
    return kernel.reshape(kh * kw, cin, cout).astype(_BF16)


def prepare_gru_flowhead_params(gru_params, flowhead_params):
    """Loop-invariant bf16 kernel operands from the Flax param trees
    (`GRU2D` / `FlowHead2D` in models/raft.py). Call OUTSIDE the scan."""
    out = []
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        p = gru_params[name]
        out += [_w3(p["kernel"]), p["bias"].astype(_F32)]
    for name in ("conv1", "conv2"):
        p = flowhead_params[name]
        out += [_w3(p["kernel"]), p["bias"].astype(_F32)]
    return tuple(out)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "interpret")
)
def gru_flowhead_2d_pallas(
    h: jax.Array,
    x2d: jax.Array,
    motion: jax.Array,
    params: tuple,
    height: int,
    width: int,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused separable ConvGRU + flow head.

    Args:
      h: [B, H, W, Ch] hidden state (f32).
      x2d: [B, H, W, Cx1] context features (loop const).
      motion: [B, H, W, Cx2] motion features.
      params: `prepare_gru_flowhead_params` output.
      height/width: static map dims.
    Returns:
      (h' [B, H, W, Ch] f32, delta [B, H, W, 2] f32) —
      matching GRU2D + FlowHead2D (models/raft.py:44-92) in bf16 compute.
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    batch = h.shape[0]
    hw = height * width
    ch = h.shape[-1]

    def flat(x):
        return x.reshape(batch, hw, x.shape[-1])

    data_specs = [
        pl.BlockSpec(
            (1, hw, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        for c in (h.shape[-1], x2d.shape[-1], motion.shape[-1])
    ]
    w_specs = [
        pl.BlockSpec(p.shape, lambda b, n=p.ndim: (0,) * n, memory_space=pltpu.VMEM)
        for p in params
    ]
    h_out, delta = pl.pallas_call(
        functools.partial(_gru_flowhead_kernel, width=width),
        out_shape=(
            jax.ShapeDtypeStruct((batch, hw, ch), _F32),
            jax.ShapeDtypeStruct((batch, hw, 2), _F32),
        ),
        grid=(batch,),
        in_specs=data_specs + w_specs,
        out_specs=(
            pl.BlockSpec((1, hw, ch), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, 2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flat(h), flat(x2d), flat(motion), *params)
    return (
        h_out.reshape(batch, height, width, ch),
        delta.reshape(batch, height, width, 2),
    )


# ---------------------------------------------------------------------------
# MotionEncoder2D
# ---------------------------------------------------------------------------


def _motion_encoder_body(
    flow,
    ff1,
    corr,
    wc1_ref, bc1_ref, wc2_ref, bc2_ref,
    wf2_ref, bf2_ref,
    wm_ref, bm_ref,
    *,
    width: int,
    masks: dict,
):
    """Motion-encoder conv chain on VMEM values; returns the [HW, 126]
    merge-conv output (the flow concat is the caller's concern).

    `ff1` is conv_f1's [HW, 96] output, computed OUTSIDE the kernel as one
    XLA 7x7 conv (`_conv_f1`). History: round 3 ran conv_f1 in-kernel on an
    XLA-im2col'd [HW, 98] patch tensor, but the im2col itself (pad + 49
    static slices + concat) cost ~0.44 ms/iter on the compute line — more
    than both fused kernels combined (device trace 2026-08-19). 49 per-tap
    K=2 in-kernel dots are no better (a full MXU pass each); XLA's native
    conv is the cheap formulation for a 7x7 on 2 input channels."""

    def relu_bf16(x):
        return jnp.maximum(x, 0.0).astype(_BF16)

    # corr branch: 1x1 then 3x3
    cf = relu_bf16(_conv_from_shifted([corr], wc1_ref, bc1_ref))
    taps3 = _taps(3, 3)
    cf = relu_bf16(_conv_from_shifted(_shifted(cf, taps3, width, masks), wc2_ref, bc2_ref))

    # flow branch: conv_f1 arrives precomputed; 3x3 conv_f2 here
    ff = relu_bf16(_conv_from_shifted(_shifted(ff1, taps3, width, masks), wf2_ref, bf2_ref))

    # merge conv over concat(cf, ff) — virtual concat via weight slices
    ccf = cf.shape[1]
    cf_sh = _shifted(cf, taps3, width, masks)
    ff_sh = _shifted(ff, taps3, width, masks)
    acc = _conv_from_shifted(cf_sh, wm_ref, None, cin_slice=slice(0, ccf))
    acc = acc + _conv_from_shifted(ff_sh, wm_ref, None, cin_slice=slice(ccf, None))
    return _nan_to_num(jnp.maximum(acc + bm_ref[...].astype(_F32)[None, :], 0.0))


def _motion_encoder_kernel(
    flow_ref,
    ff1_ref,
    corr_ref,
    wc1_ref, bc1_ref, wc2_ref, bc2_ref,
    wf2_ref, bf2_ref,
    wm_ref, bm_ref,
    out_ref,
    *,
    width: int,
):
    flow = flow_ref[0]  # [HW, 2] f32
    out = _motion_encoder_body(
        flow,
        ff1_ref[0],
        corr_ref[0].astype(_BF16),
        wc1_ref, bc1_ref, wc2_ref, bc2_ref,
        wf2_ref, bf2_ref,
        wm_ref, bm_ref,
        width=width,
        masks={},
    )
    # motion = concat(out, flow) (raft_core.py:164-166)
    out_ref[0] = jnp.concatenate([out, flow], axis=1)


def _update2d_kernel(
    flow_ref,
    ff1_ref,
    corr_ref,
    h_ref,
    x2d_ref,
    wc1_ref, bc1_ref, wc2_ref, bc2_ref,
    wf2_ref, bf2_ref,
    wm_ref, bm_ref,
    wz1_ref, bz1_ref, wr1_ref, br1_ref, wq1_ref, bq1_ref,
    wz2_ref, bz2_ref, wr2_ref, br2_ref, wq2_ref, bq2_ref,
    wh1_ref, bh1_ref, wh2_ref, bh2_ref,
    h_out_ref,
    delta_out_ref,
    *,
    width: int,
):
    """The full 2D update chain (motion encoder + ConvGRU + flow head) in
    ONE VMEM-resident pass — used by the 2D-only RAFT model, whose chain has
    no CLFM between the stages (reference raft_core.py:110-181). The motion
    features never touch HBM; the GRU consumes (x2d, motion_out, flow) as
    virtual hx concat blocks."""
    masks: dict = {}
    flow = flow_ref[0]  # [HW, 2] f32
    out = _motion_encoder_body(
        flow,
        ff1_ref[0],
        corr_ref[0].astype(_BF16),
        wc1_ref, bc1_ref, wc2_ref, bc2_ref,
        wf2_ref, bf2_ref,
        wm_ref, bm_ref,
        width=width,
        masks=masks,
    )
    h = h_ref[0].astype(_BF16)
    x2d = x2d_ref[0].astype(_BF16)
    ch = h.shape[1]
    cx1 = x2d.shape[1]
    cm = out.shape[1]
    h_new, delta = _gru_flowhead_body(
        h,
        (x2d, out.astype(_BF16), flow.astype(_BF16)),
        (
            slice(ch, ch + cx1),
            slice(ch + cx1, ch + cx1 + cm),
            slice(ch + cx1 + cm, None),
        ),
        wz1_ref, bz1_ref, wr1_ref, br1_ref, wq1_ref, bq1_ref,
        wz2_ref, bz2_ref, wr2_ref, br2_ref, wq2_ref, bq2_ref,
        wh1_ref, bh1_ref, wh2_ref, bh2_ref,
        width=width,
        masks=masks,
    )
    h_out_ref[0] = h_new.astype(_F32)
    delta_out_ref[0] = delta


def prepare_motion_encoder_params(params):
    """bf16 kernel operands from the `MotionEncoder2D` param tree.

    conv_f1 stays in HWIO layout — it runs as one XLA conv in the wrapper
    (`_conv_f1`), not inside the kernel (see `_motion_encoder_body`)."""
    out = []
    for name in ("conv_c1", "conv_c2", "conv_f1", "conv_f2", "conv"):
        p = params[name]
        if name == "conv_f1":
            w = p["kernel"].astype(_BF16)  # [7, 7, 2, cout] HWIO
        else:
            w = _w3(p["kernel"])
        out += [w, p["bias"].astype(_F32)]
    return tuple(out)


def _conv_f1(flow, wf1, bf1):
    """conv_f1 (7x7 SAME, bias, relu) as one XLA conv, bf16 MXU with f32
    accumulation — the same rounding class as the in-kernel dots."""
    out = jax.lax.conv_general_dilated(
        flow.astype(_BF16),
        wf1,
        window_strides=(1, 1),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=_F32,
    )
    return jnp.maximum(out + bf1[None, None, None, :], 0.0).astype(_BF16)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "interpret")
)
def motion_encoder_2d_pallas(
    flow: jax.Array,
    corr: jax.Array,
    params: tuple,
    height: int,
    width: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused MotionEncoder2D (raft_core.py:142-166), bf16 compute.

    Returns [B, H, W, 126 + 2] f32 motion features (conv output || flow).
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    batch = flow.shape[0]
    hw = height * width
    cout = params[-2].shape[-1] + flow.shape[-1]

    # conv_f1 runs as one XLA conv; the kernel's flow branch starts at
    # conv_f2 (see _motion_encoder_body for why not im2col or in-kernel)
    ff1 = _conv_f1(flow, params[4], params[5])
    kparams = params[:4] + params[6:]

    def flat(x):
        return x.reshape(batch, hw, x.shape[-1])

    data_specs = [
        pl.BlockSpec(
            (1, hw, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        for c in (flow.shape[-1], ff1.shape[-1], corr.shape[-1])
    ]
    w_specs = [
        pl.BlockSpec(p.shape, lambda b, n=p.ndim: (0,) * n, memory_space=pltpu.VMEM)
        for p in kparams
    ]
    out = pl.pallas_call(
        functools.partial(_motion_encoder_kernel, width=width),
        out_shape=jax.ShapeDtypeStruct((batch, hw, cout), _F32),
        grid=(batch,),
        in_specs=data_specs + w_specs,
        out_specs=pl.BlockSpec(
            (1, hw, cout), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flat(flow.astype(_F32)), flat(ff1), flat(corr), *kparams)
    return out.reshape(batch, height, width, cout)


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def update_2d_pallas(
    h: jax.Array,
    x2d: jax.Array,
    flow: jax.Array,
    corr: jax.Array,
    me_params: tuple,
    gf_params: tuple,
    height: int,
    width: int,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Whole 2D update iteration (motion encoder + GRU + flow head) as ONE
    Pallas kernel — for the 2D-only RAFT chain where no CLFM sits between
    the stages. Same numerics contract as the split kernels.

    Returns (h' [B, H, W, Ch] f32, delta [B, H, W, 2] f32).
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU runs the interpreter (tests)
    batch = flow.shape[0]
    hw = height * width
    ch = h.shape[-1]
    ff1 = _conv_f1(flow, me_params[4], me_params[5])
    params = tuple(me_params[:4]) + tuple(me_params[6:]) + tuple(gf_params)

    def flat(x):
        return x.reshape(batch, hw, x.shape[-1])

    data = [
        flat(flow.astype(_F32)),
        flat(ff1),
        flat(corr),
        flat(h),
        flat(x2d),
    ]
    data_specs = [
        pl.BlockSpec(
            (1, hw, a.shape[-1]), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        for a in data
    ]
    w_specs = [
        pl.BlockSpec(p.shape, lambda b, n=p.ndim: (0,) * n, memory_space=pltpu.VMEM)
        for p in params
    ]
    # Under opt-in bf16 compute (cfgs compute_dtype='bfloat16') the hidden /
    # context inputs arrive bf16 and Mosaic's widening buffers push the
    # kernel's scoped-vmem stack to 105.5M — past the 100M default-path
    # limit (measured 2026-08-20, raft 960x540). Bump the limit only for
    # that mixed-dtype trace; the f32 default path keeps the exact literal
    # it was hardware-validated with.
    any_bf16_data = any(a.dtype == jnp.bfloat16 for a in (h, x2d, corr, flow))
    h_out, delta = pl.pallas_call(
        functools.partial(_update2d_kernel, width=width),
        out_shape=(
            jax.ShapeDtypeStruct((batch, hw, ch), _F32),
            jax.ShapeDtypeStruct((batch, hw, 2), _F32),
        ),
        grid=(batch,),
        in_specs=data_specs + w_specs,
        out_specs=(
            pl.BlockSpec((1, hw, ch), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, 2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(112 if any_bf16_data else 100) * 1024 * 1024
        ),
        interpret=interpret,
    )(*data, *params)
    return (
        h_out.reshape(batch, height, width, ch),
        delta.reshape(batch, height, width, 2),
    )
