"""Correlation / cost-volume ops for the 2D branches.

- `correlation2d`: PWC-style local cost volume over a (2d+1)^2 displacement
  window. Reference semantics: models/csrc/wrapper.py:40-57 and the CUDA
  kernel's channel order (correlation_forward_kernel.cu:30,44): channel
  tc = (ty_shift + d) * (2d+1) + (tx_shift + d), i.e. vertical-shift major.
  Out-of-bounds windows contribute 0 (zero padding). Implemented as an
  unrolled pad+slice loop; XLA fuses the 81 elementwise products and autodiff
  is free (no custom backward needed, unlike the CUDA version).

- `all_pairs_correlation_pyramid` + `corr_lookup_2d`: RAFT-style global cost
  volume with an avg-pooled pyramid and a bilinear windowed lookup.
  Reference semantics: models/raft_core.py:52-107.

NHWC throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .gridsample import grid_sample_pixel


@functools.partial(jax.jit, static_argnames=("max_displacement",))
def correlation2d(
    input1: jax.Array, input2: jax.Array, max_displacement: int
) -> jax.Array:
    """Local cost volume: mean-over-channels dot product at each displacement.

    Args:
      input1: [B, H, W, C] frame-1 features.
      input2: [B, H, W, C] frame-2 features.
      max_displacement: window radius d.
    Returns:
      [B, H, W, (2d+1)^2] cost volume, vertical-shift-major channel order.
    """
    d = max_displacement
    height, width = input1.shape[1:3]
    input1 = input1.astype(jnp.float32)
    input2 = jnp.pad(
        input2.astype(jnp.float32), ((0, 0), (d, d), (d, d), (0, 0))
    )
    costs = []
    for i in range(2 * d + 1):  # vertical shift (major)
        for j in range(2 * d + 1):  # horizontal shift (minor)
            shifted = input2[:, i : i + height, j : j + width, :]
            costs.append(jnp.mean(input1 * shifted, axis=-1))
    return jnp.stack(costs, axis=-1)


def all_pairs_correlation_pyramid(
    fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4
) -> list[jax.Array]:
    """RAFT all-pairs correlation volume + avg-pool pyramid.

    Args:
      fmap1, fmap2: [B, H, W, C] feature maps (already through the aligner).
      num_levels: pyramid depth.
    Returns:
      list of [B*H*W, H/2^i, W/2^i, 1] volumes (f32).

    Reference semantics: models/raft_core.py:52-68. The B*H*W leading axis is
    kept so level-i lookups are a plain batched grid sample.
    """
    batch, height, width, dim = fmap1.shape
    f1 = fmap1.reshape(batch, height * width, dim).astype(jnp.float32)
    f2 = fmap2.reshape(batch, height * width, dim).astype(jnp.float32)
    # f32-precision matmul: the reference builds cost volumes in fp32 with
    # autocast disabled (raft_core.py:53); neighbour ordering and lookup
    # values are numerically load-bearing.
    corr = jnp.einsum(
        "bnd,bmd->bnm",
        f1,
        f2,
        # 3-pass f32 (~1e-5 rel err) — well inside eval tolerance at half
        # the MXU cost of HIGHEST
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )
    corr = corr / jnp.sqrt(jnp.float32(dim))
    corr = corr.reshape(batch * height * width, height, width, 1)

    pyramid = [corr]
    for _ in range(num_levels - 1):
        # 2x2 average pool as reshape+mean: lax.reduce_window costs ~3 ms
        # per level on these [8160, H, W] volumes (traced on v5e); the
        # reshape form is an order of magnitude cheaper and bit-identical
        # for even H/W. Odd trailing rows/cols are dropped, matching
        # avg_pool2d's floor semantics (reference raft_core.py:66).
        rows, h, w, _ = corr.shape
        h2, w2 = h // 2, w // 2
        corr = corr[:, : h2 * 2, : w2 * 2, 0].reshape(rows, h2, 2, w2, 2)
        corr = jnp.mean(corr, axis=(2, 4))[..., None]
        pyramid.append(corr)
    return pyramid


def _lookup_pad(radius: int) -> int:
    # ZERO since round 4: the one-hot selection needs no zero margin at all.
    # A window tap outside [0, dim) matches no iota column, so its one-hot
    # row is all-zero and the selection dot yields an EXACT zero — the same
    # value a zero pad entry produced (grid_sample zeros semantics,
    # raft_core.py:96-107). Removing the pad shrinks the level-0 table from
    # [w+2p, h+2p] to [w, h] (-34% of the dominant per-iteration HBM read at
    # 960x540), deletes the pad-build writes, and is bit-exact for every
    # storage mode (pad zeros never set a row's int8 quantisation scale).
    # Kept as a function so the margin can be reintroduced for A/Bs.
    return 0


def resolve_lookup_storage(lookup_storage: str, fast: bool) -> str:
    """Resolve the `model.lookup_storage: auto|split|bf16|int8` knob: `auto`
    stores the volume int8 on the fast-inference path and keeps the exact
    bf16 hi/lo split otherwise. Shared by every RAFT-family core."""
    if lookup_storage != "auto":
        return lookup_storage
    return "int8" if fast else "split"


def pad_pyramid_for_lookup(
    pyramid: list[jax.Array], radius: int = 4, storage: str = "split"
):
    """Zero-pad + low-precision packing of each pyramid level for
    `corr_lookup_2d`.

    The pyramid is constant across RAFT iterations while the lookup runs every
    iteration; hoisting the (hundreds of MB) pad writes out of the refinement
    scan saves that HBM traffic per iteration. The in-loop lookup is one-hot
    selection matmuls, and one-hot entries are exact in ANY dtype — so the
    storage dtype only quantises the stored values, never the selection.

    storage="split" (exact, default / training): each level becomes
    [rows, w+2p, 2*(h+2p)] bfloat16 (w-major, see below; p = _lookup_pad = 0
    since round 4 — out-of-range window taps zero out via empty one-hot
    selection rows instead of stored pad entries) with the padded map
    split into bf16 high/low halves concatenated along the h axis:
    hi = bf16(v), lo = bf16(v - hi). The in-loop selection matmuls then run as
    single-pass bf16 MXU ops, and re-summing hi+lo reconstructs v to ~2^-18
    relative — tighter AND cheaper than 3-pass HIGH f32 matmuls.

    storage="bf16": hi half only, [rows, w+2p, h+2p] bfloat16. Halves the
    per-iteration HBM volume traffic at ~2^-9 relative error on the looked-up
    values (measured flow output delta ~1e-3 px).

    storage="int8" (fast inference): per-row symmetric int8 quantisation —
    each level becomes ([rows, w+2p, h+2p] int8, [rows] f32 scale) with
    scale = max|row| / 127. Quarter of f32 / half of bf16 HBM traffic; the
    selection matmuls run on the int8 MXU path with exact s32 accumulation,
    dequantised once per row after the bilinear blend. Max error is
    max|row|/254 ≈ 0.4% of the row's peak correlation (forward-only:
    quantisation has no useful gradient).
    """
    assert storage in ("split", "bf16", "int8"), storage
    pad = _lookup_pad(radius)
    hmajor = storage != "split" and lookup_hmajor_enabled()
    out = []
    for corr in pyramid:
        padded = jnp.pad(corr[..., 0], ((0, 0), (pad, pad), (pad, pad)))
        # store w-major ([rows, w+2p, h+2p]): the in-loop selection einsums
        # then consume the array in its default layout. In h-major storage
        # XLA assigns the transposed layout to the einsum operand but the
        # scan-carried constant keeps the default one — and the mismatch
        # materialised as a full pyramid relayout copy EVERY iteration
        # (~320 MB/iter in the compiled while body).
        # CAMLIFLOW_LOOKUP_HMAJOR flips the fast-path storage to h-major
        # ([rows, h+2p, w+2p]) AND flips the lookup's contraction order so
        # the fat stage-1 einsum emits w lanes (94% MXU columns at the
        # flagship's level-0 w=120 vs 53% at h=68) with no relayout between
        # the stages — the old relayout trap above applied to h-major
        # storage consumed by the w-contracting einsum, not to this pairing.
        if not hmajor:
            padded = padded.transpose(0, 2, 1)
        if storage == "int8":
            from .geometry import quantize_rows_int8

            q, scale = quantize_rows_int8(
                padded.reshape(padded.shape[0], -1)
            )
            out.append((q.reshape(padded.shape), scale[:, 0]))
            continue
        hi = padded.astype(jnp.bfloat16)
        if storage == "bf16":
            out.append(hi)
            continue
        lo = (padded - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out.append(jnp.concatenate([hi, lo], axis=-1))
    return out


def padded_pyramid_from_features(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
    radius: int = 4,
    storage: str = "split",
):
    """Build the padded lookup pyramid DIRECTLY from the aligned feature maps
    — the fast-path fusion of `all_pairs_correlation_pyramid` +
    `pad_pyramid_for_lookup`.

    Key identity: avg-pooling the correlation volume over frame-2 pixels
    equals correlating against avg-pooled frame-2 features (the dot product
    is bilinear), and zero-padding the volume equals padding frame 2 with
    zero FEATURE vectors. So each pyramid level is ONE einsum of fmap1
    against a padded pooled w-major frame-2 table, quantised per row — the
    pooling reads/writes of the f32 volume (~350 MB at 960x540), the
    separate pad pass and its relaunch boundaries all disappear.

    Semantics match `pad_pyramid_for_lookup(all_pairs_correlation_pyramid())`
    up to f32 summation order (one HIGH-precision dot vs pool-of-dots,
    ~1e-7 relative); pad columns are exact zeros either way. Training keeps
    the exact path: storage="split" simply composes the two original
    functions (bit-identical), so only the approximate int8/bf16 fast path
    takes the fused route.

    Reference semantics: models/raft_core.py:52-68 (volume + avg_pool2d
    pyramid with floor cropping) + the lookup padding of raft_core.py:96-107.
    """
    if storage == "split":
        return pad_pyramid_for_lookup(
            all_pairs_correlation_pyramid(fmap1, fmap2, num_levels),
            radius,
            storage=storage,
        )
    assert storage in ("bf16", "int8"), storage
    from .geometry import quantize_rows_int8

    batch, height, width, dim = fmap1.shape
    rows = batch * height * width
    pad = _lookup_pad(radius)
    hmajor = lookup_hmajor_enabled()
    f1 = fmap1.reshape(batch, rows // batch, dim).astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.float32(dim))

    out = []
    f2l = fmap2.astype(jnp.float32)
    for i in range(num_levels):
        if i:
            # 2x2 avg pool of frame-2 FEATURES == avg pool of the volume
            # (floor semantics: odd trailing rows/cols dropped, matching
            # all_pairs_correlation_pyramid / reference avg_pool2d)
            b2, lh, lw, c = f2l.shape
            f2l = jnp.mean(
                f2l[:, : lh // 2 * 2, : lw // 2 * 2].reshape(
                    b2, lh // 2, 2, lw // 2, 2, c
                ),
                axis=(2, 4),
            )
        lh, lw = f2l.shape[1:3]
        ph, pw = lh + 2 * pad, lw + 2 * pad
        # padded w-major table [B, C, pw*ph]: column x*ph + y holds the
        # (pooled) feature of frame-2 pixel (y-pad, x-pad), zeros elsewhere —
        # a zero feature column dots to an exact zero corr value
        tab = jnp.pad(f2l, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        if hmajor:
            # h-major table [B, C, ph*pw]: column y*pw + x (see
            # pad_pyramid_for_lookup / CAMLIFLOW_LOOKUP_HMAJOR)
            tab = tab.transpose(0, 3, 1, 2).reshape(batch, dim, ph * pw)
        else:
            tab = tab.transpose(0, 3, 2, 1).reshape(batch, dim, pw * ph)
        vol = (
            jnp.einsum(
                "bnd,bdm->bnm",
                f1,
                tab,
                precision=jax.lax.Precision.HIGH,
                preferred_element_type=jnp.float32,
            )
            * scale
        ).reshape(rows, pw * ph)
        lvl_shape = (rows, ph, pw) if hmajor else (rows, pw, ph)
        if storage == "int8":
            q, qscale = quantize_rows_int8(vol)
            out.append((q.reshape(lvl_shape), qscale[:, 0]))
        else:
            out.append(vol.astype(jnp.bfloat16).reshape(lvl_shape))
    return out


@functools.partial(jax.jit, static_argnames=("radius", "storage"))
def corr_lookup_2d(
    pyramid: list[jax.Array], coords: jax.Array, radius: int = 4,
    storage: str = "split",
) -> jax.Array:
    """Bilinear windowed lookup into the all-pairs pyramid (pads inline).

    Prefer `corr_lookup_2d_padded` + a hoisted `pad_pyramid_for_lookup` when
    looking up repeatedly (RAFT iterations): the pyramid is loop-constant and
    its pad writes are hundreds of MB per call at full resolution.
    """
    return corr_lookup_2d_padded(
        pad_pyramid_for_lookup(pyramid, radius, storage=storage), coords,
        radius, storage=storage,
    )


@functools.partial(jax.jit, static_argnames=("radius", "storage"))
def corr_lookup_2d_padded(
    padded_pyramid: list, coords: jax.Array, radius: int = 4,
    storage: str = "split",
) -> jax.Array:
    """Bilinear windowed lookup into the pre-padded all-pairs pyramid.

    Args:
      padded_pyramid: output of `pad_pyramid_for_lookup` with the same
        `storage` mode (w-major, [rows, w+2p, halves*(h+2p)] per level with
        p = _lookup_pad(radius) (0 since round 4 — window taps outside
        [0, dim) match no one-hot column and contribute exact zeros, the
        same value stored pad entries produced);
        int8 levels are ([rows, w+2p, h+2p] int8, [rows]
        scale) pairs).
      coords: [B, H, W, 2] target pixel coordinates in frame 2 (grid + flow).
      radius: window radius r; each level contributes (2r+1)^2 channels.
      storage: "split" | "bf16" | "int8", see `pad_pyramid_for_lookup`.
    Returns:
      [B, H, W, num_levels * (2r+1)^2] correlation features.

    Reference semantics: models/raft_core.py:70-107 (grid_sample with zeros
    padding, align_corners=True). TPU formulation: the (2r+1)^2 window samples
    of one pixel share a single fractional offset, so instead of (2r+1)^2
    independent bilinear gathers (which XLA lowers to millions of single-float
    gathers), extract ONE contiguous (2r+2)^2 patch per pixel at the integer
    base coordinate and apply the 2x2 bilinear blend to the whole patch —
    exactly the same float math, ~10x faster on TPU.

    Both one-hot selection matmuls run as single-pass bf16 MXU ops against
    the hi/lo-split volume (see `pad_pyramid_for_lookup`): one-hot entries
    are exact in bf16, a one-hot selection of bf16 values is exact in the
    f32 accumulator (it sums a single product), and the hi+lo recombination
    restores the f32 volume to ~2^-18 relative — cheaper AND tighter than
    3-pass HIGH f32 matmuls.

    Reference quirk preserved for checkpoint parity: the window offsets enter
    as (x + dy_i, y + dx_j) with channel k = i*span + j
    (raft_core.py:79-85 + 100-104), i.e. the x offset is the *major* index.
    """
    batch, height, width, _ = coords.shape
    r = radius
    span = 2 * r + 1
    patch = 2 * r + 2
    pad = _lookup_pad(r)
    halves = 2 if storage == "split" else 1

    hmajor = storage != "split" and lookup_hmajor_enabled()
    coords_flat = coords.reshape(batch * height * width, 2).astype(jnp.float32)
    out_pyramid = []
    for i, padded2 in enumerate(padded_pyramid):
        scale = None
        if storage == "int8":
            padded2, scale = padded2
        if hmajor:
            # h-major fast-path storage: [rows, h+2p, w+2p] (halves == 1)
            rows, ph, pw = padded2.shape
        else:
            # w-major storage: [rows, w+2p, halves*(h+2p)]
            rows, pw = padded2.shape[0], padded2.shape[1]
            ph = padded2.shape[2] // halves  # [hi | lo] halves along height
        level_h, level_w = ph - 2 * pad, pw - 2 * pad
        c = coords_flat / (2.0**i)
        # clamp far-out coords; everything at/beyond the clamp samples only
        # zero padding, matching grid_sample's zeros mode (at the clamp the
        # fractional part is 0 and every contributing tap lands outside
        # [0, dim), so the clamped result is the true all-zeros result)
        cx = jnp.clip(c[:, 0], -(r + 1.0), level_w + r)
        cy = jnp.clip(c[:, 1], -(r + 1.0), level_h + r)
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = (cx - x0)[:, None, None]
        fy = (cy - y0)[:, None, None]

        start_y = (y0 + (pad - r)).astype(jnp.int32)
        start_x = (x0 + (pad - r)).astype(jnp.int32)

        if storage == "int8":
            # fast path: the int8 volume is convert-fused into the bf16
            # one-hot selection dots — HBM reads stay s8 (half of bf16), the
            # MXU runs the same bf16 one-hot path as the hi-only mode, and
            # the selection stays exact (int8 values are exact in bf16).
            # Measured FASTER than both the s8xs8 MXU path (whose s32
            # patches drew relayout copies) and a blended-selection variant
            # (see PERF.md round-3 notes). Dequant: one per-row multiply
            # after the convex bilinear blend.
            padded2 = padded2.astype(jnp.bfloat16)

        if storage != "split" and lookup_fold_enabled():
            # bf16 two-tap fold: the 2x2 bilinear blend rides the selection
            # matrices — w(i) = (1-f)*onehot(start+i) + f*onehot(start+i+1),
            # span x span output, no patch slicing, no blend fusion, and no
            # {2,1,0}->{0,2,1} relayout copy between einsum and blend (the
            # trace's #2 lookup cost). Each bf16xbf16 product is exact in
            # the f32 accumulator; only the blend WEIGHTS round to bf16
            # (~2^-9, same order as the int8 storage envelope — numerics-
            # gated). The round-4 fold attempt lost 16 ms because its
            # two-tap matrices were f32 (3-pass HIGH matmuls, 3x MXU);
            # bf16 taps keep the single-pass path. OOB taps still zero out
            # (both component one-hots are empty outside [0, dim)).
            span_ids = jax.lax.broadcasted_iota(jnp.int32, (1, span, 1), 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ph), 2)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pw), 2)
            y0_tap = start_y[:, None, None] + span_ids
            x0_tap = start_x[:, None, None] + span_ids
            fy_b = fy.astype(jnp.bfloat16)
            fx_b = fx.astype(jnp.bfloat16)
            row_sel = (row_ids == y0_tap).astype(jnp.bfloat16) * (
                jnp.bfloat16(1) - fy_b
            ) + (row_ids == y0_tap + 1).astype(jnp.bfloat16) * fy_b
            col_sel = (col_ids == x0_tap).astype(jnp.bfloat16) * (
                jnp.bfloat16(1) - fx_b
            ) + (col_ids == x0_tap + 1).astype(jnp.bfloat16) * fx_b
            if storage == "int8":
                padded2 = padded2.astype(jnp.bfloat16)
            if hmajor:
                rslab = jnp.einsum(
                    "rph,rhw->rpw", row_sel, padded2,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                blended = jnp.einsum(
                    "rqw,rpw->rqp", col_sel, rslab,
                    preferred_element_type=jnp.float32,
                )  # [rows, span(x), span(y)] — blended, x-major
            else:
                cslab = jnp.einsum(
                    "rqw,rwh->rqh", col_sel, padded2,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                blended = jnp.einsum(
                    "rth,rph->rtp", cslab, row_sel,
                    preferred_element_type=jnp.float32,
                )  # [rows, span(x), span(y)] — blended, x-major
            if scale is not None:
                blended = blended * scale[:, None, None]
            if corr_bf16_out_enabled():
                blended = blended.astype(jnp.bfloat16)
            sampled = blended.reshape(rows, span * span)
            out_pyramid.append(
                sampled.reshape(batch, height, width, span * span)
            )
            continue

        patch_ids = jax.lax.broadcasted_iota(jnp.int32, (1, patch, 1), 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ph), 2)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pw), 2)
        row_sel = (row_ids == start_y[:, None, None] + patch_ids).astype(
            jnp.bfloat16
        )  # [rows, P, ph]
        col_sel = (col_ids == start_x[:, None, None] + patch_ids).astype(
            jnp.bfloat16
        )  # [rows, P, pw]
        if hmajor:
            # h-major contraction order: row (y) selection first — the fat
            # table-reading einsum emits pw lanes (94% MXU columns at the
            # flagship level-0 vs 53% for ph); stage 2 contracts w between
            # two per-row operands. Every intermediate is still a one-hot
            # selection of a single stored value, so the bf16 cast is
            # lossless and the patch values are bit-identical to the
            # w-major chain.
            rslab = jnp.einsum(
                "rph,rhw->rpw", row_sel, padded2,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # [rows, P, pw]
            patches = jnp.einsum(
                "rqw,rpw->rqp", col_sel, rslab,
                preferred_element_type=jnp.float32,
            )  # [rows, Q(x), P(y)] — x-major
        else:
            # stage 1: column (x) selection over the halves; the f32 result
            # holds pure bf16 values (one-hot selection), so the cast to
            # bf16 is lossless
            cslab = jnp.einsum(
                "rqw,rwh->rqh", col_sel, padded2,
                preferred_element_type=jnp.float32,
            )  # [rows, Q, halves*ph]
            cslab = cslab.astype(jnp.bfloat16).reshape(
                rows, patch * halves, ph
            )
            # stage 2: row (y) selection per half, then recombine hi + lo.
            # Output is [rows, Q(x), P(y)] — x-major, matching the
            # reference's channel order without a final transpose.
            patches2 = jnp.einsum(
                "rth,rph->rtp", cslab, row_sel,
                preferred_element_type=jnp.float32,
            ).reshape(rows, patch, halves, patch)
            patches = jnp.sum(patches2, axis=2)
        if halves == 1:
            # bf16/int8 storage: each patch entry is a one-hot selection of a
            # bf16-exact value, so this cast is LOSSLESS — and it halves the
            # {2,1,0}->{0,2,1} relayout copies XLA inserts between the
            # einsum and the blend (the CLFM image->point sampling matmul
            # downstream wants rows-minor; see PERF.md). The split path sums
            # hi+lo halves and must stay f32.
            patches = patches.astype(jnp.bfloat16)

        if storage != "split" and lookup_mmblend_enabled():
            # Matmul blend: the strided-slice blend below forces a
            # {2,1,0}->{0,2,1} relayout of the [rows, Q, P] einsum output
            # (the blend fusion vectorises rows-minor; 3.65 ms/frame on the
            # flagship compute line). Selecting the 4 bilinear corners with
            # ONE constant 0/1 matmul keeps the whole chain in the matmul
            # layout domain — no relayout, no slice fusion. Values are
            # BIT-identical: a 0/1 selection of a bf16 value is exact in the
            # f32 accumulator, and the weighted 4-term sum below multiplies
            # and associates in exactly the slice-blend's order. Unlike the
            # adjudicated-negative two-tap FOLD (which made the *selection*
            # matrices heavier: round-3/4 in-model losses), the selection
            # einsums are untouched; only the elementwise blend moves onto
            # the MXU ([rows,100]x[100,324] ~ 0.5 GFLOP/iter, MXU-trivial).
            flat = patches.reshape(rows, patch * patch)
            corners = jnp.einsum(
                "rt,tc->rc",
                flat,
                _corner_blend_matrix(patch, span),
                preferred_element_type=jnp.float32,
            ).reshape(rows, 4, span * span)
            fx2 = fx[:, :, 0]  # [rows, 1]
            fy2 = fy[:, :, 0]
            blended = (
                (1.0 - fx2) * (1.0 - fy2) * corners[:, 0]
                + (1.0 - fx2) * fy2 * corners[:, 1]
                + fx2 * (1.0 - fy2) * corners[:, 2]
                + fx2 * fy2 * corners[:, 3]
            )  # [rows, span*span] — x-major flat channels
            if scale is not None:
                blended = blended * scale[:, None]
            if corr_bf16_out_enabled():
                blended = blended.astype(jnp.bfloat16)
            out_pyramid.append(
                blended.reshape(batch, height, width, span * span)
            )
            continue

        blended = (
            (1.0 - fx) * (1.0 - fy) * patches[:, :-1, :-1]
            + (1.0 - fx) * fy * patches[:, :-1, 1:]
            + fx * (1.0 - fy) * patches[:, 1:, :-1]
            + fx * fy * patches[:, 1:, 1:]
        )  # [rows, span(x), span(y)] — x-major directly (see stage 2)
        if scale is not None:
            # int8 dequant AFTER the (convex) blend — equivalent to
            # dequantising every tap at 1/(Q*P)th the multiplies
            blended = blended * scale[:, None, None]
        # channel k = i*span + j with i the x-offset (reference quirk);
        # stage 2 already emits x-major so no transpose (a materialised
        # [8160,10,10] relayout per level per iteration) is needed
        if storage != "split" and corr_bf16_out_enabled():
            # fast-path bf16 output: the eval while-body HLO shows the
            # lookup output passing through 4 layout forms per level per
            # iteration (~43 MB/iter of relayout copies at 960x540) — a
            # bf16 feature map halves that churn and the downstream
            # CLFM/motion-encoder reads. ~2^-9 relative rounding on top of
            # the int8 quantisation envelope (numerics-gated).
            blended = blended.astype(jnp.bfloat16)
        sampled = blended.reshape(rows, span * span)
        out_pyramid.append(sampled.reshape(batch, height, width, span * span))
    return jnp.concatenate(out_pyramid, axis=-1)


@functools.lru_cache(maxsize=None)
def _corner_blend_matrix(patch: int, span: int):
    """Constant 0/1 corner-selection matrix for the matmul blend.

    C[q*patch + p, f*span^2 + i*span + j] = 1 iff (q, p) is bilinear corner
    f of blended output channel (i, j): corner order (dy, dx) in
    ((0,0), (0,1), (1,0), (1,1)) with q = i + dx_f... specifically corner f
    selects (q, p) = (i + a_f, j + b_f) for (a, b) in
    ((0,0), (0,1), (1,0), (1,1)) — matching the slice blend's term order
    ((:-1,:-1), (:-1,1:), (1:,:-1), (1:,1:)). bf16 entries are exact; the
    matrix is tiny ([patch^2, 4*span^2] = 65 KB at radius 4) and embeds in
    the HLO as a constant.
    """
    import numpy as np

    mat = np.zeros((patch * patch, 4 * span * span), np.float32)
    for f, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        for i in range(span):
            for j in range(span):
                mat[(i + a) * patch + (j + b), f * span * span + i * span + j] = 1.0
    return jnp.asarray(mat, jnp.bfloat16)


def lookup_mmblend_enabled() -> bool:
    """Trace-time switch for the matmul bilinear blend in the fast-path 2D
    lookup (int8/bf16 storages): select the 4 bilinear corners of every
    blended channel with one constant 0/1 MXU matmul instead of strided
    slices, eliminating the {2,1,0}->{0,2,1} relayout copy between the
    selection einsum and the blend fusion (3.65 ms/frame on the flagship
    compute line, tools/trace_compute_line.py 2026-08-20). Values are
    bit-identical to the slice blend (pinned by tests). Default OFF until
    the on-chip A/B passes (CLAUDE.md hard rule). Export
    CAMLIFLOW_LOOKUP_MMBLEND=1 to enable.
    """
    import os

    return os.environ.get("CAMLIFLOW_LOOKUP_MMBLEND", "0") != "0"


def lookup_hmajor_enabled() -> bool:
    """Trace-time switch for h-major fast-path lookup storage + flipped
    contraction order (row selection first — the fat stage-1 einsum emits
    w lanes: 94% MXU columns at the flagship level-0 w=120 vs 53% at h=68).
    Exact-path values are bit-identical (one-hot selections); applies to
    int8/bf16 storage only — split (training/exact) keeps w-major. Default
    ON since the on-chip A/B (2026-08-20): standalone level-0 chain 0.537
    vs 0.599 ms/iter, in-model RAFT 31.7 vs 32.3 ms/frame, flagship neutral
    (83.4 both legs), both models compiled + executed on v5e per the
    CLAUDE.md hard rule. Export CAMLIFLOW_LOOKUP_HMAJOR=0 to restore the
    legacy w-major layout. Probe: tools/probe_lookup_layout.py.
    """
    import os

    return os.environ.get("CAMLIFLOW_LOOKUP_HMAJOR", "1") != "0"


def lookup_fold_enabled() -> bool:
    """Trace-time switch for the bf16 two-tap fold of the bilinear blend
    into the lookup selection matrices (fast-inference storages only;
    default OFF until the on-chip numerics gate + timing A/B pass,
    CLAUDE.md hard rule). Export CAMLIFLOW_LOOKUP_FOLD=1 to enable."""
    import os

    return os.environ.get("CAMLIFLOW_LOOKUP_FOLD", "0") != "0"


def corr_bf16_out_enabled() -> bool:
    """Trace-time switch for bf16 fast-path lookup output (default OFF until
    the on-chip numerics gate + timing A/B pass, CLAUDE.md hard rule).
    Export CAMLIFLOW_CORR_BF16_OUT=1 to enable."""
    import os

    return os.environ.get("CAMLIFLOW_CORR_BF16_OUT", "0") != "0"
