"""RAFT: 2D optical flow with all-pairs correlation + ConvGRU refinement.

Reference semantics: models/raft_core.py (Encoder2D, Correlation2D, GRU2D,
MotionEncoder2D, FlowHead2D, ConvexUpsampler2D, RAFTCore) and models/raft.py
(padding, [-1, 1] normalisation, sequence loss).

TPU-first design departures:
- The refinement loop is a `nn.scan` so XLA reuses the big per-iteration
  buffers (the 324-channel corr lookup) instead of unrolling.
- The all-pairs volume is built once as an f32 MXU matmul (ops/correlation.py).

NHWC throughout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.correlation import (
    corr_lookup_2d_padded,
    padded_pyramid_from_features,
    resolve_lookup_storage,
)
from ..ops.image import InputPadder, convex_upsample, mesh_grid
from ..nn.layers import compute_dtype, compute_precision, dense, torch_kernel_init
from ..nn.resnet import ResNetEncoder2D
from .losses import calc_sequence_loss
from .metrics import compute_2d_metrics, merge_metrics, scalar_metric


def _conv(out, kernel, name):
    """Raw torch-style conv with symmetric padding, bias, and torch init."""
    pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel)
    return nn.Conv(
        out, kernel, padding=pad, kernel_init=torch_kernel_init,
        dtype=compute_dtype(), name=name,
    )


class GRU2D(nn.Module):
    """Separable 1x5 + 5x1 ConvGRU (raft_core.py:110-139)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        for suffix, kernel in (("1", (1, 5)), ("2", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(_conv(self.hidden_dim, kernel, f"convz{suffix}")(hx))
            r = nn.sigmoid(_conv(self.hidden_dim, kernel, f"convr{suffix}")(hx))
            q = nn.tanh(
                _conv(self.hidden_dim, kernel, f"convq{suffix}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1.0 - z) * h + z * q
        return jnp.nan_to_num(h)


class MotionEncoder2D(nn.Module):
    """corr + flow -> motion features (raft_core.py:142-166)."""

    @nn.compact
    def __call__(self, flow, corr):
        corr_feat = nn.relu(_conv(256, (1, 1), "conv_c1")(corr))
        corr_feat = nn.relu(_conv(192, (3, 3), "conv_c2")(corr_feat))
        flow_feat = nn.relu(_conv(128, (7, 7), "conv_f1")(flow))
        flow_feat = nn.relu(_conv(64, (3, 3), "conv_f2")(flow_feat))
        out = nn.relu(
            _conv(128 - 2, (3, 3), "conv")(
                jnp.concatenate([corr_feat, flow_feat], axis=-1)
            )
        )
        out = jnp.nan_to_num(out)
        return jnp.concatenate([out, flow], axis=-1)


class FlowHead2D(nn.Module):
    """Hidden state -> delta flow (raft_core.py:169-181)."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        out = _conv(2, (3, 3), "conv2")(
            nn.relu(_conv(self.hidden_dim, (3, 3), "conv1")(x))
        ).astype(jnp.float32)
        return jnp.nan_to_num(out)


class ConvexUpsampler2D(nn.Module):
    """Learned convex upsampling mask, 0.25-scaled (raft_core.py:184-197)."""

    scale_factor: int = 8

    @nn.compact
    def __call__(self, h, flow):
        mask = _conv(256, (3, 3), "mask_0")(h.astype(jnp.float32))
        mask = nn.relu(mask)
        mask = _conv(self.scale_factor * self.scale_factor * 9, (1, 1), "mask_1")(mask)
        return convex_upsample(flow, 0.25 * mask, self.scale_factor)


class UpdateBlock2D(nn.Module):
    """One RAFT iteration; scanned over n_iters.

    Setup-style so the core can scan one shared instance and, at eval, call
    `upsample` once after the scan instead of convex-upsampling every
    iteration (the reference consumes only flow_preds[-1] at eval,
    raft.py:34-40). `upsample_each=False` removes the per-iteration upsample
    from the scanned body; param paths are unchanged either way.
    """

    corr_radius: int = 4
    upsample_each: bool = True
    # correlation-volume storage mode for the in-loop lookup ("split" exact,
    # "bf16", or the int8 fast-inference path — see pad_pyramid_for_lookup)
    lookup_storage: str = "split"
    # fused Pallas update chain (inference only): MotionEncoder2D and
    # GRU2D+FlowHead2D each run as ONE VMEM-resident bf16 kernel
    # (ops/pallas_update2d.py) instead of ~14 XLA conv ops per iteration
    fast_pallas: bool = False

    def setup(self):
        self.motion_encoder = MotionEncoder2D()
        self.gru = GRU2D()
        self.flow_head = FlowHead2D()
        self.convex_upsampler = ConvexUpsampler2D()

    def upsample(self, h, flow):
        return self.convex_upsampler(h, flow)

    def pallas_params(self):
        """Loop-invariant bf16 kernel operands for the fused update chain.
        Call OUTSIDE the scan (apply only — params must already exist)."""
        from ..ops.pallas_update2d import (
            prepare_gru_flowhead_params,
            prepare_motion_encoder_params,
        )

        return (
            prepare_motion_encoder_params(
                self.motion_encoder.variables["params"]
            ),
            prepare_gru_flowhead_params(
                self.gru.variables["params"], self.flow_head.variables["params"]
            ),
        )

    def __call__(self, carry, consts):
        h, flow = carry
        flow = jax.lax.stop_gradient(flow)
        use_pallas = self.fast_pallas and "me_params" in consts
        # the lookup stays on the XLA einsum path: an in-kernel fused variant
        # (batched one-hot dots in Mosaic) measured 2.8x slower — see PERF.md
        corr = corr_lookup_2d_padded(
            consts["pyramid"], consts["grid"] + flow,
            radius=self.corr_radius, storage=self.lookup_storage,
        )
        if use_pallas:
            from ..ops.pallas_update2d import update_2d_pallas

            # the 2D-only chain has no CLFM between its stages, so the whole
            # iteration (motion encoder + GRU + flow head) runs as ONE
            # VMEM-resident kernel — the motion features never touch HBM
            height, width = h.shape[1:3]
            h, delta = update_2d_pallas(
                h, consts["x"], flow, corr,
                consts["me_params"], consts["gf_params"], height, width,
            )
        else:
            motion = self.motion_encoder(flow, corr)
            h = self.gru(h, jnp.concatenate([consts["x"], motion], axis=-1))
            delta = self.flow_head(h)
        flow = flow + delta
        out = self.upsample(h, flow) if self.upsample_each else flow
        return (h, flow), out


class RAFTCore(nn.Module):
    """Standalone 2D RAFT loop (raft_core.py:200-270)."""

    n_iters: int = 12
    scan_unroll: int = 1
    backbone_depth: int = 50
    corr_levels: int = 4
    corr_radius: int = 4
    # eval-time: skip the per-iteration convex upsample and run it once on the
    # final flow (kept separate from `train`, which freeze_bn masks)
    final_only: bool = False
    # approximate fast path: auto|on|off (ops.geometry.resolve_fast_inference)
    fast_inference: str = "auto"
    # correlation-volume storage override: auto|split|bf16|int8
    lookup_storage: str = "auto"

    @nn.compact
    def __call__(self, image1, image2, train: bool = False):
        """image1/2: [B, H, W, 3] normalised. Returns [T, B, H, W, 2]."""
        batch = image1.shape[0]
        fnet = ResNetEncoder2D(depth=self.backbone_depth, name="fnet")
        # both frames in one backbone call (norm_eval BN -> bit-identical)
        fmaps = fnet(jnp.concatenate([image1, image2], axis=0), train=train)
        fmap1, fmap2 = fmaps[:batch], fmaps[batch:]

        # all-pairs correlation (fnet_aligner: raft_core.py:47,52-54), padded
        # once for the in-loop lookups (loop-invariant). The TPU eval fast
        # path stores int8 and builds each level as one einsum against a
        # padded pooled frame-2 table (padded_pyramid_from_features);
        # training takes the exact build+pool+pad route inside the same call.
        from ..ops.geometry import resolve_fast_inference

        aligner = dense(256, name="fnet_aligner")
        fast = resolve_fast_inference(self.fast_inference, self.final_only)
        storage = resolve_lookup_storage(self.lookup_storage, fast)
        pyramid = padded_pyramid_from_features(
            aligner(fmap1.astype(jnp.float32)),
            aligner(fmap2.astype(jnp.float32)),
            self.corr_levels,
            self.corr_radius,
            storage=storage,
        )

        cnet = ResNetEncoder2D(depth=self.backbone_depth, name="cnet")(
            image1, train=train
        )
        cnet = dense(256, name="cnet_aligner")(cnet)
        h, x = jnp.split(cnet, 2, axis=-1)
        h = nn.tanh(h.astype(jnp.float32))
        x = nn.relu(x.astype(jnp.float32))

        batch, image_h, image_w, _ = image1.shape
        grid = mesh_grid(batch, image_h // 8, image_w // 8)
        flow0 = jnp.zeros_like(grid)

        consts = {"pyramid": pyramid, "grid": grid, "x": x}
        update = UpdateBlock2D(
            corr_radius=self.corr_radius,
            upsample_each=not self.final_only,
            lookup_storage=storage,
            fast_pallas=fast,
            name="update",
        )
        if fast and not self.is_initializing():
            # fused-update kernel weights (bf16 reshapes, hoisted out of the
            # scan); at init the exact path below creates the conv params
            consts["me_params"], consts["gf_params"] = update.pallas_params()
        scan = nn.scan(
            lambda mdl, carry, c: mdl(carry, c),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=self.n_iters,
            unroll=self.scan_unroll,
        )
        (h_final, flow_final), flow_ups = scan(update, (h, flow0), consts)
        if self.final_only:
            # one convex upsample on the final flow; same params as the
            # in-scan path ('update/convex_upsampler')
            return update.upsample(h_final, flow_final)[None]  # [1, B, H, W, 2]
        return flow_ups  # [T, B, H, W, 2]


class RAFT(nn.Module):
    """Model wrapper (models/raft.py:1-45)."""

    cfgs: Any
    train_mode: bool = False

    @nn.compact
    def __call__(self, inputs: dict) -> dict:
        train = self.train_mode
        images = 2.0 * (inputs["images"].astype(jnp.float32) / 255.0) - 1.0
        padder = InputPadder(images.shape, x=8)
        image1, image2 = padder.pad(images[..., :3], images[..., 3:])

        n_iters = self.cfgs["n_iters_train"] if train else self.cfgs["n_iters_eval"]
        # backbone depth from either the backbone group or the reference's
        # raft.yaml pretrain group (pretrain.depth when enabled)
        if "backbone" in self.cfgs:
            depth = self.cfgs["backbone"]["depth"]
        elif "pretrain" in self.cfgs and self.cfgs["pretrain"].get("enabled", False):
            depth = self.cfgs["pretrain"]["depth"]
        else:
            depth = 50
        with compute_precision(self.cfgs.get("compute_dtype")):
            flow_seq = RAFTCore(
                n_iters=n_iters,
                scan_unroll=int(self.cfgs.get("scan_unroll", 1)),
                backbone_depth=depth,
                final_only=not self.train_mode,
                fast_inference=str(self.cfgs.get("fast_inference", "auto")),
                lookup_storage=str(self.cfgs.get("lookup_storage", "auto")),
                name="core",
            )(image1, image2, train=train)

        flow_seq = jax.vmap(padder.unpad)(flow_seq)
        return {"flow_2d": flow_seq[-1], "flow_2d_seq": flow_seq}


def loss_fn(outputs: dict, inputs: dict, cfgs: Any):
    target_2d = inputs["flow_2d"]
    loss = calc_sequence_loss(
        outputs["flow_2d_seq"], target_2d, gamma=cfgs.loss.gamma, order=cfgs.loss.order
    )
    metrics = merge_metrics(
        {"loss2d": scalar_metric(loss)},
        compute_2d_metrics(outputs["flow_2d"], target_2d),
    )
    return loss, metrics


def is_better(curr: dict, best: dict | None) -> bool:
    if best is None:
        return True
    return curr["epe2d"] < best["epe2d"]
