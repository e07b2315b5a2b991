"""CamLiRAFT: joint 2D optical flow + 3D scene flow with bidirectional
camera-LiDAR fusion at up to 5 points (fnet, cnet, corr, motion, hidden).

Reference semantics: models/camliraft_core.py (fused RAFT loop) and
models/camliraft.py (padding, ImageNet normalisation, IDS transforms,
sequence losses).

TPU-first design departures:
- One `nn.scan` carries both branches' hidden states and flows; per-iteration
  detach (camliraft_core.py:104-107) becomes stop_gradient in the scan body.
- The 3D upsample to the full cloud precomputes KNN indices + inverse-distance
  weights once and reuses them across iterations.
- CLFM modules are shared across frames exactly as the reference shares
  clfm_fnet across (uv1, frame1) and (uv2, frame2) (camliraft_core.py:63-65).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.clfm import CLFM
from ..nn.layers import dense
from ..nn.resnet import ResNetEncoder2D
from ..ops.correlation import (
    corr_lookup_2d_padded,
    padded_pyramid_from_features,
    resolve_lookup_storage,
)
from ..ops.geometry import (
    backwarp_3d,
    build_pc_pyramid,
    gather_points,
    k_nearest_neighbor,
)
from ..ops.ids import (
    make_parallel_camera_info,
    paral2persp,
    persp2paral,
    project_pc2image,
)
from ..ops.image import InputPadder, mesh_grid
from .camliraft_l import (
    Correlation3D,
    Encoder3D,
    FlowHead3D,
    GRU3D,
    MotionEncoder3D,
    build_cost_volume_pyramid_3d,
    encoder_knn_indices,
)
from .losses import calc_sequence_loss
from .metrics import (
    compute_2d_metrics,
    compute_3d_metrics,
    merge_metrics,
    scalar_metric,
)
from .raft import ConvexUpsampler2D, FlowHead2D, GRU2D, MotionEncoder2D

# ImageNet statistics used by the mmdet backbone (camliraft.py:41-46)
_IMAGENET_MEAN = (123.675, 116.280, 103.530)
_IMAGENET_STD = (58.395, 57.120, 57.375)


class FusedUpdateBlock(nn.Module):
    """One fused RAFT iteration over both modalities; scanned over n_iters.

    Setup-style: the core scans one shared instance (functional `nn.scan`),
    hoists the loop-invariant PointConvDW weights via `precompute`, and — at
    eval — upsamples only the final flow via `upsample` after the scan
    (the reference consumes flow_preds[-1] only, camliraft.py:68-73).
    Param paths match the previous compact layout.
    """

    fuse_corr: bool = True
    fuse_motion: bool = True
    fuse_hidden: bool = False
    corr_radius: int = 4
    upsample_each: bool = True
    # route Correlation3D through the fused Pallas kernel (forward-only)
    fast_inference: bool = False
    # correlation-volume storage for the 2D lookup (pad_pyramid_for_lookup)
    lookup_storage: str = "split"
    # loss-in-scan (training): per-iteration sequence-loss terms are computed
    # inside the scan body and exponentially accumulated in the carry, so the
    # [T, B, H, W, 2] / [T, B, N, 3] prediction stacks never materialise.
    # Tuple (order2d, order3d, gamma2d, gamma3d, persp_h, persp_w, paral_h,
    # paral_w); None = stack per-iteration predictions (reference semantics).
    loss_cfg: tuple | None = None

    def setup(self):
        self.correlation_3d = Correlation3D(out_channels=128, k=16)
        if self.fuse_corr:
            self.clfm_corr = CLFM(324, 128)
        self.motion_encoder_2d = MotionEncoder2D()
        self.motion_encoder_3d = MotionEncoder3D()
        if self.fuse_motion:
            self.clfm_motion = CLFM(128, 128)
        self.gru_2d = GRU2D()
        self.gru_3d = GRU3D()
        if self.fuse_hidden:
            self.clfm_hidden = CLFM(128, 128)
        self.flow_head_2d = FlowHead2D()
        self.flow_head_3d = FlowHead3D()
        self.convex_upsampler = ConvexUpsampler2D()

    def precompute(self, xyz1, knn_indices, train: bool = False):
        """Loop-invariant PointConvDW weights for the 3D submodules (stored
        bfloat16 on the fast path — see UpdateBlock3D.precompute)."""
        dw = {
            "motion_encoder": self.motion_encoder_3d.precompute_weights(
                xyz1, knn_indices, train=train
            ),
            "gru": self.gru_3d.precompute_weights(xyz1, knn_indices, train=train),
            "flow_head": self.flow_head_3d.precompute_weights(
                xyz1, knn_indices, train=train
            ),
        }
        if self.fast_inference:
            dw = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), dw)
        return dw

    def pallas_params_2d(self):
        """Loop-invariant bf16 operands for the fused 2D update-chain
        kernels (ops/pallas_update2d.py). Apply-time only."""
        from ..ops.pallas_update2d import (
            prepare_gru_flowhead_params,
            prepare_motion_encoder_params,
        )

        return (
            prepare_motion_encoder_params(
                self.motion_encoder_2d.variables["params"]
            ),
            prepare_gru_flowhead_params(
                self.gru_2d.variables["params"],
                self.flow_head_2d.variables["params"],
            ),
        )

    def pallas_clfm_consts(self, interp_cache):
        """Hoisted loop-invariant operands for the fused in-loop CLFM
        kernels (ops/pallas_clfm.py): the offset-only score gate + the bf16
        fc/conv weights per fused module. Apply-time only."""
        from ..ops.pallas_clfm import hoist_interp_score, prepare_clfm_params

        out = {}
        if self.fuse_corr:
            p = self.clfm_corr.variables["params"]
            out["clfm_corr"] = (
                hoist_interp_score(p["interp"], interp_cache[1]),
                prepare_clfm_params(p),
            )
        if self.fuse_motion:
            p = self.clfm_motion.variables["params"]
            out["clfm_motion"] = (
                hoist_interp_score(p["interp"], interp_cache[1]),
                prepare_clfm_params(p),
            )
        return out

    def pallas_corr3d_tail_params(self):
        """Loop-invariant dense operands for the fused Correlation3D tail
        kernel (ops/pallas_corr3d.py). Apply-time only."""
        from ..ops.pallas_corr3d import prepare_corr3d_tail_params

        return prepare_corr3d_tail_params(
            self.correlation_3d.variables["params"]
        )

    def pallas_params_3d(self):
        """Loop-invariant MLP operands for the fused 3D update-chain
        kernels (ops/pallas_update3d.py). Apply-time only."""
        from ..ops.pallas_update3d import (
            prepare_gru_flowhead_3d_params,
            prepare_motion_encoder_3d_params,
        )

        return (
            prepare_motion_encoder_3d_params(
                self.motion_encoder_3d.variables["params"]
            ),
            prepare_gru_flowhead_3d_params(
                self.gru_3d.variables["params"],
                self.flow_head_3d.variables["params"],
            ),
        )

    def upsample(self, h_2d, flow_2d, flow_3d, consts):
        from ..ops.pallas_gather import knn_weighted_sum

        flow_2d_up = self.convex_upsampler(h_2d, flow_2d)
        flow_3d_up = knn_weighted_sum(
            flow_3d, consts["up_idx"], consts["up_weights"],
            fast=self.fast_inference,
        )
        return flow_2d_up, flow_3d_up

    def _iter_losses(self, flow_2d_up, flow_3d_up, loss_c):
        """One iteration's (unweighted) sequence-loss terms, computed inside
        the scan body. Matches calc_sequence_loss's per-prediction math
        (losses.py) on the wrapper-transformed predictions: the 2D target is
        zero-PADDED (validity 0) instead of unpadding the prediction — the
        masked mean then runs over exactly the unpadded pixels — and the 3D
        prediction is IDS-mapped back to perspective space per iteration
        (camliraft.py:68-83 semantics)."""
        from .losses import _flow_error, _masked_mean, _split_target

        order2d, order3d = self.loss_cfg[0], self.loss_cfg[1]
        persp_h, persp_w, paral_h, paral_w = self.loss_cfg[4:8]
        t2d, m2d = _split_target(loss_c["target_2d"], 2)
        l2d = _masked_mean(
            _flow_error(flow_2d_up.astype(jnp.float32) - t2d, order2d), m2d
        )
        persp = {
            "projection_mode": "perspective",
            "sensor_h": persp_h,
            "sensor_w": persp_w,
            "f": loss_c["f"],
            "cx": loss_c["cx"],
            "cy": loss_c["cy"],
        }
        paral = {
            "projection_mode": "parallel",
            "sensor_h": paral_h,
            "sensor_w": paral_w,
        }
        pred3d = (
            paral2persp(loss_c["pc1"] + flow_3d_up, persp, paral)
            - loss_c["base"]
        )
        t3d, m3d = _split_target(loss_c["target_3d"], 3)
        l3d = _masked_mean(
            _flow_error(pred3d.astype(jnp.float32) - t3d, order3d), m3d
        )
        return l2d, l3d

    def __call__(self, carry, consts):
        if self.loss_cfg is not None:
            h_2d, h_3d, flow_2d, flow_3d, accs, _ = carry
        else:
            h_2d, h_3d, flow_2d, flow_3d = carry
        xyz1 = consts["xyz1"]
        uv1 = consts["uv1"]
        knn_indices = consts["knn_indices"]
        dw = consts.get("dw") or {}

        flow_2d = jax.lax.stop_gradient(flow_2d)
        flow_3d = jax.lax.stop_gradient(flow_3d)
        # one backwarp at the finest level serves all prefix-nested levels
        xyzs2 = consts["xyzs2"]
        xyz2_warp_full = backwarp_3d(
            xyz1, xyzs2[0], flow_3d, fast=self.fast_inference
        )
        level_sizes = tuple(x.shape[1] for x in xyzs2)

        # correlation lookup (fast inference: int8 volume; stays on the XLA
        # einsum path — an in-kernel fused variant measured 2.8x slower)
        corr_2d = corr_lookup_2d_padded(
            consts["pyramid_2d"], consts["grid"] + flow_2d,
            radius=self.corr_radius, storage=self.lookup_storage,
        )
        corr_3d = self.correlation_3d(
            xyz1, xyz2_warp_full, level_sizes, consts["pyramid_3d"],
            fast=self.fast_inference,
            pyramid_scale=consts.get("pyramid_3d_scale"),
            tail_params=consts.get("corr3d_tail"),
        )
        interp_cache = consts["interp_cache_uv1"]
        use_pallas_clfm = "clfm_taps" in consts
        if use_pallas_clfm:
            from ..ops.pallas_clfm import clfm_fused_pallas

            def fused_clfm(key, f2d, f3d):
                score, cparams = consts[key]
                return clfm_fused_pallas(
                    f2d, f3d, score, interp_cache[0],
                    *consts["clfm_taps"], cparams,
                )

        if self.fuse_corr:
            if use_pallas_clfm:
                corr_2d, corr_3d = fused_clfm("clfm_corr", corr_2d, corr_3d)
            else:
                corr_2d, corr_3d = self.clfm_corr(
                    uv1, corr_2d, corr_3d, interp_cache=interp_cache
                )

        # motion features (fast path: one fused VMEM-resident bf16 kernel
        # instead of the 5-conv XLA chain — ops/pallas_update2d.py)
        use_pallas_2d = "me_params" in consts
        height, width = h_2d.shape[1:3]
        if use_pallas_2d:
            from ..ops.pallas_update2d import motion_encoder_2d_pallas

            motion_2d = motion_encoder_2d_pallas(
                flow_2d, corr_2d, consts["me_params"], height, width
            )
        else:
            motion_2d = self.motion_encoder_2d(flow_2d, corr_2d)
        use_pallas_3d = "me3d_params" in consts
        if use_pallas_3d:
            from ..ops.pallas_update3d import motion_encoder_3d_pallas

            motion_3d = motion_encoder_3d_pallas(
                flow_3d, corr_3d, knn_indices, dw["motion_encoder"],
                consts["me3d_params"],
            )
        else:
            motion_3d = self.motion_encoder_3d(
                xyz1, flow_3d, corr_3d, knn_indices,
                dw=dw.get("motion_encoder"), fast=self.fast_inference,
            )
        if self.fuse_motion:
            if use_pallas_clfm:
                motion_2d, motion_3d = fused_clfm(
                    "clfm_motion", motion_2d, motion_3d
                )
            else:
                motion_2d, motion_3d = self.clfm_motion(
                    uv1, motion_2d, motion_3d, interp_cache=interp_cache
                )

        # GRUs (fast path: GRU2D + FlowHead2D fused into one kernel; valid
        # because fuse_hidden=False keeps them contiguous — with
        # fuse_hidden=True the CLFM would sit between them, so fall back)
        fuse_gru_head = use_pallas_2d and not self.fuse_hidden
        if fuse_gru_head:
            from ..ops.pallas_update2d import gru_flowhead_2d_pallas

            h_2d, delta_2d_fused = gru_flowhead_2d_pallas(
                h_2d, consts["x_2d"], motion_2d, consts["gf_params"],
                height, width,
            )
        else:
            h_2d = self.gru_2d(
                h_2d, jnp.concatenate([consts["x_2d"], motion_2d], axis=-1)
            )
        fuse_gru_head_3d = use_pallas_3d and not self.fuse_hidden
        if fuse_gru_head_3d:
            from ..ops.pallas_update3d import gru_flowhead_3d_pallas

            dw3 = {
                **dw["gru"],
                "flow_conv1": dw["flow_head"]["conv1"],
                "flow_conv2": dw["flow_head"]["conv2"],
            }
            h_3d, delta_3d_fused = gru_flowhead_3d_pallas(
                h_3d, consts["x_3d"], motion_3d, knn_indices, dw3,
                consts["gf3d_params"],
            )
        else:
            h_3d = self.gru_3d(
                xyz1,
                h_3d,
                jnp.concatenate([consts["x_3d"], motion_3d], axis=-1),
                knn_indices,
                dw=dw.get("gru"),
                fast=self.fast_inference,
            )
        if self.fuse_hidden:
            h_2d, h_3d = self.clfm_hidden(
                uv1, h_2d, h_3d, interp_cache=interp_cache
            )

        # flow heads + residual update
        delta_2d = delta_2d_fused if fuse_gru_head else self.flow_head_2d(h_2d)
        flow_2d = flow_2d + delta_2d

        delta_3d = (
            delta_3d_fused
            if fuse_gru_head_3d
            else self.flow_head_3d(
                xyz1, h_3d, knn_indices, dw=dw.get("flow_head"),
                fast=self.fast_inference,
            )
        )
        flow_3d = flow_3d + delta_3d.astype(jnp.float32)

        if self.upsample_each:
            out = self.upsample(h_2d, flow_2d, flow_3d, consts)
        else:
            out = (flow_2d, flow_3d)
        if self.loss_cfg is not None:
            # exponential sequence weighting via the recurrence
            # acc_T = sum_i gamma^(T-1-i) * L_i  <=>  acc = acc*gamma + L_i
            # (calc_sequence_loss's weights without needing the iteration
            # index in the body)
            l2d, l3d = self._iter_losses(out[0], out[1], consts["loss"])
            g2d, g3d = self.loss_cfg[2], self.loss_cfg[3]
            accs = (accs[0] * g2d + l2d, accs[1] * g3d + l3d)
            # the final iteration's upsampled flows exit via the carry (for
            # metrics); nothing is stacked across iterations
            return (h_2d, h_3d, flow_2d, flow_3d, accs, out), ()
        return (h_2d, h_3d, flow_2d, flow_3d), out


class CamLiRAFTCore(nn.Module):
    """Fused two-branch RAFT core (camliraft_core.py:9-145)."""

    n_iters: int = 10
    scan_unroll: int = 1
    backbone_depth: int = 50
    fuse_fnet: bool = True
    fuse_cnet: bool = True
    fuse_corr: bool = True
    fuse_motion: bool = True
    fuse_hidden: bool = False
    n_samples_list: tuple[int, ...] = (4096, 2048, 1024, 512, 256)
    # eval-time: upsample only the final iteration's flows (kept separate from
    # `train`, which freeze_bn masks)
    final_only: bool = False
    # approximate fast path: auto|on|off (ops.geometry.resolve_fast_inference)
    fast_inference: str = "auto"
    # correlation-volume storage override: auto|split|bf16|int8
    lookup_storage: str = "auto"
    # profiling hook (tools/profile_components.py): truncate the forward after
    # a stage — "encode" (pyramids + encoders + fusion) or "volumes" (+ cost
    # volumes, KNN, caches, hoisted weights). Production callers leave "full".
    profile_stage: str = "full"
    # training loss-in-scan: (order2d, order3d, gamma2d, gamma3d) — see
    # FusedUpdateBlock.loss_cfg. Requires `loss_arrays` at call time.
    loss_cfg: tuple | None = None
    # rematerialise the scan body in the backward pass (training)
    remat_scan: bool = False

    @nn.compact
    def __call__(
        self,
        image1,
        image2,
        pc1,
        pc2,
        camera_info,
        train: bool = False,
        loss_arrays: dict | None = None,
    ):
        xyzs1, xyzs2, _, _ = build_pc_pyramid(pc1, pc2, list(self.n_samples_list))

        batch = image1.shape[0]

        # 2D feature/context networks. Both frames ride one fnet call: the
        # backbone's BatchNorms always use running statistics (norm_eval),
        # so stacking is bit-identical to the reference's two calls
        # (camliraft_core.py:40-41) at better MXU utilisation.
        fnet_2d = ResNetEncoder2D(depth=self.backbone_depth, name="fnet_2d")
        fmaps = fnet_2d(jnp.concatenate([image1, image2], axis=0), train=train)
        feat1_2d, feat2_2d = fmaps[:batch], fmaps[batch:]
        featc_2d = ResNetEncoder2D(depth=self.backbone_depth, name="cnet_2d")(
            image1, train=train
        )

        # 3D feature/context networks. Stacking changes train-mode BatchNorm
        # batch statistics, so only eval stacks (eval BN uses running stats ->
        # identical); training keeps the reference's per-frame calls. The
        # level-to-level KNN depends only on geometry, so one (two-frame
        # batched) KNN serves fnet and cnet.
        stacked = [
            jnp.concatenate([a, b], axis=0) for a, b in zip(xyzs1[:3], xyzs2[:3])
        ]
        knn_both = encoder_knn_indices(stacked)
        knn_f1 = [idx[:batch] for idx in knn_both]
        knn_f2 = [idx[batch:] for idx in knn_both]
        from ..ops.geometry import resolve_fast_inference

        fast_enc = resolve_fast_inference(self.fast_inference, self.final_only)
        fnet_3d = Encoder3D(name="fnet_3d")
        if train:
            feat1_3d = fnet_3d(xyzs1[:3], train=train, knn_indices=knn_f1)[2]
            feat2_3d = fnet_3d(xyzs2[:3], train=train, knn_indices=knn_f2)[2]
        else:
            feats = fnet_3d(
                stacked, train=train, knn_indices=knn_both, fast=fast_enc
            )[2]
            feat1_3d, feat2_3d = feats[:batch], feats[batch:]
        featc_3d = Encoder3D(name="cnet_3d")(
            xyzs1[:3], train=train, knn_indices=knn_f1, fast=fast_enc
        )[2]

        xyzs1, xyzs2 = xyzs1[2:], xyzs2[2:]
        xyz1 = xyzs1[0]

        # project points into 1/8-res feature-map coordinates
        sensor_h, sensor_w = camera_info["sensor_h"], camera_info["sensor_w"]
        feat_h, feat_w = feat1_2d.shape[1:3]
        scale = jnp.array(
            [(feat_w - 1) / (sensor_w - 1), (feat_h - 1) / (sensor_h - 1)],
            dtype=jnp.float32,
        )
        uv1 = project_pc2image(xyz1, camera_info) * scale
        uv2 = project_pc2image(xyzs2[0], camera_info) * scale

        # the pixel-grid KNN for CLFM's 3D->2D scatter depends only on uv, so
        # compute it once per frame (both frames batched through one KNN) and
        # reuse across all fusion points — the in-loop fusions reuse uv1's
        # cache every iteration
        from ..nn.clfm import fusion_interp_cache

        cache_idx, cache_off = fusion_interp_cache(
            jnp.concatenate([uv1, uv2], axis=0), feat_h, feat_w
        )
        cache_uv1 = (cache_idx[:batch], cache_off[:batch])
        cache_uv2 = (cache_idx[batch:], cache_off[batch:])

        # fuse feature / context networks (shared CLFM across frames)
        if self.fuse_fnet:
            clfm_fnet = CLFM(128, 128, norm="batch_norm", name="clfm_fnet")
            feat1_2d, feat1_3d = clfm_fnet(
                uv1, feat1_2d, feat1_3d, train=train, interp_cache=cache_uv1
            )
            feat2_2d, feat2_3d = clfm_fnet(
                uv2, feat2_2d, feat2_3d, train=train, interp_cache=cache_uv2
            )
        if self.fuse_cnet:
            featc_2d, featc_3d = CLFM(
                128, 128, norm="batch_norm", name="clfm_cnet"
            )(uv1, featc_2d, featc_3d, train=train, interp_cache=cache_uv1)

        if self.profile_stage == "encode":
            return feat1_2d + feat2_2d + featc_2d, feat1_3d + feat2_3d + featc_3d

        # init hidden states
        featc_2d = dense(256, name="cnet_aligner_2d")(featc_2d)
        h_2d, x_2d = jnp.split(featc_2d, 2, axis=-1)
        h_2d = nn.tanh(h_2d.astype(jnp.float32))
        x_2d = nn.relu(x_2d.astype(jnp.float32))

        featc_3d = dense(256, name="cnet_aligner_3d")(featc_3d)
        h_3d, x_3d = jnp.split(featc_3d, 2, axis=-1)
        h_3d = nn.tanh(h_3d.astype(jnp.float32))
        x_3d = nn.relu(x_3d.astype(jnp.float32))

        # all-pairs cost volumes, built once; padded for the in-loop lookups
        # (loop-invariant). The TPU eval fast path stores int8 and builds
        # each level as one einsum against a padded pooled frame-2 table
        # (padded_pyramid_from_features); training takes the exact
        # build+pool+pad route inside the same call.
        aligner = dense(256, name="fnet_aligner_2d")
        fast = fast_enc
        storage = resolve_lookup_storage(self.lookup_storage, fast)
        pyramid_2d = padded_pyramid_from_features(
            aligner(feat1_2d.astype(jnp.float32)),
            aligner(feat2_2d.astype(jnp.float32)),
            num_levels=4,
            radius=FusedUpdateBlock.corr_radius,
            storage=storage,
        )
        pyramid_3d = build_cost_volume_pyramid_3d(feat1_3d, feat2_3d, xyzs2)

        knn_indices = k_nearest_neighbor(xyz1, xyz1, k=32)

        # shared upsample weights (2048 -> full cloud)
        from ..ops.pallas_gather import gather_points_fast

        up_idx = k_nearest_neighbor(xyz1, pc1, k=3)
        up_xyz = gather_points_fast(xyz1, up_idx, fast=fast_enc)
        dists = jnp.maximum(
            jnp.linalg.norm(
                (up_xyz - pc1[:, :, None, :]).astype(jnp.float32), axis=-1
            ),
            1e-8,
        )
        up_weights = 1.0 / dists
        up_weights = up_weights / jnp.sum(up_weights, axis=-1, keepdims=True)

        batch, image_h, image_w, _ = image1.shape
        grid = mesh_grid(batch, image_h // 8, image_w // 8)

        loss_mode = self.loss_cfg is not None and loss_arrays is not None
        update = FusedUpdateBlock(
            fuse_corr=self.fuse_corr,
            fuse_motion=self.fuse_motion,
            fuse_hidden=self.fuse_hidden,
            upsample_each=not self.final_only,
            fast_inference=fast,
            lookup_storage=storage,
            loss_cfg=(
                tuple(self.loss_cfg)
                + (
                    image_h,
                    image_w,
                    camera_info["sensor_h"],
                    camera_info["sensor_w"],
                )
                if loss_mode
                else None
            ),
            name="update",
        )
        consts = {
            "xyz1": xyz1,
            "xyzs2": xyzs2,
            "uv1": uv1,
            "grid": grid,
            "x_2d": x_2d,
            "x_3d": x_3d,
            "pyramid_2d": pyramid_2d,
            "knn_indices": knn_indices,
            "interp_cache_uv1": cache_uv1,
        }
        # the 3D upsample tables are per-iteration inputs only when the scan
        # body upsamples (training); at eval (final_only) upsampling happens
        # once after the scan, so they stay OUT of the scan consts — the
        # device trace showed their staging copies riding the loop-entry DMA
        # band (PERF.md round-3 "scan-entry staging")
        up_consts = {"up_idx": up_idx, "up_weights": up_weights}
        if not self.final_only:
            consts.update(up_consts)
        # concatenated once here — the scan body must not rebuild it.
        # Fast path: stored int8 with per-row scales — the selection kernel
        # re-reads the whole [N, sum(m_l)] pyramid every iteration (~130 MB
        # f32 at 4096 x 7936); selection is distance-driven (unaffected),
        # only the extracted costs round (max|row|/254, like the 2D volume).
        pyramid_3d_cat = jnp.concatenate(pyramid_3d, axis=-1)
        if fast:
            from ..ops.geometry import quantize_rows_int8

            consts["pyramid_3d"], consts["pyramid_3d_scale"] = (
                quantize_rows_int8(pyramid_3d_cat)
            )
        else:
            consts["pyramid_3d"] = pyramid_3d_cat
        # hoist loop-invariant PointConvDW geometric weights out of the scan
        consts["dw"] = update.precompute(xyz1, knn_indices, train=train)
        if fast and not self.is_initializing():
            # fused 2D update-chain kernel weights (bf16 reshapes, hoisted
            # out of the scan); at init the exact path creates the params
            consts["me_params"], consts["gf_params"] = update.pallas_params_2d()
            # fused 3D chain: VMEM budget bounds N (the k=32 dw blocks are
            # [N, 32, 128] — ~55 MB total int8 at 4096). The hoisted dw
            # weights are int8-quantised with the per-channel scale folded
            # into the conv MLP params (free dequant).
            from ..ops.pallas_update3d import quantize_dw_int8, update3d_enabled

            # fuse_hidden routes GRU3D/FlowHead3D through the exact path,
            # which needs the original (non-kernel-layout, unquantised) dw
            if (
                xyz1.shape[1] <= 4096
                and not self.fuse_hidden
                and update3d_enabled()
            ):
                me3, gf3 = update.pallas_params_3d()
                consts["dw"], consts["me3d_params"], consts["gf3d_params"] = (
                    quantize_dw_int8(consts["dw"], me3, gf3)
                )
            # fused in-loop CLFM kernels: the offset-only score gate and the
            # bilinear sample taps are loop-invariant, so the two CLFM calls
            # collapse to one Pallas kernel each (ops/pallas_clfm.py)
            from ..ops.pallas_clfm import clfm_pallas_enabled, grid_sample_cache

            if (self.fuse_corr or self.fuse_motion) and clfm_pallas_enabled():
                consts.update(update.pallas_clfm_consts(cache_uv1))
                consts["clfm_taps"] = grid_sample_cache(uv1, feat_h, feat_w)
            from ..ops.pallas_corr3d import corr3d_tail_enabled

            if corr3d_tail_enabled():
                consts["corr3d_tail"] = update.pallas_corr3d_tail_params()
            from ..ops.pallas_ohg import ohg_enabled, pack_dw_tree

            if "me3d_params" not in consts and ohg_enabled():
                # one-hot-MXU fused gather/multiply/max for the in-loop
                # point convs (ops/pallas_ohg.py): k-major rearrangement of
                # the hoisted dw weights + indices, once, outside the scan
                consts["dw"] = pack_dw_tree(
                    consts["dw"], knn_indices, xyz1.shape[1]
                )
        if self.profile_stage == "volumes":
            # consume every const fully so XLA cannot dead-code any of the
            # volume/cache construction
            total = h_2d.sum() + h_3d.sum() + x_2d.sum() + x_3d.sum()
            for leaf in jax.tree_util.tree_leaves((consts, up_consts)):
                total = total + leaf.astype(jnp.float32).sum()
            return total, h_3d.sum()
        # remat_scan (training): recompute the update block in the backward
        # pass instead of storing every iteration's intermediates — trades
        # recompute FLOPs (cheap, MXU) for activation HBM traffic. Gradients
        # are unchanged (pure recomputation).
        body = lambda mdl, carry, c: mdl(carry, c)  # noqa: E731
        if self.remat_scan:
            body = nn.remat(
                body,
                prevent_cse=False,
                static_argnums=(),
            )
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=self.n_iters,
            unroll=self.scan_unroll,
        )
        carry0 = (h_2d, h_3d, jnp.zeros_like(grid), jnp.zeros_like(xyz1, jnp.float32))
        if loss_mode:
            consts["loss"] = dict(loss_arrays, pc1=pc1)
            zero = jnp.zeros((), jnp.float32)
            up0 = (
                jnp.zeros((batch, image_h, image_w, 2), jnp.float32),
                jnp.zeros_like(pc1, jnp.float32),
            )
            carry0 = carry0 + ((zero, zero), up0)
            carry, _ = scan(update, carry0, consts)
            _, _, _, _, (loss_2d, loss_3d), (flow_2d_up, flow_3d_up) = carry
            return flow_2d_up, flow_3d_up, loss_2d, loss_3d
        carry, (flow_2d_seq, flow_3d_seq) = scan(update, carry0, consts)
        if self.profile_stage == "loop":
            h_2d_f, _, flow_2d_f, flow_3d_f = carry
            return flow_2d_f.sum() + h_2d_f.sum(), flow_3d_f.sum()
        if self.final_only:
            h_2d_f, _, flow_2d_f, flow_3d_f = carry
            flow_2d_up, flow_3d_up = update.upsample(
                h_2d_f, flow_2d_f, flow_3d_f, up_consts
            )
            return flow_2d_up[None], flow_3d_up[None]  # [1, B, ...]
        return flow_2d_seq, flow_3d_seq


class CamLiRAFT(nn.Module):
    """Model wrapper (camliraft.py:10-104)."""

    cfgs: Any
    train_mode: bool = False

    @nn.compact
    def __call__(self, inputs: dict) -> dict:
        train = self.train_mode
        images = inputs["images"].astype(jnp.float32)
        pcs = inputs["pcs"]
        pc1, pc2 = pcs[..., :3], pcs[..., 3:]
        intrinsics = inputs["intrinsics"].astype(jnp.float32)

        padder = InputPadder(images.shape, x=8)
        image1, image2 = padder.pad(images[..., :3], images[..., 3:])
        mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(_IMAGENET_STD, jnp.float32)
        image1 = (image1 - mean) / std
        image2 = (image2 - mean) / std

        persp_cam = {
            "projection_mode": "perspective",
            "sensor_h": image1.shape[1],
            "sensor_w": image1.shape[2],
            "f": intrinsics[:, 0],
            "cx": intrinsics[:, 1],
            "cy": intrinsics[:, 2],
        }
        paral_cam = make_parallel_camera_info(image1.shape[1], image1.shape[2])
        pc1 = persp2paral(pc1, persp_cam, paral_cam)
        pc2 = persp2paral(pc2, persp_cam, paral_cam)

        n_iters = self.cfgs["n_iters_train"] if train else self.cfgs["n_iters_eval"]
        n_samples = tuple(
            self.cfgs.get("n_samples_list", (4096, 2048, 1024, 512, 256))
        )
        # freeze_bn (camliraft.py:16-27): BatchNorms stay in eval mode during
        # training. Inside the core the train flag only gates norm layers, so
        # masking it here reproduces the reference's module-wide .eval() walk.
        if self.cfgs.get("freeze_bn", False):
            train = False
        from ..nn.layers import compute_precision

        # loss-in-scan (training): the per-iteration sequence-loss terms are
        # computed inside the refinement scan instead of stacking T full-res
        # prediction tensors for calc_sequence_loss — same math (see
        # FusedUpdateBlock._iter_losses), ~zero stacked-output traffic.
        base = paral2persp(pc1, persp_cam, paral_cam)
        loss_in_scan = (
            self.train_mode
            and bool(self.cfgs.get("loss_in_scan", False))
            and "flow_2d" in inputs
            and "flow_3d" in inputs
        )
        loss_cfg = None
        loss_arrays = None
        if loss_in_scan:
            l2, l3 = self.cfgs["loss2d"], self.cfgs["loss3d"]
            loss_cfg = (
                str(l2["order"]),
                str(l3["order"]),
                float(l2["gamma"]),
                float(l3["gamma"]),
            )
            t2d = inputs["flow_2d"].astype(jnp.float32)
            if t2d.shape[-1] == 2:
                t2d = jnp.concatenate(
                    [t2d, jnp.ones(t2d.shape[:-1] + (1,), jnp.float32)], -1
                )
            left, right, top, bottom = padder._pad
            # zero padding zeroes the validity channel, so the masked mean
            # runs over exactly the unpadded pixels == unpad(pred) vs target
            t2d = jnp.pad(t2d, ((0, 0), (top, bottom), (left, right), (0, 0)))
            loss_arrays = {
                "target_2d": t2d,
                "target_3d": inputs["flow_3d"].astype(jnp.float32),
                "base": base,
                "f": intrinsics[:, 0],
                "cx": intrinsics[:, 1],
                "cy": intrinsics[:, 2],
            }

        with compute_precision(self.cfgs.get("compute_dtype")):
            core_out = CamLiRAFTCore(
                n_iters=n_iters,
                scan_unroll=int(self.cfgs.get("scan_unroll", 1)),
                backbone_depth=self.cfgs["backbone"]["depth"],
                fuse_fnet=bool(self.cfgs["fuse_fnet"]),
                fuse_cnet=bool(self.cfgs["fuse_cnet"]),
                fuse_corr=bool(self.cfgs["fuse_corr"]),
                fuse_motion=bool(self.cfgs["fuse_motion"]),
                fuse_hidden=bool(self.cfgs["fuse_hidden"]),
                n_samples_list=n_samples,
                final_only=not self.train_mode,
                fast_inference=str(self.cfgs.get("fast_inference", "auto")),
                lookup_storage=str(self.cfgs.get("lookup_storage", "auto")),
                loss_cfg=loss_cfg,
                remat_scan=self.train_mode
                and bool(self.cfgs.get("remat_scan", False)),
                name="core",
            )(
                image1, image2, pc1, pc2, paral_cam, train=train,
                loss_arrays=loss_arrays,
            )

        def ids_map(flow):
            return paral2persp(pc1 + flow, persp_cam, paral_cam) - base

        if loss_in_scan:
            flow_2d_up, flow_3d_up, loss_2d, loss_3d = core_out
            return {
                "flow_2d": padder.unpad(flow_2d_up),
                "flow_3d": ids_map(flow_3d_up),
                "loss_2d": loss_2d,
                "loss_3d": loss_3d,
            }
        flow_2d_seq, flow_3d_seq = core_out

        flow_2d_seq = jax.vmap(padder.unpad)(flow_2d_seq)
        flow_3d_seq = jax.vmap(ids_map)(flow_3d_seq)

        return {
            "flow_2d": flow_2d_seq[-1],
            "flow_3d": flow_3d_seq[-1],
            "flow_2d_seq": flow_2d_seq,
            "flow_3d_seq": flow_3d_seq,
        }


def loss_fn(outputs: dict, inputs: dict, cfgs: Any):
    """Joint sequence losses + metrics (camliraft.py:85-96)."""
    target_2d = inputs["flow_2d"]
    target_3d = inputs["flow_3d"]
    if "loss_2d" in outputs:  # loss-in-scan: accumulated inside the core
        loss_2d, loss_3d = outputs["loss_2d"], outputs["loss_3d"]
    else:
        loss_2d = calc_sequence_loss(
            outputs["flow_2d_seq"],
            target_2d,
            gamma=cfgs.loss2d.gamma,
            order=cfgs.loss2d.order,
        )
        loss_3d = calc_sequence_loss(
            outputs["flow_3d_seq"],
            target_3d,
            gamma=cfgs.loss3d.gamma,
            order=cfgs.loss3d.order,
        )
    loss = loss_2d + loss_3d
    metrics = merge_metrics(
        {
            "loss": scalar_metric(loss),
            "loss2d": scalar_metric(loss_2d),
            "loss3d": scalar_metric(loss_3d),
        },
        compute_2d_metrics(outputs["flow_2d"], target_2d),
        compute_3d_metrics(outputs["flow_3d"], target_3d),
    )
    if "occ_mask_3d" in inputs:
        metrics = merge_metrics(
            metrics,
            compute_3d_metrics(
                outputs["flow_3d"], target_3d, occ_mask=inputs["occ_mask_3d"]
            ),
        )
    return loss, metrics


def is_better(curr: dict, best: dict | None) -> bool:
    if best is None:
        return True
    return curr["epe2d"] < best["epe2d"]
