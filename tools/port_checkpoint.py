#!/usr/bin/env python
"""Port reference PyTorch checkpoints to camliflow_tpu parameter trees.

Destination-driven: we enumerate OUR model's parameter paths (from a jitted
init on tiny shapes), translate each path to the reference state_dict name it
corresponds to, and pull + re-layout the tensor:

  torch Conv2d  [O, I, kH, kW] -> flax Conv kernel [kH, kW, I, O]
  torch Conv1d  [O, I, 1]      -> flax Dense kernel [I, O]
  torch Linear  [O, I]         -> flax Dense kernel [I, O]
  torch BN weight/bias         -> BatchNorm scale/bias (params)
  torch BN running_mean/var    -> BatchNorm mean/var (batch_stats)

Usage:
  python tools/port_checkpoint.py --model camliraft --ckpt path/to/ckpt.pt \\
      --out camliraft.npz [--report-only]

Also ports plain torchvision ResNet ImageNet checkpoints into the backbone:
  python tools/port_checkpoint.py --resnet50 resnet50.pth --out backbone.npz

Reference naming sources: models/camliraft_core.py, models/raft_core.py,
models/camliraft_l_core.py, models/clfm.py, models/point_conv.py,
models/mlp.py, models/pwc_core.py, models/camlipwc_core.py.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# ----------------------------------------------------------------------
# our-path -> torch-name translation
# ----------------------------------------------------------------------

# per-model table of (our prefix -> torch prefix), longest match wins.
PREFIX_TABLES = {
    "camliraft": [
        ("core/fnet_2d/", "core.branch_2d.fnet."),
        ("core/cnet_2d/", "core.branch_2d.cnet."),
        ("core/cnet_aligner_2d/", "core.branch_2d.cnet_aligner."),
        ("core/fnet_aligner_2d/", "core.branch_2d.correlation.fnet_aligner."),
        ("core/update/motion_encoder_2d/", "core.branch_2d.motion_encoder."),
        ("core/update/gru_2d/", "core.branch_2d.gru."),
        ("core/update/flow_head_2d/", "core.branch_2d.flow_head."),
        ("core/update/convex_upsampler/", "core.branch_2d.convex_upsampler."),
        ("core/fnet_3d/", "core.branch_3d.fnet."),
        ("core/cnet_3d/", "core.branch_3d.cnet."),
        ("core/cnet_aligner_3d/", "core.branch_3d.cnet_aligner."),
        ("core/update/correlation_3d/", "core.branch_3d.correlation."),
        ("core/update/motion_encoder_3d/", "core.branch_3d.motion_encoder."),
        ("core/update/gru_3d/", "core.branch_3d.gru."),
        ("core/update/flow_head_3d/", "core.branch_3d.flow_head."),
        ("core/clfm_fnet/", "core.clfm_fnet."),
        ("core/clfm_cnet/", "core.clfm_cnet."),
        ("core/update/clfm_corr/", "core.clfm_corr."),
        ("core/update/clfm_motion/", "core.clfm_motion."),
        ("core/update/clfm_hidden/", "core.clfm_hidden."),
    ],
    "camliraft_l": [
        ("core/fnet/", "core.fnet."),
        ("core/cnet/", "core.cnet."),
        ("core/cnet_aligner/", "core.cnet_aligner."),
        ("core/update/correlation/", "core.correlation."),
        ("core/update/motion_encoder/", "core.motion_encoder."),
        ("core/update/gru/", "core.gru."),
        ("core/update/flow_head/", "core.flow_head."),
    ],
    "raft": [
        ("core/fnet/", "core.fnet."),
        ("core/cnet/", "core.cnet."),
        ("core/cnet_aligner/", "core.cnet_aligner."),
        ("core/fnet_aligner/", "core.correlation.fnet_aligner."),
        ("core/update/motion_encoder/", "core.motion_encoder."),
        ("core/update/gru/", "core.gru."),
        ("core/update/flow_head/", "core.flow_head."),
        ("core/update/convex_upsampler/", "core.convex_upsampler."),
    ],
    "pwc": [
        ("core/feature_pyramid/", "core.feature_pyramid."),
        ("core/aligner_1/", "core.pyramid_feature_aligners.1."),
        ("core/aligner_2/", "core.pyramid_feature_aligners.2."),
        ("core/aligner_3/", "core.pyramid_feature_aligners.3."),
        ("core/aligner_4/", "core.pyramid_feature_aligners.4."),
        ("core/aligner_5/", "core.pyramid_feature_aligners.5."),
        ("core/flow_estimator/", "core.flow_estimator."),
        ("core/context_network/", "core.context_network."),
        ("core/up_mask_head/conv0/", "core.up_mask_head.0."),
        ("core/up_mask_head/conv1/", "core.up_mask_head.2."),
    ],
    "camlipwc_l": [
        ("core/feature_pyramid/", "core.feature_pyramid."),
        ("core/correlation_1/", "core.correlations.1."),
        ("core/correlation_2/", "core.correlations.2."),
        ("core/correlation_3/", "core.correlations.3."),
        ("core/correlation_4/", "core.correlations.4."),
        ("core/correlation_5/", "core.correlations.5."),
        ("core/aligner_1/", "core.pyramid_feat_aligners.1."),
        ("core/aligner_2/", "core.pyramid_feat_aligners.2."),
        ("core/aligner_3/", "core.pyramid_feat_aligners.3."),
        ("core/aligner_4/", "core.pyramid_feat_aligners.4."),
        ("core/aligner_5/", "core.pyramid_feat_aligners.5."),
        ("core/flow_estimator/", "core.flow_estimator."),
    ],
    "camlipwc": [
        ("core/branch_2d_fnet/", "core.branch_2d_fnet."),
        ("core/fnet2d_aligner_1/", "core.branch_2d_fnet_aligners.1."),
        ("core/fnet2d_aligner_2/", "core.branch_2d_fnet_aligners.2."),
        ("core/fnet2d_aligner_3/", "core.branch_2d_fnet_aligners.3."),
        ("core/fnet2d_aligner_4/", "core.branch_2d_fnet_aligners.4."),
        ("core/fnet2d_aligner_5/", "core.branch_2d_fnet_aligners.5."),
        ("core/branch_2d_flow_estimator/", "core.branch_2d_flow_estimator."),
        ("core/branch_2d_context_network/", "core.branch_2d_context_network."),
        ("core/branch_2d_up_mask_head/conv0/", "core.branch_2d_up_mask_head.0."),
        ("core/branch_2d_up_mask_head/conv1/", "core.branch_2d_up_mask_head.2."),
        ("core/branch_3d_fnet/", "core.branch_3d_fnet."),
        ("core/fnet3d_aligner_1/", "core.branch_3d_fnet_aligners.1."),
        ("core/fnet3d_aligner_2/", "core.branch_3d_fnet_aligners.2."),
        ("core/fnet3d_aligner_3/", "core.branch_3d_fnet_aligners.3."),
        ("core/fnet3d_aligner_4/", "core.branch_3d_fnet_aligners.4."),
        ("core/fnet3d_aligner_5/", "core.branch_3d_fnet_aligners.5."),
        ("core/correlation3d_1/", "core.branch_3d_correlations.1."),
        ("core/correlation3d_2/", "core.branch_3d_correlations.2."),
        ("core/correlation3d_3/", "core.branch_3d_correlations.3."),
        ("core/correlation3d_4/", "core.branch_3d_correlations.4."),
        ("core/correlation3d_5/", "core.branch_3d_correlations.5."),
        ("core/corr3d_aligner_1/", "core.branch_3d_correlation_aligners.1."),
        ("core/corr3d_aligner_2/", "core.branch_3d_correlation_aligners.2."),
        ("core/corr3d_aligner_3/", "core.branch_3d_correlation_aligners.3."),
        ("core/corr3d_aligner_4/", "core.branch_3d_correlation_aligners.4."),
        ("core/corr3d_aligner_5/", "core.branch_3d_correlation_aligners.5."),
        ("core/branch_3d_flow_estimator/", "core.branch_3d_flow_estimator."),
        ("core/clfm_pyr_1/", "core.pyramid_clfms.1."),
        ("core/clfm_pyr_2/", "core.pyramid_clfms.2."),
        ("core/clfm_pyr_3/", "core.pyramid_clfms.3."),
        ("core/clfm_pyr_4/", "core.pyramid_clfms.4."),
        ("core/clfm_pyr_5/", "core.pyramid_clfms.5."),
        ("core/clfm_corr_1/", "core.corr_clfms.1."),
        ("core/clfm_corr_2/", "core.corr_clfms.2."),
        ("core/clfm_corr_3/", "core.corr_clfms.3."),
        ("core/clfm_corr_4/", "core.corr_clfms.4."),
        ("core/clfm_corr_5/", "core.corr_clfms.5."),
        ("core/clfm_estimator/", "core.estimator_clfm."),
        ("core/conv_last_2d/", "core.branch_2d_conv_last."),
        ("core/conv_last_3d/", "core.branch_3d_conv_last."),
    ],
}

# token-level rewrites applied to the suffix AFTER the prefix swap, ours->theirs
_SUFFIX_RULES = [
    # MLP members
    (r"DenseNormAct_(\d+)/Dense_0/(kernel|bias)", r"convs.\1.conv_fn.{w}"),
    (r"DenseNormAct_(\d+)/Norm_0/BatchNorm_0/(scale|bias|mean|var)", r"convs.\1.norm_fn.{bn}"),
    (r"DenseNormAct_(\d+)/Norm_0/InstanceNorm_0/(scale|bias)", r"convs.\1.norm_fn.{w}"),
    (r"DenseNormAct_(\d+)/Norm_0/LayerNorm_0/(scale|bias)", r"convs.\1.norm_fn.{w}"),
    # ConvexUpsampler2D mask head (Sequential 0, 2)
    (r"mask_0/(kernel|bias)", r"mask.0.{w}"),
    (r"mask_1/(kernel|bias)", r"mask.2.{w}"),
    # CLFM FusionAwareInterp score net (Sequential of Conv2dNormRelu)
    (r"score_net_0/Dense_0/(kernel|bias)", r"score_net.0.conv_fn.{w}"),
    (r"score_net_1/Dense_0/(kernel|bias)", r"score_net.1.conv_fn.{w}"),
    # SKFusion fc heads (Sequential(Linear, act))
    (r"fc_mid/kernel", r"fc_mid.0.weight"),
    (r"fc_out/kernel", r"fc_out.0.weight"),
    # generic Conv/Dense NormAct wrappers
    (r"Conv_0/(kernel|bias)", r"conv_fn.{w}"),
    (r"Dense_0/(kernel|bias)", r"conv_fn.{w}"),
    (r"Norm_0/BatchNorm_0/(scale|bias|mean|var)", r"norm_fn.{bn}"),
    (r"Norm_0/InstanceNorm_0/(scale|bias)", r"norm_fn.{w}"),
    (r"Norm_0/LayerNorm_0/(scale|bias)", r"norm_fn.{w}"),
    # PointConv / raw leaves
    (r"linear/(kernel|bias)", r"linear.{w}"),
    # ResNet
    (r"layer(\d)_(\d+)/downsample_conv/kernel", r"layer\1.\2.downsample.0.weight"),
    (r"layer(\d)_(\d+)/downsample_bn/(scale|bias|mean|var)", r"layer\1.\2.downsample.1.{bn}"),
    (r"layer(\d)_(\d+)/", r"layer\1.\2"),
    (r"bn(\d)/(scale|bias|mean|var)", r"bn\1.{bn}"),
    # raw convs/dense at the end (gru convz1, flow_head conv1, fc, ...)
    (r"([A-Za-z0-9_]+)/(kernel|bias)$", r"\1.{w}"),
    # bare leaves (when the prefix table consumed the whole module path)
    (r"(kernel)$", r"weight"),
    (r"(bias)$", r"bias"),
]

_BN_MAP = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}


def translate_suffix(suffix: str, torch_prefix: str) -> str:
    """Translate an our-tree suffix (slash path) to a torch suffix.

    Tries the whole remaining suffix against each rule; on match substitutes
    and recurses on any remaining tail; otherwise peels one path segment.
    """
    # FeaturePyramid3D names its members pyramid_mlps/pyramid_convs
    # (camlipwc_l_core.py:14-19) while Encoder3D uses mlps/convs
    # (camliraft_l_core.py:14-19)
    pyramid_ctx = (
        "branch_3d_fnet" in torch_prefix or "feature_pyramid." in torch_prefix
    ) and "branch_2d" not in torch_prefix

    for pattern, template in _SUFFIX_RULES:
        m = re.match(pattern, suffix)
        if not m:
            continue
        leaf = m.groups()[-1] if m.groups() else ""
        t = template.replace(
            "{w}", {"kernel": "weight", "scale": "weight"}.get(leaf, leaf)
        )
        t = t.replace("{bn}", _BN_MAP.get(leaf, leaf))
        translated = m.expand(t)
        rest = suffix[m.end() :]
        if rest:
            rest = translate_suffix(rest.lstrip("/"), torch_prefix)
            translated = translated + ("." if rest else "") + rest
        return translated

    if "/" in suffix:
        head, tail = suffix.split("/", 1)
        m = re.fullmatch(r"mlp_(\d+)", head)
        if m:
            head = ("pyramid_mlps." if pyramid_ctx else "mlps.") + m.group(1)
            return head + "." + translate_suffix(tail, torch_prefix)
        m = re.fullmatch(r"conv_(\d+)", head)
        if m:
            head = ("pyramid_convs." if pyramid_ctx else "convs.") + m.group(1)
            return head + "." + translate_suffix(tail, torch_prefix)
        # FeaturePyramid2D residual blocks (pwc_core.py:31-44)
        m = re.fullmatch(r"block_(\d+)", head)
        if m:
            return (
                "pyramid_convs." + m.group(1) + "."
                + translate_suffix(tail, torch_prefix)
            )
        return head + "." + translate_suffix(tail, torch_prefix)
    return suffix


def our_path_to_torch(path: str, model_name: str) -> str | None:
    table = PREFIX_TABLES[model_name]
    for ours, theirs in sorted(table, key=lambda kv: -len(kv[0])):
        if path.startswith(ours):
            return theirs + translate_suffix(path[len(ours):], theirs)
    return None


def convert_tensor(torch_array: np.ndarray, target_shape: tuple) -> np.ndarray:
    """Re-layout a torch tensor to the flax target shape."""
    a = np.asarray(torch_array)
    if a.shape == tuple(target_shape):
        return a
    if a.ndim == 4 and len(target_shape) == 4:  # OIHW -> HWIO
        out = a.transpose(2, 3, 1, 0)
    elif a.ndim == 4 and len(target_shape) == 2:  # 1x1 Conv2d -> Dense
        out = a[:, :, 0, 0].T
    elif a.ndim == 3 and len(target_shape) == 2:  # Conv1d -> Dense
        out = a[:, :, 0].T
    elif a.ndim == 2 and len(target_shape) == 2:  # Linear -> Dense
        out = a.T
    else:
        raise ValueError(f"cannot convert {a.shape} -> {target_shape}")
    assert out.shape == tuple(target_shape), (out.shape, target_shape)
    return out


def port_state_dict(state_dict: dict, model_name: str, variables: dict):
    """Fill our variables tree from a torch state_dict. Returns
    (new_variables, missing_paths, unused_torch_keys)."""
    from camliflow_tpu.runtime.checkpoint import flat_to_tree, tree_to_flat

    flat = tree_to_flat(variables)
    used = set()
    missing = []
    out = {}
    for path, value in flat.items():
        # split collection prefix (params/... or batch_stats/...)
        coll, rest = path.split("/", 1)
        torch_name = our_path_to_torch(rest, model_name)
        if torch_name is None or torch_name not in state_dict:
            missing.append((path, torch_name))
            out[path] = value
            continue
        out[path] = convert_tensor(state_dict[torch_name], value.shape).astype(
            value.dtype
        )
        used.add(torch_name)
    unused = [
        k for k in state_dict
        if k not in used and not k.endswith("num_batches_tracked")
    ]
    return flat_to_tree(out), missing, unused


# torchvision/mmdet ResNet -> our backbone subtree ------------------------------
def port_resnet_backbone(state_dict: dict, variables: dict, backbone_path: str):
    """Load ImageNet ResNet weights into fnet/cnet backbones.

    `backbone_path` like 'core/fnet_2d'. torchvision names: conv1.weight,
    bn1.*, layer{1,2}.{b}.{conv,bn}{i}.*, downsample.{0,1}.*.
    """
    from camliflow_tpu.runtime.checkpoint import flat_to_tree, tree_to_flat

    flat = tree_to_flat(variables)
    out = dict(flat)
    n_loaded = 0
    for path, value in flat.items():
        coll, rest = path.split("/", 1)
        if not rest.startswith(backbone_path + "/"):
            continue
        suffix = rest[len(backbone_path) + 1 :]
        if suffix.startswith("align/"):
            continue  # align conv is not in ImageNet checkpoints
        torch_name = translate_suffix(suffix, "resnet")
        if torch_name in state_dict:
            out[path] = convert_tensor(state_dict[torch_name], value.shape).astype(
                value.dtype
            )
            n_loaded += 1
    return flat_to_tree(out), n_loaded


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="camliraft")
    parser.add_argument("--ckpt", help="reference .pt checkpoint")
    parser.add_argument("--resnet50", help="torchvision resnet .pth (backbone only)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--report-only", action="store_true")
    args = parser.parse_args()

    import torch  # CPU-only, used purely as a .pt reader

    import jax

    from camliflow_tpu.models.factory import model_factory
    from camliflow_tpu.runtime.checkpoint import save_variables
    from camliflow_tpu.utils.config import load_yaml

    cfgs = load_yaml(Path("conf/model") / f"{args.model}.yaml")["model"]
    spec = model_factory(cfgs)
    # tiny init just to materialise the parameter tree
    import __graft_entry__ as ge

    cfgs_tiny = ge._tiny_cfgs()
    cfgs_tiny["name"] = args.model
    inputs = ge._make_inputs(1, 64, 96, 512, with_targets=False)
    model = spec.module_cls(cfgs=cfgs_tiny.to_dict(), train_mode=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    variables = jax.tree.map(np.asarray, variables)

    if args.ckpt:
        payload = torch.load(args.ckpt, map_location="cpu", weights_only=True)
        state_dict = payload.get("state_dict", payload)
        state_dict = {k: v.numpy() for k, v in state_dict.items()}
        new_vars, missing, unused = port_state_dict(state_dict, args.model, variables)
        print(f"ported; {len(missing)} missing, {len(unused)} unused torch keys")
        for p, t in missing[:20]:
            print("  missing:", p, "<-", t)
        for k in unused[:20]:
            print("  unused: ", k)
        if not args.report_only:
            save_variables(args.out, new_vars)
            print("wrote", args.out)
    elif args.resnet50:
        payload = torch.load(args.resnet50, map_location="cpu", weights_only=True)
        state_dict = {k: v.numpy() for k, v in payload.items()}
        for bb in ("core/fnet_2d", "core/cnet_2d", "core/fnet", "core/cnet"):
            variables, n = port_resnet_backbone(state_dict, variables, bb)
            if n:
                print(f"loaded {n} tensors into {bb}")
        save_variables(args.out, variables)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
