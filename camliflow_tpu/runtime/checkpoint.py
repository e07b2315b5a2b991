"""Checkpoint save/restore helpers.

Two formats:
- orbax directories (written by the Trainer's CheckpointManager)
- flat ``.npz`` files with '/'-joined pytree paths (portable single-file
  format used by tools/port_checkpoint.py for converted PyTorch weights)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def tree_to_flat(tree, prefix=()) -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for key, value in tree.items():
            out.update(tree_to_flat(value, prefix + (key,)))
    else:
        out["/".join(prefix)] = np.asarray(tree)
    return out


def flat_to_tree(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        node = tree
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def _resnet_torch_name(suffix: str) -> str | None:
    """Map our ResNetEncoder2D param path to a torchvision/mmdet state_dict
    name (conv1/bn1/layerX.Y.{convZ,bnZ,downsample.{0,1}})."""
    import re

    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    parts = suffix.split("/")
    leaf = leaf_map.get(parts[-1])
    if leaf is None:
        return None
    body = parts[:-1]
    out = []
    for seg in body:
        m = re.fullmatch(r"layer(\d)_(\d+)", seg)
        if m:
            out.append(f"layer{m.group(1)}.{m.group(2)}")
        elif seg == "downsample_conv":
            out.append("downsample.0")
        elif seg == "downsample_bn":
            out.append("downsample.1")
        else:
            out.append(seg)
    return ".".join(out) + "." + leaf


def load_backbone_pretrained(variables: dict, path: str | Path) -> tuple[dict, int]:
    """Load ImageNet ResNet weights (.pth/.pt via torch, or .npz) into every
    ResNet backbone subtree (fnet_2d/cnet_2d/fnet/cnet under core).

    Reference parity: mmdet init_cfg Pretrained (raft_core.py:20-23).
    Returns (variables, n_tensors_loaded).
    """
    path = Path(path)
    if path.suffix == ".npz":
        data = np.load(path)
        state_dict = {k: data[k] for k in data.files}
    else:
        import torch

        payload = torch.load(path, map_location="cpu", weights_only=True)
        state_dict = payload.get("state_dict", payload)
        state_dict = {k: np.asarray(v) for k, v in state_dict.items()}

    flat = tree_to_flat(variables)
    out = dict(flat)
    n_loaded = 0
    backbones = ("core/fnet_2d/", "core/cnet_2d/", "core/fnet/", "core/cnet/")
    for full_path, value in flat.items():
        _, rest = full_path.split("/", 1)
        prefix = next((b for b in backbones if rest.startswith(b)), None)
        if prefix is None:
            continue
        suffix = rest[len(prefix):]
        if suffix.startswith("align/"):
            continue  # not part of ImageNet checkpoints
        torch_name = _resnet_torch_name(suffix)
        if torch_name is None or torch_name not in state_dict:
            continue
        src = np.asarray(state_dict[torch_name])
        if src.ndim == 4:
            src = src.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if src.shape != tuple(value.shape):
            continue
        out[full_path] = src.astype(value.dtype)
        n_loaded += 1
    return flat_to_tree(out), n_loaded


def save_variables(path: str | Path, variables: dict) -> None:
    flat = tree_to_flat(variables)
    np.savez(path, **flat)


def restore_variables(path: str | Path) -> dict:
    """Restore {'params': ..., 'batch_stats': ...} from .npz or orbax dir.

    Accepts a CheckpointManager step directory (which nests the payload under
    'default/'), a bare StandardCheckpointer directory, or a flat .npz."""
    path = Path(path)
    if path.is_dir():  # orbax checkpoint directory
        import orbax.checkpoint as ocp

        if (path / "default").is_dir():
            path = path / "default"
        ckptr = ocp.StandardCheckpointer()
        payload = ckptr.restore(path.absolute())
        variables = {"params": payload["params"]}
        if payload.get("batch_stats") is not None:
            variables["batch_stats"] = payload["batch_stats"]
        return variables
    data = np.load(path, allow_pickle=False)
    return flat_to_tree({k: data[k] for k in data.files})
