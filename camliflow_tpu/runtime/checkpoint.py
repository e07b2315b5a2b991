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
