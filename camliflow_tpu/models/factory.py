"""Model / optimizer factories.

Reference semantics: factory.py:21-80. The optimizer realises the reference's
4-group parameter partition (2D/3D x decay/no-decay) with per-group learning
rates via `optax.multi_transform`, and the timm-style cosine-with-warmup
schedule as an epoch-indexed optax schedule.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Callable

import flax.linen as nn
import jax
import optax

from . import camlipwc, camlipwc_l, camliraft, camliraft_l, pwc, raft


@dataclass(frozen=True)
class ModelSpec:
    name: str
    module_cls: type[nn.Module]
    loss_fn: Callable
    is_better: Callable


_REGISTRY = {
    "camliraft": ModelSpec(
        "camliraft", camliraft.CamLiRAFT, camliraft.loss_fn, camliraft.is_better
    ),
    "camliraft_l": ModelSpec(
        "camliraft_l", camliraft_l.CamLiRAFTL, camliraft_l.loss_fn, camliraft_l.is_better
    ),
    "camlipwc": ModelSpec(
        "camlipwc", camlipwc.CamLiPWC, camlipwc.loss_fn, camlipwc.is_better
    ),
    "camlipwc_l": ModelSpec(
        "camlipwc_l", camlipwc_l.CamLiPWCL, camlipwc_l.loss_fn, camlipwc_l.is_better
    ),
    "pwc": ModelSpec("pwc", pwc.PWC, pwc.loss_fn, pwc.is_better),
    "raft": ModelSpec("raft", raft.RAFT, raft.loss_fn, raft.is_better),
}


def model_factory(cfgs: Any) -> ModelSpec:
    """Look up a model spec by `cfgs.name` (reference factory.py:21-35)."""
    name = cfgs["name"] if isinstance(cfgs, dict) else cfgs
    if name not in _REGISTRY:
        raise NotImplementedError(f"Unknown model: {name}")
    return _REGISTRY[name]


# a path component that belongs to the 3D branch (reference: the
# 'core.branch_3d' prefix, factory.py:51-57; our channel-last modules use
# explicit *_3d naming instead of a branch_3d container)
_3D_COMPONENT = re.compile(r"^(branch_3d.*|.*_3d|correlation3d.*|fnet3d.*|corr3d.*)$")


def param_group_label(path: tuple[str, ...], leaf) -> str:
    """Classify a parameter into one of the 4 optimizer groups."""
    is_3d = any(_3D_COMPONENT.match(p) for p in path)
    # torch rule: 1-dim params and biases get no weight decay (factory.py:52)
    is_no_decay = leaf.ndim <= 1 or path[-1] == "bias"
    branch = "3d" if is_3d else "2d"
    decay = "no_decay" if is_no_decay else "decay"
    return f"{branch}_{decay}"


def timm_cosine_schedule(
    base_lr: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 0,
    warmup_lr: float = 1e-5,
    min_lr: float = 0.0,
) -> optax.Schedule:
    """Epoch-granular warmup + cosine (timm CosineLRScheduler parity.

    The reference steps its scheduler once per epoch (train.py:129), so lr is
    piecewise-constant over an epoch; warmup is linear in epoch index and the
    cosine runs over the full `epochs` horizon (timm warmup_prefix=False).
    """

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // max(steps_per_epoch, 1)
        warm = warmup_lr + (base_lr - warmup_lr) * epoch / max(warmup_epochs, 1)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(math.pi * epoch / max(epochs, 1))
        )
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def optimizer_factory(
    cfgs: Any, params, steps_per_epoch: int
) -> optax.GradientTransformation:
    """Build the 4-group Adam/AdamW with per-branch LRs (factory.py:38-80).

    Gradient clipping by global norm (train.py:161-166) is part of the chain.
    """
    lr = cfgs.get("lr", None)
    lr_2d = cfgs.get("lr_2d", lr)
    lr_3d = cfgs.get("lr_3d", lr)
    weight_decay = float(cfgs.get("weight_decay", 0.0))
    eps = float(cfgs.get("eps", 1e-8))

    def make_sched(base_lr):
        return timm_cosine_schedule(
            base_lr=float(base_lr),
            epochs=int(cfgs.get("epochs", 100)),
            steps_per_epoch=steps_per_epoch,
            warmup_epochs=int(cfgs.get("warmup_epochs", 0)),
            warmup_lr=float(cfgs.get("warmup_lr", 1e-5)),
            min_lr=float(cfgs.get("min_lr", 0.0)),
        )

    def make_opt(base_lr, decay):
        if cfgs.get("opt", "adamw") == "adamw":
            return optax.adamw(make_sched(base_lr), eps=eps, weight_decay=decay)
        # torch Adam realises weight_decay as L2 on the gradient *before* the
        # moment updates; add_decayed_weights before adam matches that.
        if decay:
            return optax.chain(
                optax.add_decayed_weights(decay),
                optax.adam(make_sched(base_lr), eps=eps),
            )
        return optax.adam(make_sched(base_lr), eps=eps)

    transforms = {
        "2d_decay": make_opt(lr_2d, weight_decay),
        "3d_decay": make_opt(lr_3d, weight_decay),
        "2d_no_decay": make_opt(lr_2d, 0.0),
        "3d_no_decay": make_opt(lr_3d, 0.0),
    }
    labels = jax.tree_util.tree_map_with_path(
        lambda path, leaf: param_group_label(
            tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path), leaf
        ),
        params,
    )
    tx = optax.multi_transform(transforms, labels)
    max_norm = cfgs.get("grad_max_norm", None)
    if max_norm:
        tx = optax.chain(optax.clip_by_global_norm(float(max_norm)), tx)
    return tx
