"""Training state container and jitted step builders.

The TPU-native equivalent of the reference Trainer's hot loop
(train.py:132-187): one jitted `train_step` that fuses forward, loss, backward,
clip, optimizer update and metric accumulation; the batch arrives sharded on
the mesh's 'data' axis, so XLA inserts the gradient all-reduce (DDP) and the
metric sums compile to ICI collectives.

AMP policy: instead of torch GradScaler + autocast (train.py:113, 147-171),
compute runs in bf16 where the model opts in while parameters and optimizer
state stay f32 — bf16 has f32's exponent range, so no loss scaling is needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def branch_grad_norms(grads) -> dict[str, jax.Array]:
    """Per-branch gradient-norm telemetry (reference utils.py:84-93)."""
    from ..models.factory import _3D_COMPONENT

    sq_2d = jnp.float32(0)
    sq_3d = jnp.float32(0)
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        keys = tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        s = jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        if any(_3D_COMPONENT.match(k) for k in keys):
            sq_3d = sq_3d + s
        else:
            sq_2d = sq_2d + s
    return {
        "grad_norm_2d": jnp.sqrt(sq_2d),
        "grad_norm_3d": jnp.sqrt(sq_3d),
    }


def make_train_step(
    model_train,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    cfgs: Any,
    donate: bool = True,
):
    """Build the jitted training step. `model_train` is the linen module with
    train_mode=True; `loss_fn(outputs, inputs, cfgs) -> (loss, metrics)`.

    `donate=False` disables buffer donation (needed when the same state
    buffers are reused across calls, e.g. the multi-mesh dryrun — device_put
    may alias replicated copies to the same underlying buffer)."""

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: dict):
        def compute_loss(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                outputs, updates = model_train.apply(
                    variables, batch, mutable=["batch_stats"]
                )
                new_stats = updates["batch_stats"]
            else:
                outputs = model_train.apply(variables, batch)
                new_stats = None
            loss, metrics = loss_fn(outputs, batch, cfgs)
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        telemetry = branch_grad_norms(grads)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, loss, metrics, telemetry

    return train_step


def make_eval_step(model_eval, loss_fn: Callable, cfgs: Any):
    """Build the jitted eval step (no grad, running-average norms)."""

    @jax.jit
    def eval_step(params, batch_stats, batch: dict):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        outputs = model_eval.apply(variables, batch)
        _, metrics = loss_fn(outputs, batch, cfgs)
        return metrics

    return eval_step


def make_infer_step(model_eval, mesh=None):
    """Forward-only step returning model outputs (for eval scripts / demo).

    With a `mesh`, the batch is sharded on its leading axis and the forward
    runs under `shard_map`: per shard the model is a plain single-device
    program, so the fast path's Pallas kernels need no SPMD partitioning
    rule (a GSPMD jit would have to replicate or reject the custom calls).
    Eval is per-sample independent, so the sharded run is exact. Params ride
    replicated (P()); batch leaves shard on 'data'; output leaves shard on
    the batch axis (axis 1 for the `*_seq` [T, B, ...] outputs).
    """

    def apply_fn(params, batch_stats, batch: dict):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return model_eval.apply(variables, batch)

    if mesh is None:
        return jax.jit(apply_fn)

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    cache = {}

    def infer_step(params, batch_stats, batch: dict):
        if "fn" not in cache:
            # output pytree structure (needed for out_specs) via an abstract
            # per-shard trace
            shard_shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    (x.shape[0] // mesh.size,) + x.shape[1:], x.dtype
                ),
                batch,
            )
            out = jax.eval_shape(apply_fn, params, batch_stats, shard_shapes)
            out_specs = {
                k: P(None, "data") if k.endswith("_seq") else P("data")
                for k in out
            }
            cache["fn"] = jax.jit(
                shard_map(
                    apply_fn,
                    mesh=mesh,
                    in_specs=(P(), P(), P("data")),
                    out_specs=out_specs,
                    check_rep=False,
                )
            )
        return cache["fn"](params, batch_stats, batch)

    return infer_step
