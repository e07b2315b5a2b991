"""Mesh construction and sharding helpers.

The TPU-native replacement for the reference's DDP/NCCL stack (train.py:30-51,
99-103, mp.spawn 302-307): a 1-D `Mesh` over all chips with the batch sharded
on the 'data' axis and parameters replicated. Under `jit`, XLA inserts the
gradient all-reduce (the DDP equivalent) and metric reductions as ICI
collectives automatically; BatchNorm batch statistics are computed over the
global (sharded) batch, which gives cross-device SyncBN semantics
(train.py:99-100) for free.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the mesh
then spans all processes and per-host data loading feeds each host's shard
(`jax.make_array_from_process_local_data`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    data: int, spatial: int, devices=None, axis_names=("data", "spatial")
) -> Mesh:
    """2-D mesh for hybrid data x spatial parallelism.

    The spatial axis shards image height across chips: GSPMD inserts the conv
    halo exchanges and resharding collectives automatically once activations
    are constrained to P('data', 'spatial') (see shard_batch_spatial). Useful
    when per-chip HBM cannot hold the level-0 all-pairs correlation volume at
    full KITTI resolution.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(devices, axis_names)


def shard_batch_spatial(batch: dict, mesh: Mesh) -> dict:
    """Place a batch with images sharded (batch, height) over (data, spatial);
    per-point and low-rank arrays shard on 'data' only."""
    def put(key, x):
        x = jnp.asarray(x)
        if key == "images" or (key == "flow_2d" and x.ndim == 4):
            spec = P("data", "spatial")
        else:
            spec = P("data")
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(k, v) for k, v in batch.items()}


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host-local batch dict with the leading axis sharded on `axis_name`."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params, optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def unreplicate(tree):
    """Fetch a replicated pytree to host numpy."""
    return jax.tree.map(lambda x: np.asarray(x), tree)
