"""Multi-device tests on the 8-device virtual CPU mesh: sharded train step,
gradient equivalence with single-device execution, loader sharding."""

import numpy as np
import jax
import jax.numpy as jnp

from camliflow_tpu.data.loader import DataLoader
from camliflow_tpu.models import camliraft_l as m
from camliflow_tpu.models.factory import optimizer_factory
from camliflow_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from camliflow_tpu.runtime.train_state import TrainState, make_train_step
from camliflow_tpu.utils.config import Config


def small_cfgs():
    return Config(
        {
            "name": "camliraft_l",
            "n_iters_train": 1,
            "n_iters_eval": 1,
            "ids": {"enabled": False},
            "loss": {"gamma": 0.8, "order": "l2-norm"},
            "n_samples_list": [128, 64, 32, 16],
        }
    )


def make_inputs(rng, batch):
    pc1 = rng.randn(batch, 256, 3).astype(np.float32)
    pc2 = pc1 + 0.05 * rng.randn(batch, 256, 3).astype(np.float32)
    return {
        "pcs": np.concatenate([pc1, pc2], -1),
        "intrinsics": np.tile([1050.0, 479.5, 269.5], (batch, 1)).astype(np.float32),
        "flow_3d": (pc2 - pc1),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_train_step_matches_single_device(rng):
    """The jitted step over an 8-way sharded batch must produce the same loss
    and gradients as unsharded execution (GSPMD data parallelism)."""
    cfgs = small_cfgs()
    inputs_np = make_inputs(rng, batch=8)
    inputs = {k: jnp.asarray(v) for k, v in inputs_np.items()}

    model = m.CamLiRAFTL(cfgs=cfgs, train_mode=True)
    variables = model.init(jax.random.PRNGKey(0), inputs)
    params, batch_stats = variables["params"], variables["batch_stats"]

    training_cfgs = Config(
        {"opt": "adamw", "weight_decay": 1e-6, "grad_max_norm": 1, "epochs": 1,
         "lr": 1e-3, "warmup_epochs": 0, "min_lr": 0.0}
    )
    tx = optimizer_factory(training_cfgs, params, steps_per_epoch=10)

    def make_state():
        return TrainState(
            params=jax.tree.map(jnp.array, params),
            batch_stats=jax.tree.map(jnp.array, batch_stats),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    train_step = make_train_step(model, m.loss_fn, tx, cfgs)

    # single-device (default placement)
    state1, loss1, metrics1, telemetry1 = train_step(make_state(), inputs)

    # 8-way sharded batch + replicated params
    mesh = make_mesh()
    sharded = shard_batch(inputs_np, mesh)
    state2 = TrainState(
        params=replicate_tree(params, mesh),
        batch_stats=replicate_tree(batch_stats, mesh),
        opt_state=replicate_tree(tx.init(params), mesh),
        step=jnp.zeros((), jnp.int32),
    )
    state2, loss2, metrics2, telemetry2 = train_step(state2, sharded)

    assert abs(float(loss1) - float(loss2)) < 1e-4
    # updated parameters agree
    flat1 = jax.tree.leaves(state1.params)
    flat2 = jax.tree.leaves(state2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_loader_sharding(rng):
    class Dummy:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    seen = []
    for shard in range(4):
        loader = DataLoader(
            Dummy(), batch_size=8, shuffle=True, num_workers=0,
            shard_index=shard, num_shards=4,
        )
        loader.set_epoch(3)
        for batch in loader:
            assert batch["x"].shape == (2, 2)
            seen.extend(batch["x"][:, 0].astype(int).tolist())
    # all shards together cover the epoch exactly once
    assert sorted(seen) == list(range(32))


def test_loader_epoch_shuffle_changes():
    class Dummy:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"x": np.full((1,), i, np.float32)}

    loader = DataLoader(Dummy(), batch_size=16, shuffle=True, num_workers=0)
    loader.set_epoch(0)
    order0 = [int(v) for b in loader for v in b["x"][:, 0]]
    loader.set_epoch(1)
    order1 = [int(v) for b in loader for v in b["x"][:, 0]]
    assert order0 != order1
    assert sorted(order0) == sorted(order1) == list(range(16))
