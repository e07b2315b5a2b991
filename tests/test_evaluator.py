"""Protocol evaluator tests against synthetic datasets and a tiny model.

Checks the metric conventions of the 7 reference protocols (eval_things.py,
eval_sintel.py, eval_*_sf.py) without needing real datasets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from camliflow_tpu.runtime.evaluator import Evaluator
from camliflow_tpu.utils.config import Config


class SyntheticPCDataset:
    """LiDAR-only samples with a known constant flow."""

    def __init__(self, n_samples=4, n=256, flow=0.02, with_noc=False):
        self.n_samples = n_samples
        self.n = n
        self.flow = flow
        self.with_noc = with_noc

    def __len__(self):
        return self.n_samples

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        pc1 = rng.randn(self.n, 3).astype(np.float32)
        pc1[:, 2] = np.abs(pc1[:, 2]) * 10 + 5
        pc2 = pc1 + self.flow
        out = {
            "index": i,
            "pcs": np.concatenate([pc1, pc2], axis=1).astype(np.float32),
            "flow_3d": (pc2 - pc1).astype(np.float32),
            "intrinsics": np.float32([1050, 479.5, 269.5]),
        }
        if self.with_noc:
            out["noc_mask_3d"] = (rng.rand(self.n) > 0.2).astype(np.float32)
        return out


@pytest.fixture(scope="module")
def evaluator_factory():
    cfgs = Config(
        {
            "model": {
                "name": "camliraft_l",
                "n_iters_train": 1,
                "n_iters_eval": 1,
                "ids": {"enabled": False},
                "loss": {"gamma": 0.8, "order": "l2-norm"},
                "n_samples_list": [128, 64, 32, 16],
            },
            "testset": {"n_workers": 0},
            "ckpt": {"path": None},
        }
    )

    from camliflow_tpu.models import camliraft_l as m

    sample = SyntheticPCDataset()[0]
    inputs = {
        k: jnp.asarray(v)[None]
        for k, v in sample.items()
        if isinstance(v, np.ndarray)
    }
    model = m.CamLiRAFTL(cfgs=cfgs.model.to_dict(), train_mode=False)
    variables = model.init(jax.random.PRNGKey(0), inputs)

    def make(dataset):
        return Evaluator(cfgs, variables=variables, batch_size=2, dataset=dataset)

    return make


def test_things_protocol_3d(evaluator_factory):
    ev = evaluator_factory(SyntheticPCDataset())
    results = ev.run_things()
    assert "EPE3d" in results and np.isfinite(results["EPE3d"])
    assert 0.0 <= results["5cm"] <= 1.0


def test_sf_protocol_hpl(evaluator_factory):
    ev = evaluator_factory(SyntheticPCDataset())
    results = ev.run_sf_protocol(per_sample_average=False, use_noc_mask=False)
    assert set(results) == {"EPE3d", "AccS", "AccR", "Outlier"}
    assert 0.0 <= results["AccS"] <= 1.0


def test_sf_protocol_flownet3d_noc(evaluator_factory):
    ev = evaluator_factory(SyntheticPCDataset(with_noc=True))
    results = ev.run_sf_protocol(per_sample_average=True, use_noc_mask=True)
    assert np.isfinite(results["EPE3d"])


def test_sf_protocol_per_sample(evaluator_factory):
    ev = evaluator_factory(SyntheticPCDataset())
    results = ev.run_sf_protocol(per_sample_average=True, use_noc_mask=False)
    assert np.isfinite(results["Outlier"])


def test_things_protocol_data_parallel_matches(evaluator_factory):
    """batch_size=8 on the 8-device virtual mesh engages the sharded DP path
    (Evaluator.mesh); eval is per-sample independent so the metrics must
    match the batch_size=2 (fallback-placement) run exactly-ish."""
    dataset = SyntheticPCDataset(n_samples=8)
    ev_small = evaluator_factory(dataset)
    base = ev_small.run_things()

    from camliflow_tpu.runtime.evaluator import Evaluator

    ev_dp = Evaluator(
        ev_small.cfgs, variables=ev_small.variables, batch_size=8,
        dataset=dataset,
    )
    assert ev_dp.mesh is not None and ev_dp.mesh.size == 8
    got = ev_dp.run_things()
    for key in base:
        np.testing.assert_allclose(got[key], base[key], rtol=1e-4, atol=1e-6)

    # fast path under shard_map: the Pallas kernels (interpret mode on CPU)
    # run per shard — the reason the DP step is shard_map, not a GSPMD jit
    # (pallas_call has no SPMD partitioning rule)
    cfgs_fast = Config(
        {
            **ev_small.cfgs.to_dict(),
            "model": {
                **ev_small.cfgs.model.to_dict(),
                "fast_inference": "on",
            },
        }
    )
    ev_fast = Evaluator(
        cfgs_fast, variables=ev_small.variables, batch_size=8, dataset=dataset
    )
    fast = ev_fast.run_things()
    assert abs(fast["EPE3d"] - base["EPE3d"]) <= 0.02, (fast, base)


def test_multihost_shard_accumulators_match(evaluator_factory):
    """Multi-host eval sharding (loader shard_index/num_shards + fixed-key
    cross-process sums): the per-shard accumulator vectors must sum to the
    unsharded run's, including a drop_last=False remainder batch that leaves
    shard 1 empty (n=5, global batch 2, 2 shards)."""
    from camliflow_tpu.runtime.evaluator import Evaluator

    dataset = SyntheticPCDataset(n_samples=5)
    ev_base = evaluator_factory(dataset)

    captured: dict[int, list[np.ndarray]] = {}

    def make_capturing(tag):
        orig = Evaluator._reduce_sums

        def capture(self, m, keys):
            captured.setdefault(tag, []).append(
                np.array([float(m[k]) for k in keys], np.float64)
            )
            return orig(self, m, keys)

        return capture

    base_results = []
    for tag, ev in (
        (
            -1,
            ev_base,
        ),
        (
            0,
            Evaluator(
                ev_base.cfgs, variables=ev_base.variables, batch_size=2,
                dataset=dataset, shard_index=0, num_shards=2,
            ),
        ),
        (
            1,
            Evaluator(
                ev_base.cfgs, variables=ev_base.variables, batch_size=2,
                dataset=dataset, shard_index=1, num_shards=2,
            ),
        ),
    ):
        Evaluator._reduce_sums, orig = make_capturing(tag), Evaluator._reduce_sums
        try:
            base_results.append(ev.run_things())
        finally:
            Evaluator._reduce_sums = orig

    # each run_things reduces 3 accumulators (2d, 3d, 3d_noc) in order
    assert len(captured[-1]) == len(captured[0]) == len(captured[1]) == 3
    for vec_all, vec0, vec1 in zip(captured[-1], captured[0], captured[1]):
        np.testing.assert_allclose(vec0 + vec1, vec_all, rtol=1e-6)
    # every sample was evaluated exactly once across shards (counts entry)
    assert captured[0][1][0] + captured[1][1][0] == captured[-1][1][0] > 0
