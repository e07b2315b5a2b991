"""Evaluation protocols — the 7 reference eval entry points unified.

Reference semantics:
- 'things'        eval_things.py:36-127   (per-point EPE2d/1px/Fl + EPE3d/5cm/
                  10cm + non-occluded split, NaN-masked)
- 'sintel'        eval_sintel.py:38-88    (per-scene then total 2D AEPE)
- 'things_noc_sf' eval_things_noc_sf.py   (HPLFlowNet: per-point AccS/AccR/
                  Outlier, no mask)
- 'things_occ_sf' eval_things_occ_sf.py   (FlowNet3D: per-sample averaged,
                  noc-masked)
- 'kitti_occ_sf'  eval_kitti_occ_sf.py    (FlowNet3D KITTI: per-sample avg)
- 'kitti_noc_sf'  eval_kitti_noc_sf.py    (PointPWC KITTI: per-sample avg)
- kitti_submission.py is in runtime/submission.py.

Metric math runs on host NumPy over jitted model outputs — eval is
IO/throughput bound, not metric bound.
"""

from __future__ import annotations

import logging
from collections import defaultdict

import jax
import numpy as np

from ..data.loader import DataLoader
from ..models.factory import model_factory
from .train_state import make_infer_step

logger = logging.getLogger("camliflow_tpu")


def _epe_map(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    return np.sqrt(np.sum((pred - target[..., : pred.shape[-1]]) ** 2, axis=-1))


class Evaluator:
    """Generic evaluator: build model, restore checkpoint, stream batches.

    Multi-chip: with more than one local device the batch is sharded over a
    1-D data mesh and the forward runs under shard_map (per-shard a plain
    single-device program — the Pallas fast-path kernels need no SPMD
    partitioning rule), with variables replicated. Eval is per-sample
    independent, so this is exact. The reference evaluates single-GPU
    (eval_things.py:139-151); this scales the same protocol across one
    host's chips. Batches whose leading dim doesn't divide the mesh (the
    drop_last=False remainder) fall back to the single-device step.

    Multi-host: each process evaluates a contiguous 1/num_shards slice of
    every batch (DataLoader shard_index/num_shards, defaulting to
    jax.process_index/count) and the per-protocol (sum, count) accumulators
    are summed across processes before the final ratios — exact, because
    every metric in every protocol is a pure sum over samples. Per-scene
    Sintel logs stay per-process; the returned totals are global.
    """

    def __init__(
        self,
        cfgs,
        variables=None,
        batch_size: int = 8,
        dataset=None,
        shard_index: int | None = None,
        num_shards: int | None = None,
    ):
        self.cfgs = cfgs
        self.num_shards = jax.process_count() if num_shards is None else num_shards
        self.shard_index = (
            jax.process_index() if shard_index is None else shard_index
        )
        self.spec = model_factory(cfgs.model)
        self.model = self.spec.module_cls(cfgs=cfgs.model.to_dict(), train_mode=False)
        self.infer_step = make_infer_step(self.model)
        self.mesh = None
        self.infer_step_dp = None
        if jax.local_device_count() > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(jax.local_devices())
            self.infer_step_dp = make_infer_step(self.model, mesh=self.mesh)

        if dataset is None:
            from ..data.datasets import dataset_factory

            dataset = dataset_factory(cfgs.testset)
        self.dataset = dataset
        self.loader = DataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=False,
            num_workers=int(cfgs.testset.get("n_workers", 4)),
            drop_last=False,
            shard_index=self.shard_index,
            num_shards=self.num_shards,
        )

        if variables is not None:
            self.variables = variables
        else:
            from .checkpoint import restore_variables

            self.variables = restore_variables(cfgs.ckpt.path)
        if self.mesh is not None:
            from ..parallel.mesh import replicate_tree

            self.variables = replicate_tree(self.variables, self.mesh)

    def _forward(self, batch: dict) -> dict:
        return jax.tree.map(np.asarray, self._forward_device(batch))

    def _forward_device(self, batch: dict) -> dict:
        """Enqueue the forward and return DEVICE arrays (no host sync)."""
        import jax.numpy as jnp

        arrays = {
            k: v
            for k, v in batch.items()
            if isinstance(v, np.ndarray) and k not in ("index", "input_h", "input_w")
        }
        step = self.infer_step
        if self.mesh is not None and len(batch["index"]) % self.mesh.size == 0:
            from ..parallel.mesh import shard_batch

            # one host->shards transfer (placing via jnp.asarray first would
            # stage the full batch on device 0 and reshard device-to-device)
            arrays = shard_batch(arrays, self.mesh)
            step = self.infer_step_dp
        else:
            arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
        params = self.variables["params"]
        batch_stats = self.variables.get("batch_stats")
        return step(params, batch_stats, arrays)

    def _batches(self):
        """Yield (batch, outputs-as-numpy) with one batch of lookahead:
        batch i+1's forward is ENQUEUED before batch i's outputs are
        fetched, so the per-sample numpy metric math below overlaps the
        chip instead of leaving it idle between forwards (JAX async
        dispatch; the fetch is the only sync point)."""
        pending = None
        for batch in self.loader:
            out = self._forward_device(batch)
            if pending is not None:
                yield pending[0], jax.tree.map(np.asarray, pending[1])
            pending = (batch, out)
        if pending is not None:
            yield pending[0], jax.tree.map(np.asarray, pending[1])

    def _reduce_sums(self, m: dict, keys: tuple) -> dict:
        """Sum fixed-key accumulators across eval processes.

        Keys are an explicit static tuple (not m.keys()): defaultdict key
        sets can differ per shard (e.g. a shard whose batches carry no
        occ_mask_3d), and a ragged allgather would deadlock.
        """
        vec = np.array([float(m[k]) for k in keys], np.float64)
        if self.num_shards > 1 and jax.process_count() == 1:
            import warnings

            warnings.warn(
                "Evaluator num_shards>1 on a single process: reported "
                "metrics are SHARD-LOCAL sums (this shard saw 1/"
                f"{self.num_shards} of the dataset); aggregate the "
                "accumulators across shards externally.",
                stacklevel=2,
            )
        if self.num_shards > 1 and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            vec = np.asarray(multihost_utils.process_allgather(vec)).sum(
                axis=0
            )
        return dict(zip(keys, vec))

    # ------------------------------------------------------------------
    def run_things(self, save_results: bool = False, save_dir: str = "prediction/things"):
        """eval_things.py protocol."""
        m2d = defaultdict(float)
        m3d = defaultdict(float)
        m3d_noc = defaultdict(float)

        for batch, outputs in self._batches():
            batch_n = len(batch["index"])
            for b in range(batch_n):
                if "flow_2d" in outputs:
                    pred = outputs["flow_2d"][b]
                    target = batch["flow_2d"][b]
                    if target.shape[-1] > 2:
                        mask = target[..., 2] > 0
                        target = target[..., :2]
                    else:
                        mask = np.ones(target.shape[:2], bool)
                    epe = _epe_map(pred, target)
                    mask = np.logical_and(mask, ~np.isnan(epe))
                    mag = np.linalg.norm(target, axis=-1)
                    fl = np.logical_and(epe > 3.0, epe / mag > 0.05)
                    m2d["counts"] += epe[mask].size
                    m2d["EPE2d"] += epe[mask].sum()
                    m2d["1px"] += np.count_nonzero(epe[mask] < 1.0)
                    m2d["Fl"] += fl[mask].sum()
                    if save_results:
                        self._save_flow2d(save_dir, batch["index"][b], pred)

                if "flow_3d" in outputs:
                    pred = outputs["flow_3d"][b]
                    target = batch["flow_3d"][b]
                    if target.shape[-1] > 3:
                        mask = target[..., 3] > 0
                        target = target[..., :3]
                    else:
                        mask = np.ones(target.shape[0], bool)
                    epe = _epe_map(pred, target)
                    mask = np.logical_and(mask, ~np.isnan(epe))
                    m3d["counts"] += epe[mask].size
                    m3d["EPE3d"] += epe[mask].sum()
                    m3d["5cm"] += np.count_nonzero(epe[mask] < 0.05)
                    m3d["10cm"] += np.count_nonzero(epe[mask] < 0.1)
                    if "occ_mask_3d" in batch:
                        occ = batch["occ_mask_3d"][b]
                        noc = epe[np.logical_and(occ == 0, mask)]
                        m3d_noc["counts"] += noc.size
                        m3d_noc["EPE3d"] += noc.sum()
                        m3d_noc["5cm"] += np.count_nonzero(noc < 0.05)
                        m3d_noc["10cm"] += np.count_nonzero(noc < 0.1)
                    if save_results:
                        self._save_flow3d(save_dir, batch["index"][b], pred)

        m2d = self._reduce_sums(m2d, ("counts", "EPE2d", "1px", "Fl"))
        m3d = self._reduce_sums(m3d, ("counts", "EPE3d", "5cm", "10cm"))
        m3d_noc = self._reduce_sums(m3d_noc, ("counts", "EPE3d", "5cm", "10cm"))
        results = {}
        if m2d["counts"] > 0:
            results["EPE2d"] = m2d["EPE2d"] / m2d["counts"]
            results["1px"] = m2d["1px"] / m2d["counts"]
            results["Fl"] = m2d["Fl"] / m2d["counts"]
            logger.info("#### 2D Metrics ####")
            logger.info("EPE: %.3f", results["EPE2d"])
            logger.info("1px: %.2f%%", results["1px"] * 100)
            logger.info("Fl:  %.2f%%", results["Fl"] * 100)
        if m3d["counts"] > 0:
            results["EPE3d"] = m3d["EPE3d"] / m3d["counts"]
            results["5cm"] = m3d["5cm"] / m3d["counts"]
            results["10cm"] = m3d["10cm"] / m3d["counts"]
            logger.info("#### 3D Metrics ####")
            logger.info("EPE: %.3f", results["EPE3d"])
            logger.info("5cm: %.2f%%", results["5cm"] * 100)
            logger.info("10cm: %.2f%%", results["10cm"] * 100)
        if m3d_noc["counts"] > 0:
            results["EPE3d_noc"] = m3d_noc["EPE3d"] / m3d_noc["counts"]
            results["5cm_noc"] = m3d_noc["5cm"] / m3d_noc["counts"]
            results["10cm_noc"] = m3d_noc["10cm"] / m3d_noc["counts"]
            logger.info("#### 3D Metrics (Non-occluded) ####")
            logger.info("EPE: %.3f", results["EPE3d_noc"])
        return results

    # ------------------------------------------------------------------
    def run_sintel(self):
        """eval_sintel.py protocol: per-scene 2D AEPE + total."""
        per_scene = defaultdict(lambda: defaultdict(float))
        for batch, outputs in self._batches():
            for b in range(len(batch["index"])):
                scene = batch["scene_name"][b]
                pred = outputs["flow_2d"][b]
                target = batch["flow_2d"][b]
                epe = _epe_map(pred, target[..., :2])
                mask = ~np.isnan(epe)
                per_scene[scene]["counts"] += epe[mask].size
                per_scene[scene]["EPE2d"] += epe[mask].sum()

        total_epe, total_count = 0.0, 0
        for scene, m in sorted(per_scene.items()):
            if m["counts"] == 0:
                continue
            total_epe += m["EPE2d"]
            total_count += m["counts"]
            logger.info("%s:\t%.3f", scene, m["EPE2d"] / m["counts"])
        totals = self._reduce_sums(
            {"EPE2d": total_epe, "counts": total_count}, ("EPE2d", "counts")
        )
        result = totals["EPE2d"] / max(totals["counts"], 1)
        logger.info("Total:\t%.3f", result)
        return {"AEPE": result}

    # ------------------------------------------------------------------
    def run_sf_protocol(self, per_sample_average: bool, use_noc_mask: bool):
        """AccS/AccR/Outlier protocols.

        per_sample_average=False, use_noc_mask=False -> things_noc_sf (HPL)
        per_sample_average=True,  use_noc_mask=True  -> things_occ_sf (FlowNet3D)
        per_sample_average=True,  use_noc_mask=False -> kitti_{occ,noc}_sf
        """
        m = defaultdict(float)
        for batch, outputs in self._batches():
            for b in range(len(batch["index"])):
                pred = outputs["flow_3d"][b]
                target = batch["flow_3d"][b][..., :3]
                epe = _epe_map(pred, target)
                gt_norm = np.linalg.norm(target, axis=-1)
                rel = epe / (gt_norm + 1e-4)

                if use_noc_mask:
                    mask = batch["noc_mask_3d"][b].astype(np.float32)
                    acc_s = np.logical_or((epe < 0.05) * mask, (rel < 0.05) * mask)
                    acc_r = np.logical_or((epe < 0.1) * mask, (rel < 0.1) * mask)
                    outlier = np.logical_or((epe > 0.3) * mask, (rel > 0.1) * mask)
                    denom = mask.sum()
                    if denom == 0:
                        continue
                    m["counts"] += 1
                    m["EPE3d"] += (epe * mask).sum() / denom
                    m["AccS"] += np.count_nonzero(acc_s) / denom
                    m["AccR"] += np.count_nonzero(acc_r) / denom
                    m["Outlier"] += np.count_nonzero(outlier) / denom
                else:
                    acc_s = np.logical_or(epe < 0.05, rel < 0.05)
                    acc_r = np.logical_or(epe < 0.1, rel < 0.1)
                    outlier = np.logical_or(epe > 0.3, rel > 0.1)
                    if per_sample_average:
                        n = epe.size
                        m["counts"] += 1
                        m["EPE3d"] += epe.sum() / n
                        m["AccS"] += np.count_nonzero(acc_s) / n
                        m["AccR"] += np.count_nonzero(acc_r) / n
                        m["Outlier"] += np.count_nonzero(outlier) / n
                    else:
                        m["counts"] += epe.size
                        m["EPE3d"] += epe.sum()
                        m["AccS"] += np.count_nonzero(acc_s)
                        m["AccR"] += np.count_nonzero(acc_r)
                        m["Outlier"] += np.count_nonzero(outlier)

        m = self._reduce_sums(
            m, ("counts", "EPE3d", "AccS", "AccR", "Outlier")
        )
        results = {
            "EPE3d": m["EPE3d"] / m["counts"],
            "AccS": m["AccS"] / m["counts"],
            "AccR": m["AccR"] / m["counts"],
            "Outlier": m["Outlier"] / m["counts"],
        }
        logger.info("#### 3D Metrics ####")
        logger.info("EPE: %.3f", results["EPE3d"])
        logger.info("AccS: %.2f%%", results["AccS"] * 100)
        logger.info("AccR: %.2f%%", results["AccR"] * 100)
        logger.info("Outlier: %.2f%%", results["Outlier"] * 100)
        return results

    # ------------------------------------------------------------------
    @staticmethod
    def _save_flow2d(save_dir, test_id, pred):
        import os

        from ..data.io import save_flow_png

        os.makedirs(f"{save_dir}/flow_2d", exist_ok=True)
        save_flow_png(
            f"{save_dir}/flow_2d/%07d.png" % int(test_id),
            np.clip(pred, -500, 500),
        )

    @staticmethod
    def _save_flow3d(save_dir, test_id, pred):
        import os

        os.makedirs(f"{save_dir}/flow_3d", exist_ok=True)
        np.save(f"{save_dir}/flow_3d/%07d.npy" % int(test_id), pred)
