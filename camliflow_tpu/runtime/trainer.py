"""Training runtime: the TPU-native equivalent of the reference Trainer
(train.py:26-247).

Differences from the reference, by design:
- No mp.spawn / DDP / NCCL: one process per host, a 1-D device mesh, and
  jit-compiled steps over sharded batches (see parallel/mesh.py).
- Optimizer state IS checkpointed (the reference drops it, train.py:228-238).
- Metrics accumulate as (sum, count) pairs on device and are finalised on
  host; the cross-device reduction happens inside jit.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from ..data.datasets import dataset_factory
from ..data.loader import DataLoader
from ..models.factory import model_factory, optimizer_factory
from ..models.metrics import finalize_metrics, merge_metrics
from ..parallel.mesh import make_mesh, replicate_tree, shard_batch
from .train_state import TrainState, make_eval_step, make_train_step

logger = logging.getLogger("camliflow_tpu")


def init_logging(log_path: Path | None = None):
    handlers = [logging.StreamHandler()]
    if log_path is not None:
        handlers.append(logging.FileHandler(log_path))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )


class Trainer:
    """Epoch-based trainer with validation + best-checkpoint selection."""

    def __init__(self, cfgs):
        self.cfgs = cfgs
        self.mesh = make_mesh()
        self.is_main = jax.process_index() == 0

        self.log_dir = Path(cfgs.log.dir)
        self.ckpt_dir = self.log_dir / "ckpts"
        if self.is_main:
            self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        init_logging(self.log_dir / "train.log" if self.is_main else None)

        # datasets + loaders (per-host sharded indices)
        self.train_set = dataset_factory(cfgs.trainset)
        self.val_set = dataset_factory(cfgs.valset)
        self.train_loader = DataLoader(
            self.train_set,
            batch_size=cfgs.model.batch_size,
            shuffle=True,
            num_workers=int(cfgs.trainset.get("n_workers", 4)),
            drop_last=True,
            shard_index=jax.process_index(),
            num_shards=jax.process_count(),
        )
        self.val_loader = DataLoader(
            self.val_set,
            batch_size=cfgs.model.batch_size,
            shuffle=False,
            num_workers=int(cfgs.valset.get("n_workers", 4)),
            drop_last=False,
            shard_index=jax.process_index(),
            num_shards=jax.process_count(),
        )

        # model + optimizer. training.amp mirrors the reference's autocast
        # flag (train.py:147 `torch.cuda.amp.autocast(enabled=cfgs.amp)`):
        # the TRAIN model computes in bfloat16 (params stay f32; the f32
        # islands of nn/layers.py apply), validation/eval stays exact f32.
        # Default ON since 2026-08-19: loss/EPE curves overlay f32 to
        # <0.3%/1e-4 (PERF.md round-5) and the step is 11% faster on v5e.
        # Disable with training.amp=false.
        self.spec = model_factory(cfgs.model)
        train_model_cfgs = cfgs.model.to_dict()
        if bool(cfgs.training.get("amp", True)) and "compute_dtype" not in (
            train_model_cfgs
        ):
            train_model_cfgs["compute_dtype"] = "bfloat16"
        self.model_train = self.spec.module_cls(
            cfgs=train_model_cfgs, train_mode=True
        )
        self.model_eval = self.spec.module_cls(
            cfgs=cfgs.model.to_dict(), train_mode=False
        )

        sample_batch = self._host_batch(next(iter(self.val_loader)))
        variables = jax.jit(self.model_train.init)(
            jax.random.PRNGKey(int(cfgs.get("seed", 0))), sample_batch
        )
        # ImageNet-pretrained backbone (reference raft_core.py:20-23)
        pretrained = cfgs.model.get_path("backbone.pretrained")
        if pretrained and Path(pretrained).exists():
            from .checkpoint import load_backbone_pretrained

            variables, n_loaded = load_backbone_pretrained(
                dict(variables), pretrained
            )
            logger.info(
                "loaded %d pretrained backbone tensors from %s", n_loaded, pretrained
            )
        elif pretrained:
            logger.warning("backbone.pretrained=%s not found, training from scratch",
                           pretrained)

        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        n_params = sum(p.size for p in jax.tree.leaves(params))
        logger.info("#parameters: %.2fM", n_params / 1e6)

        self.tx = optimizer_factory(
            cfgs.training, params, steps_per_epoch=len(self.train_loader)
        )
        opt_state = self.tx.init(params)
        self.state = TrainState(
            params=replicate_tree(params, self.mesh),
            batch_stats=replicate_tree(batch_stats, self.mesh)
            if batch_stats is not None
            else None,
            opt_state=replicate_tree(opt_state, self.mesh),
            step=jnp.zeros((), jnp.int32),
        )

        self.train_step = make_train_step(
            self.model_train, self.spec.loss_fn, self.tx, cfgs.model
        )
        self.eval_step = make_eval_step(self.model_eval, self.spec.loss_fn, cfgs.model)

        self.best_metrics = None
        self.start_epoch = 0

        self.ckpt_mgr = ocp.CheckpointManager(
            self.ckpt_dir.absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=int(cfgs.ckpt.get("max_to_keep", 3)), create=True
            ),
        )
        # best checkpoints live in their own manager: orbax requires strictly
        # increasing steps within one manager, so a "best" sentinel step would
        # silently block subsequent epoch saves
        self.best_mgr = ocp.CheckpointManager(
            (self.log_dir / "ckpts_best").absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        )
        # TensorBoard event files (reference train.py:61, 210-226); scalar +
        # image summaries also land in metrics.jsonl / PNGs for headless use
        self.tb = None
        if self.is_main and cfgs.log.get("tensorboard", True):
            from ..utils.tensorboard import EventWriter

            self.tb = EventWriter(self.log_dir / "tb")

        if cfgs.ckpt.get("resume", False) and self.ckpt_mgr.latest_step() is not None:
            self.load_ckpt()

    def _host_batch(self, batch: dict) -> dict:
        """Drop non-array fields and move to device, sharded on 'data'."""
        arrays = {
            k: v for k, v in batch.items() if isinstance(v, np.ndarray) and v.ndim > 1
        }
        arrays.update(
            {
                k: v
                for k, v in batch.items()
                if isinstance(v, np.ndarray) and v.ndim == 1 and k != "index"
            }
        )
        arrays.pop("input_h", None)
        arrays.pop("input_w", None)
        return shard_batch(arrays, self.mesh)

    def run(self):
        epochs = int(self.cfgs.training.epochs)
        val_interval = int(self.cfgs.log.get("val_interval", 1))
        for epoch in range(self.start_epoch, epochs):
            self.train_loader.set_epoch(epoch)
            self.train_one_epoch(epoch)
            if (epoch + 1) % val_interval == 0 or epoch == epochs - 1:
                metrics = self.validate(epoch)
                if self.spec.is_better(metrics, self.best_metrics):
                    self.best_metrics = metrics
                    self.save_ckpt(epoch, best=True)
            self.save_ckpt(epoch)
        # finalize async orbax writes before the process exits
        self.ckpt_mgr.wait_until_finished()
        self.best_mgr.wait_until_finished()
        logger.info("training finished")

    def train_one_epoch(self, epoch: int):
        from ..utils.profiling import BadLossChecker

        logger.info("epoch %d begins", epoch + 1)
        epoch_metrics: dict = {}
        bad_loss = BadLossChecker()
        t0 = time.time()
        print_interval = int(self.cfgs.log.get("print_interval", 50))

        # One-step-delayed host fetch: step i's loss/metrics are device
        # futures consumed only AFTER step i+1 is enqueued, so the chip runs
        # step i+1 while the host merges metrics, shards the next batch and
        # logs — instead of idling on every np.asarray (the reference's
        # per-step .item() pattern serialises the same way on GPU,
        # train.py:188-206; here the fetch is the only host sync point).
        # BadLossChecker therefore fires one step late, which does not
        # change its semantics (divergence persists across steps).
        pending = None  # (step_idx, loss, metrics, telemetry) device refs

        def consume(step_idx, loss, metrics, telemetry):
            nonlocal epoch_metrics
            epoch_metrics = merge_metrics(
                epoch_metrics, jax.tree.map(np.asarray, metrics)
            )
            if bad_loss.check(float(loss)):
                raise RuntimeError(
                    f"loss diverged for {bad_loss.patience} consecutive steps "
                    f"(last: {float(loss)}); aborting"
                )
            if self.is_main and step_idx % print_interval == 0:
                logger.info(
                    "E %d S %d loss %.4f g2d %.3f g3d %.3f %.2fs/it mem %.2fGB",
                    epoch + 1,
                    step_idx,
                    float(loss),
                    float(telemetry["grad_norm_2d"]),
                    float(telemetry["grad_norm_3d"]),
                    (time.time() - t0) / (step_idx + 1),
                    _device_memory_gb(),
                )

        for i, batch in enumerate(self.train_loader):
            batch = self._host_batch(batch)
            self.state, loss, metrics, telemetry = self.train_step(self.state, batch)
            if pending is not None:
                consume(*pending)
            pending = (i, loss, metrics, telemetry)
        if pending is not None:
            consume(*pending)
        summary = finalize_metrics(epoch_metrics)
        logger.info("train epoch %d: %s", epoch + 1, _fmt(summary))
        self._dump_scalars("train", epoch, summary)

    def validate(self, epoch: int) -> dict:
        logger.info("validating epoch %d", epoch + 1)
        agg: dict = {}
        first_batch = None
        pending = None  # one-step-delayed fetch (same pipelining as training)
        for batch in self.val_loader:
            batch = self._host_batch(batch)
            if first_batch is None:
                first_batch = batch
            metrics = self.eval_step(
                self.state.params, self.state.batch_stats, batch
            )
            if pending is not None:
                agg = merge_metrics(agg, jax.tree.map(np.asarray, pending))
            pending = metrics
        if pending is not None:
            agg = merge_metrics(agg, jax.tree.map(np.asarray, pending))
        summary = finalize_metrics(agg)
        logger.info("val epoch %d: %s", epoch + 1, _fmt(summary))
        self._dump_scalars("val", epoch, summary)
        if self.is_main and self.cfgs.log.get("save_image_summary", False):
            self._save_image_summary(epoch, first_batch)
        return summary

    def _save_image_summary(self, epoch: int, batch: dict):
        """Flow visualisation of the first val sample (the reference writes
        flow images to TensorBoard, train.py:219-226; we write PNGs)."""
        if batch is None or "images" not in batch:
            return
        try:
            import cv2

            from ..utils.visualization import viz_optical_flow
            from .train_state import make_infer_step

            infer = make_infer_step(self.model_eval)
            outputs = infer(self.state.params, self.state.batch_stats, batch)
            if "flow_2d" not in outputs:
                return
            flow = np.asarray(outputs["flow_2d"][0])
            viz = viz_optical_flow(flow)
            out_dir = self.log_dir / "images"
            out_dir.mkdir(exist_ok=True)
            cv2.imwrite(
                str(out_dir / f"flow2d_epoch{epoch:03d}.png"), viz[..., ::-1]
            )
            if self.tb is not None:
                self.tb.add_image("val/flow2d", viz, epoch)
                self.tb.flush()
        except Exception as exc:  # summaries must never kill training
            logger.warning("image summary failed: %s", exc)

    def _dump_scalars(self, tag: str, epoch: int, summary: dict):
        if not self.is_main:
            return
        path = self.log_dir / "metrics.jsonl"
        with open(path, "a") as f:
            f.write(json.dumps({"tag": tag, "epoch": epoch, **summary}) + "\n")
        if self.tb is not None:
            for name, value in summary.items():
                self.tb.add_scalar(f"{tag}/{name}", float(value), epoch)
            self.tb.flush()

    def _ckpt_payload(self, epoch: int) -> dict:
        payload = {
            "params": jax.tree.map(np.asarray, self.state.params),
            "opt_state": jax.tree.map(np.asarray, self.state.opt_state),
            "last_epoch": np.asarray(epoch, np.int32),
            # the LR schedule reads optax's internal count inside opt_state;
            # state.step is saved/restored anyway so telemetry and any future
            # step-keyed logic survive resume
            "step": np.asarray(self.state.step, np.int32),
        }
        if self.state.batch_stats is not None:
            payload["batch_stats"] = jax.tree.map(np.asarray, self.state.batch_stats)
        return payload

    def save_ckpt(self, epoch: int, best: bool = False):
        if not self.is_main:
            return
        mgr = self.best_mgr if best else self.ckpt_mgr
        mgr.save(epoch, args=ocp.args.StandardSave(self._ckpt_payload(epoch)))
        # best_metrics has a data-dependent key set, which breaks structured
        # orbax restore — keep it in a sidecar json instead
        if self.best_metrics is not None:
            with open(self.log_dir / "best_metrics.json", "w") as f:
                json.dump(dict(self.best_metrics), f)

    def load_ckpt(self):
        step = self.ckpt_mgr.latest_step()
        # restore against the current state's structure so optax NamedTuple
        # optimizer states come back as NamedTuples, not plain dicts
        target = self._ckpt_payload(0)
        payload = self.ckpt_mgr.restore(step, args=ocp.args.StandardRestore(target))
        self.state = TrainState(
            params=replicate_tree(payload["params"], self.mesh),
            batch_stats=replicate_tree(payload["batch_stats"], self.mesh)
            if "batch_stats" in payload
            else None,
            opt_state=replicate_tree(payload["opt_state"], self.mesh),
            step=jnp.asarray(payload.get("step", 0), jnp.int32),
        )
        self.start_epoch = int(payload.get("last_epoch", -1)) + 1
        best_path = self.log_dir / "best_metrics.json"
        self.best_metrics = (
            json.loads(best_path.read_text()) if best_path.exists() else None
        )
        logger.info("resumed from epoch %d", self.start_epoch)


def _fmt(summary: dict) -> str:
    return " ".join(f"{k}={v:.4f}" for k, v in sorted(summary.items()))


def _device_memory_gb() -> float:
    """Peak device memory telemetry (reference utils.py:96-101 get_max_memory)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 2**30
    except Exception:
        return 0.0
