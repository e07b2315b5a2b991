"""Trainer integration test: 2 epochs + resume on a synthetic dataset,
checkpoints finalized, metrics written. Runs on the 8-device CPU mesh.

(Also driven live on TPU via the verify skill — this pins the behaviour in CI.)
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from camliflow_tpu.utils.config import Config

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ft3d")
    subprocess.check_call(
        [sys.executable, str(REPO / "tools/make_synthetic_dataset.py"),
         "--out", str(root), "--n", "8", "--n_points", "512",
         "--height", "64", "--width", "96"]
    )
    return root


def make_cfgs(root, log_dir, epochs=2, resume=False):
    return Config(
        {
            "log": {"dir": str(log_dir), "val_interval": 1, "print_interval": 1},
            "ckpt": {"path": None, "resume": resume, "max_to_keep": 3},
            "seed": 0,
            "model": {
                "name": "camliraft_l",
                "batch_size": 8,
                "n_iters_train": 1,
                "n_iters_eval": 1,
                "ids": {"enabled": False},
                "loss": {"gamma": 0.8, "order": "l2-norm"},
                "n_samples_list": [128, 64, 32, 16],
            },
            "trainset": {
                "name": "flyingthings3d",
                "root_dir": str(root),
                "split": "train",
                "n_workers": 0,
                "n_points": 256,
                "pass_name": "clean",
                "with_pc": True,
                "with_image": False,
                "augmentation": {
                    "enabled": False,
                    "color_jitter": {"enabled": False},
                    "random_horizontal_flip": {"enabled": False},
                    "random_vertical_flip": {"enabled": False},
                    "random_crop": {"enabled": False},
                    "random_scale": {"enabled": False},
                },
            },
            "valset": {
                "name": "flyingthings3d",
                "root_dir": str(root),
                "split": "val",
                "n_workers": 0,
                "n_points": 256,
                "pass_name": "clean",
                "with_pc": True,
                "with_image": False,
                "augmentation": {"enabled": False},
            },
            "training": {
                "opt": "adamw",
                "weight_decay": 1e-6,
                "grad_max_norm": 1,
                "epochs": epochs,
                "lr": 1e-3,
                "warmup_epochs": 0,
                "min_lr": 0.0,
            },
        }
    )


@pytest.mark.slow
def test_train_checkpoints_and_resume(synth_root, tmp_path):
    from camliflow_tpu.runtime.trainer import Trainer

    log_dir = tmp_path / "run"
    trainer = Trainer(make_cfgs(synth_root, log_dir, epochs=2))
    trainer.run()

    # finalized epoch + best checkpoints (no .orbax-checkpoint-tmp leftovers)
    steps = sorted(p.name for p in (log_dir / "ckpts").iterdir())
    assert "0" in steps and "1" in steps
    assert not any("tmp" in s for s in steps)
    assert (log_dir / "ckpts_best").exists()

    lines = [json.loads(l) for l in (log_dir / "metrics.jsonl").read_text().splitlines()]
    tags = {(l["tag"], l["epoch"]) for l in lines}
    assert ("train", 0) in tags and ("val", 1) in tags
    assert all(np.isfinite(l["epe3d"]) for l in lines)

    # resume continues from epoch 2
    trainer2 = Trainer(make_cfgs(synth_root, log_dir, epochs=3, resume=True))
    assert trainer2.start_epoch == 2
    trainer2.run()
    steps = sorted(p.name for p in (log_dir / "ckpts").iterdir())
    assert "2" in steps


def test_eval_restores_trainer_checkpoint(synth_root, tmp_path):
    """restore_variables must read CheckpointManager step dirs and reproduce
    the trainer's validation metrics."""
    from camliflow_tpu.runtime.checkpoint import restore_variables
    from camliflow_tpu.runtime.evaluator import Evaluator
    from camliflow_tpu.data.datasets import FlyingThings3D

    log_dir = tmp_path / "run2"
    cfgs = make_cfgs(synth_root, log_dir, epochs=1)
    from camliflow_tpu.runtime.trainer import Trainer

    trainer = Trainer(cfgs)
    trainer.run()

    variables = restore_variables(log_dir / "ckpts" / "0")
    assert "params" in variables and "batch_stats" in variables

    eval_cfgs = Config(
        {"model": cfgs.model, "testset": cfgs.valset, "ckpt": {"path": None}}
    )
    dataset = FlyingThings3D(cfgs.valset)
    ev = Evaluator(eval_cfgs, variables=variables, batch_size=4, dataset=dataset)
    results = ev.run_things()
    # matches the trainer's last validation EPE3d
    val_lines = [
        json.loads(l)
        for l in (log_dir / "metrics.jsonl").read_text().splitlines()
        if json.loads(l)["tag"] == "val"
    ]
    assert abs(results["EPE3d"] - val_lines[-1]["epe3d"]) < 1e-3
