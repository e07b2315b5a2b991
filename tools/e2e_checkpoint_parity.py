#!/usr/bin/env python
"""End-to-end checkpoint parity: reference-trained weights -> our eval.

Closes the last untested seam in the parity chain: every module has
random-weight forward/grad parity tests, but nothing had ever (a) run the
checkpoint porter on a state dict that torch's *optimizer actually touched*
(Adam moments move every weight; BN running stats move off init), then
(b) asserted the full eval pipeline (dataset -> padding -> model -> metric
sums) reproduces the reference eval script's numbers.

Phases (each a subprocess so torch/jax never share a process):
  train    torch CPU: build the reference CamLiRAFT_L
           (/root/reference/models/camliraft_l.py:7-77), train N steps on
           the synthetic FT3D layout with the reference's own 4-group AdamW
           partition (factory.py:38-80), save {'state_dict': ...}.
  refeval  torch CPU: the eval_things.py:36-127 3D metric loop verbatim
           (batch of 8, NaN-masked sums, noc split) -> one JSON line.
  ourseval jax CPU: port the .pt via tools/port_checkpoint.py, run OUR
           Evaluator.run_things (runtime/evaluator.py) -> one JSON line.
  all      run the three phases, compare |delta| <= 1e-3 on every metric.

Usage:
  python tools/e2e_checkpoint_parity.py all \
      [--data /tmp/ft3d_synth4k] [--steps 12] [--workdir /tmp/e2e_ckpt]

The synthetic dataset must carry >= 4096 points (the reference core
hardcodes the [4096,2048,1024,512,256] FPS pyramid,
camliraft_l_core.py:174-176): tools/make_synthetic_dataset.py --n_points 8192 (FPS asserts
strictly n_points > 4096, wrapper.py/build_pc_pyramid).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

N_ITERS_EVAL = 8  # eval-config knob, set identically on both sides
N_POINTS = 6144


class _NS(dict):
    """Minimal DictConfig stand-in (attribute access, nested)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        return obj


def _import_reference():
    """Import the reference models package (mmdet/mmcv stubbed, same shim
    as tests/test_reference_parity.py — camliraft_l never calls into it)."""
    import logging

    import torch

    class _StubResNet(torch.nn.Module):
        feat_dim = 512

        def __init__(self, **kwargs):
            super().__init__()

        def init_weights(self):
            pass

    for name in (
        "mmdet", "mmdet.models", "mmdet.models.backbones",
        "mmcv", "mmcv.utils", "mmcv.utils.logging",
        "omegaconf",  # type-annotation-only import in the reference models
        "torchvision",  # only color_jitter touches it; aug stays disabled
        "torchvision.transforms",
    ):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["mmdet.models.backbones"].ResNet = _StubResNet
    sys.modules["mmcv.utils.logging"].get_logger = logging.getLogger
    sys.modules["mmcv.utils"].logging = sys.modules["mmcv.utils.logging"]
    sys.modules["omegaconf"].DictConfig = dict
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))


def _ref_model_cfgs():
    return _NS.wrap(
        {
            "name": "camliraft_l",
            "batch_size": 2,
            "n_iters_train": 4,
            "n_iters_eval": N_ITERS_EVAL,
            "ids": {"enabled": True},
            "loss": {"gamma": 0.8, "order": "l2-norm"},
        }
    )


def _ref_dataset(data_root: str, split: str):
    _import_reference()
    from flyingthings3d import FlyingThings3D  # noqa: E402

    cfgs = _NS.wrap(
        {
            "root_dir": os.path.join(data_root),
            "split": split,
            "pass_name": "clean",
            "n_points": N_POINTS,
            "with_pc": True,
            "with_image": False,
            "augmentation": {"enabled": False},
        }
    )
    return FlyingThings3D(cfgs)


def phase_train(data_root: str, workdir: str, steps: int):
    _import_reference()
    import numpy as np
    import torch
    from models import CamLiRAFT_L  # noqa: E402

    torch.manual_seed(0)
    model = CamLiRAFT_L(_ref_model_cfgs())
    model.train()

    # the reference 4-group partition (factory.py:38-68); camliraft_l has no
    # branch_2d so groups 2d_* are empty, matching its real training run
    p2d_d, p3d_d, p2d_nd, p3d_nd = [], [], [], []
    for name, param in model.named_parameters():
        if not param.requires_grad:
            continue
        nd = len(param.shape) == 1 or name.endswith(".bias")
        is3d = name.startswith("core.branch_3d") or not name.startswith(
            "core.branch_2d"
        )
        (p3d_nd if nd else p3d_d).append(param) if is3d else (
            p2d_nd if nd else p2d_d
        ).append(param)
    opt = torch.optim.AdamW(
        [
            {"params": p2d_d, "weight_decay": 1e-4, "lr": 1e-4},
            {"params": p3d_d, "weight_decay": 1e-4, "lr": 1e-4},
            {"params": p2d_nd, "weight_decay": 0, "lr": 1e-4},
            {"params": p3d_nd, "weight_decay": 0, "lr": 1e-4},
        ]
    )

    ds = _ref_dataset(data_root, "train")
    loader = torch.utils.data.DataLoader(ds, batch_size=2, shuffle=False)
    it = iter(loader)
    for step in range(steps):
        try:
            inputs = next(it)
        except StopIteration:
            it = iter(loader)
            inputs = next(it)
        model.forward(inputs)
        loss = model.get_loss()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=50.0)
        opt.step()
        print(f"step {step}: loss {float(loss):.4f}", flush=True)
        assert np.isfinite(float(loss))

    out = os.path.join(workdir, "ref_trained.pt")
    torch.save({"state_dict": model.state_dict()}, out)
    print(f"saved {out}", flush=True)


def phase_refeval(data_root: str, workdir: str):
    """eval_things.py:36-127 metric loop (3D half; camliraft_l has no 2D)."""
    _import_reference()
    import torch
    from models import CamLiRAFT_L  # noqa: E402

    model = CamLiRAFT_L(_ref_model_cfgs())
    ckpt = torch.load(
        os.path.join(workdir, "ref_trained.pt"),
        map_location="cpu",
        weights_only=True,
    )
    model.load_state_dict(ckpt["state_dict"], strict=True)
    model.eval()

    ds = _ref_dataset(data_root, "val")
    loader = torch.utils.data.DataLoader(ds, batch_size=2, shuffle=False)
    m3d = {"counts": 0, "EPE3d": 0.0, "5cm": 0.0, "10cm": 0.0}
    m3d_noc = {"counts": 0, "EPE3d": 0.0, "5cm": 0.0, "10cm": 0.0}
    with torch.no_grad():
        for inputs in loader:
            outputs = model.forward(inputs)
            for b in range(inputs["pcs"].shape[0]):
                pred = outputs["flow_3d"][b]
                target = inputs["flow_3d"][b]
                if target.shape[0] > 3:
                    mask = target[3] > 0
                    target = target[:3]
                else:
                    mask = torch.ones(target.shape[1], dtype=torch.bool)
                epe = torch.sqrt(torch.sum((pred - target) ** 2, dim=0))
                mask = torch.logical_and(mask, torch.logical_not(torch.isnan(epe)))
                m3d["counts"] += int(epe[mask].shape[0])
                m3d["EPE3d"] += float(epe[mask].sum())
                m3d["5cm"] += int(torch.count_nonzero(epe[mask] < 0.05))
                m3d["10cm"] += int(torch.count_nonzero(epe[mask] < 0.1))
                occ = inputs["occ_mask_3d"][b]
                noc = epe[torch.logical_and(occ == 0, mask)]
                m3d_noc["counts"] += int(noc.shape[0])
                m3d_noc["EPE3d"] += float(noc.sum())
                m3d_noc["5cm"] += int(torch.count_nonzero(noc < 0.05))
                m3d_noc["10cm"] += int(torch.count_nonzero(noc < 0.1))
    res = {
        "EPE3d": m3d["EPE3d"] / m3d["counts"],
        "5cm": m3d["5cm"] / m3d["counts"],
        "10cm": m3d["10cm"] / m3d["counts"],
        "EPE3d_noc": m3d_noc["EPE3d"] / m3d_noc["counts"],
    }
    print("REFEVAL " + json.dumps(res), flush=True)


def phase_ourseval(data_root: str, workdir: str):
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tools"))
    import numpy as np
    import torch

    from camliflow_tpu.utils.config import Config, load_yaml
    from port_checkpoint import port_state_dict

    model_cfg = Config(load_yaml(str(REPO / "conf/model/camliraft_l.yaml"))["model"])
    model_cfg["n_iters_eval"] = N_ITERS_EVAL
    model_cfg["n_samples_list"] = [4096, 2048, 1024, 512, 256]
    cfgs = Config(
        {
            "model": model_cfg.to_dict(),
            "testset": {
                "name": "flyingthings3d",
                "root_dir": data_root,
                "split": "val",
                "pass_name": "clean",
                "n_points": N_POINTS,
                "with_pc": True,
                "with_image": False,
                "n_workers": 0,
                "augmentation": {"enabled": False},
            },
            "ckpt": {"path": ""},
            "log": {"dir": os.path.join(workdir, "ourseval_log")},
        }
    )

    from camliflow_tpu.models.factory import model_factory

    spec = model_factory(cfgs.model)
    model = spec.module_cls(cfgs=cfgs.model.to_dict(), train_mode=False)
    ds_probe_batch = _probe_batch()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ds_probe_batch)

    ckpt = torch.load(
        os.path.join(workdir, "ref_trained.pt"),
        map_location="cpu",
        weights_only=True,
    )
    state_dict = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    variables, missing, unused = port_state_dict(
        state_dict, "camliraft_l", variables
    )
    assert not missing, f"unported: {missing[:10]}"
    assert not unused, f"unused torch keys: {unused[:10]}"

    from camliflow_tpu.runtime.evaluator import Evaluator

    ev = Evaluator(cfgs, variables=variables, batch_size=2, num_shards=1, shard_index=0)
    res = ev.run_things()
    out = {k: float(res[k]) for k in ("EPE3d", "5cm", "10cm", "EPE3d_noc")}
    print("OURSEVAL " + json.dumps(out), flush=True)


def _probe_batch():
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    pc1 = rng.randn(1, N_POINTS, 3).astype(np.float32)
    return {
        "pcs": jnp.asarray(
            np.concatenate([pc1, pc1 + 0.01], axis=-1)
        ),
        "intrinsics": jnp.asarray(
            np.tile([1050.0, 479.5, 269.5], (1, 1)).astype(np.float32)
        ),
    }


def phase_all(data_root: str, workdir: str, steps: int):
    os.makedirs(workdir, exist_ok=True)
    me = os.path.abspath(__file__)

    def run(phase):
        r = subprocess.run(
            [sys.executable, me, phase, "--data", data_root,
             "--workdir", workdir, "--steps", str(steps)],
            capture_output=True, text=True, timeout=14400,
        )
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            raise SystemExit(f"phase {phase} failed rc={r.returncode}")
        return r.stdout

    run("train")
    ref = json.loads(
        [l for l in run("refeval").splitlines() if l.startswith("REFEVAL ")][-1]
        [len("REFEVAL "):]
    )
    ours = json.loads(
        [l for l in run("ourseval").splitlines() if l.startswith("OURSEVAL ")][-1]
        [len("OURSEVAL "):]
    )
    print(f"reference: {ref}")
    print(f"ours:      {ours}")
    worst = 0.0
    for k in ("EPE3d", "5cm", "10cm", "EPE3d_noc"):
        delta = abs(ref[k] - ours[k])
        worst = max(worst, delta)
        status = "OK" if delta <= 1e-3 else "FAIL"
        print(f"{k}: ref {ref[k]:.6f} ours {ours[k]:.6f} |d| {delta:.2e} {status}")
    print(f"WORST |delta| = {worst:.2e} ({'PASS' if worst <= 1e-3 else 'FAIL'})")
    raise SystemExit(0 if worst <= 1e-3 else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["train", "refeval", "ourseval", "all"])
    ap.add_argument("--data", default="/tmp/ft3d_synth8k")
    ap.add_argument("--workdir", default="/tmp/e2e_ckpt")
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    if args.phase == "train":
        phase_train(args.data, args.workdir, args.steps)
    elif args.phase == "refeval":
        phase_refeval(args.data, args.workdir)
    elif args.phase == "ourseval":
        phase_ourseval(args.data, args.workdir)
    else:
        phase_all(args.data, args.workdir, args.steps)


if __name__ == "__main__":
    main()
