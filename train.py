#!/usr/bin/env python
"""Training entry point.

Usage (mirrors the reference CLI, train.py:256-307):
    python train.py trainset=flyingthings3d_subset valset=flyingthings3d_subset \\
        model=camliraft [log.dir=outputs/run] [any.dotted.key=value ...]

The reference's mp.spawn / NCCL / port plumbing disappears: one process per
host; multi-host runs call jax.distributed.initialize() automatically when
the cluster env is present.
"""

import sys
from pathlib import Path

from camliflow_tpu.utils.config import compose


def parse_cli(argv):
    groups = {"trainset": None, "valset": None, "model": None}
    overrides = []
    for arg in argv:
        key, _, value = arg.partition("=")
        if key in groups:
            groups[key] = value
        else:
            overrides.append(arg)
    return groups, overrides


def main():
    groups, overrides = parse_cli(sys.argv[1:])
    for k in ("trainset", "valset", "model"):
        if groups[k] is None:
            raise SystemExit(f"missing required group: {k}=<name>")

    cfgs = compose(
        Path(__file__).parent / "conf",
        trainset=groups["trainset"],
        valset=groups["valset"],
        model=groups["model"],
        base="trainer.yaml",
        overrides=overrides,
    )

    # divide the batch by accum_iter (reference train.py:297-298)
    accum = int(cfgs.training.get("accum_iter", 1))
    if accum > 1:
        cfgs.model.batch_size = cfgs.model.batch_size // accum

    from camliflow_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from camliflow_tpu.runtime.trainer import Trainer

    Trainer(cfgs).run()


if __name__ == "__main__":
    main()
