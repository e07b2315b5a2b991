#!/usr/bin/env python
"""KITTI scene-flow submission entry point.

Usage (mirrors reference kitti_submission.py):
    python kitti_submission.py testset=kitti model=camliraft ckpt.path=...
"""

import sys
from pathlib import Path

from camliflow_tpu.utils.config import compose


def main():
    groups = {"testset": "kitti", "model": None}
    overrides = []
    for arg in sys.argv[1:]:
        key, _, value = arg.partition("=")
        if key in groups:
            groups[key] = value
        else:
            overrides.append(arg)
    if groups["model"] is None:
        raise SystemExit("missing required group: model=<name>")

    cfgs = compose(
        Path(__file__).parent / "conf",
        testset=groups["testset"],
        model=groups["model"],
        base="evaluator.yaml",
        overrides=overrides,
    )

    from camliflow_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from camliflow_tpu.runtime.submission import SubmissionWriter
    from camliflow_tpu.runtime.trainer import init_logging

    init_logging()
    SubmissionWriter(cfgs).run()


if __name__ == "__main__":
    main()
