#!/usr/bin/env python
"""Evaluation entry point, covering all 7 reference eval protocols.

Usage (mirrors the reference eval scripts):
    python eval.py protocol=things testset=flyingthings3d_subset \\
        model=camliraft ckpt.path=... [save_results=true]

Protocols:
    things        eval_things.py        (generic 2D+3D metrics)
    sintel        eval_sintel.py        (per-scene 2D AEPE)
    things_noc_sf eval_things_noc_sf.py (HPLFlowNet protocol)
    things_occ_sf eval_things_occ_sf.py (FlowNet3D protocol)
    kitti_occ_sf  eval_kitti_occ_sf.py  (FlowNet3D KITTI protocol)
    kitti_noc_sf  eval_kitti_noc_sf.py  (PointPWC KITTI protocol)
"""

import sys
from pathlib import Path

from camliflow_tpu.utils.config import compose


def main():
    groups = {"testset": None, "model": None, "protocol": "things"}
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

    from camliflow_tpu.runtime.evaluator import Evaluator
    from camliflow_tpu.runtime.trainer import init_logging

    init_logging()

    protocol = groups["protocol"]
    dataset = None
    if protocol == "things_noc_sf":
        from camliflow_tpu.data.protocol_datasets import FlyingThings3DSubsetHPL

        dataset = FlyingThings3DSubsetHPL(cfgs.testset)
    elif protocol == "things_occ_sf":
        from camliflow_tpu.data.protocol_datasets import FlyingThings3DSubsetFlowNet3D

        dataset = FlyingThings3DSubsetFlowNet3D(cfgs.testset)
    elif protocol == "kitti_occ_sf":
        from camliflow_tpu.data.protocol_datasets import KITTIFlowNet3D

        dataset = KITTIFlowNet3D(n_points=int(cfgs.testset.get("n_points", 8192)))
    elif protocol == "kitti_noc_sf":
        from camliflow_tpu.data.protocol_datasets import KITTIPointPWC

        dataset = KITTIPointPWC(n_points=int(cfgs.testset.get("n_points", 8192)))

    evaluator = Evaluator(cfgs, dataset=dataset)

    if protocol == "things":
        evaluator.run_things(save_results=bool(cfgs.get("save_results", False)))
    elif protocol == "sintel":
        evaluator.run_sintel()
    elif protocol == "things_noc_sf":
        evaluator.run_sf_protocol(per_sample_average=False, use_noc_mask=False)
    elif protocol == "things_occ_sf":
        evaluator.run_sf_protocol(per_sample_average=True, use_noc_mask=True)
    elif protocol in ("kitti_occ_sf", "kitti_noc_sf"):
        evaluator.run_sf_protocol(per_sample_average=True, use_noc_mask=False)
    else:
        raise SystemExit(f"unknown protocol: {protocol}")


if __name__ == "__main__":
    main()
