#!/usr/bin/env python
"""Rigid-background refinement over KITTI submission files.

Reference semantics: refine_background.py:10-40. Reads the files written by
kitti_submission.py plus semantic masks, rewrites background flow/disp_1 with
the rigid-scene reprojection. Classical geometry; runs on CPU.

Frames are independent and each one reseeds np.random(0) before its RANSAC
loops (deterministic submissions), so they parallelise across processes with
bit-identical outputs — `--workers N` (default: up to 8 cores; 1 reproduces
the reference's serial loop ordering exactly, including print order).
"""

import argparse
import os


def refine_frame(i: int, args) -> int:
    # imports inside the worker: keep the fork/spawn footprint small
    import cv2
    import numpy as np

    from camliflow_tpu.data.io import (
        load_calib,
        load_disp_png,
        load_flow_png,
        save_disp_png,
        save_flow_png,
    )
    from camliflow_tpu.postprocess import mod_flow

    np.random.seed(0)

    # cityscapes class ids <= 22 are static background (refine_background.py:14)
    bg_mask = (
        cv2.imread(
            os.path.join(
                args.dataset_dir, args.dataset_split, args.semantic_dir,
                "%06d_10.png" % i,
            ),
            0,
        )
        <= 22
    )
    K0 = load_calib(
        os.path.join(
            args.dataset_dir, args.dataset_split, "calib_cam_to_cam",
            "%06d.txt" % i,
        )
    )[0:3, 0:3]

    disp = load_disp_png(
        f"submission/{args.dataset_split}/disp_0/%06d_10.png" % i
    )[0]
    disp_c = load_disp_png(
        f"submission/{args.dataset_split}/disp_1_initial/%06d_10.png" % i
    )[0]
    flow = load_flow_png(
        f"submission/{args.dataset_split}/flow_initial/%06d_10.png" % i
    )[0]
    occ_mask = (
        cv2.imread(f"submission/{args.dataset_split}/occ/%06d_10.png" % i, 0) == 0
    )

    flow_refine, disp_c_refine = mod_flow(
        bg_mask, disp, disp_c.copy(), flow, K0, K1=K0, bl=0.54, occ_mask=occ_mask
    )
    flow_refine = np.clip(flow_refine, -500, 500)

    save_flow_png(
        f"submission/{args.dataset_split}/flow/%06d_10.png" % i, flow_refine
    )
    save_disp_png(
        f"submission/{args.dataset_split}/disp_1/%06d_10.png" % i, disp_c_refine
    )
    return i


def main(args):
    os.makedirs(f"submission/{args.dataset_split}/flow", exist_ok=True)
    os.makedirs(f"submission/{args.dataset_split}/disp_1", exist_ok=True)

    workers = args.workers or min(8, os.cpu_count() or 1)
    if workers <= 1:
        for i in range(args.n_frames):
            refine_frame(i, args)
            print(f"refined frame {i}")
        return

    from concurrent.futures import ProcessPoolExecutor, as_completed

    with ProcessPoolExecutor(max_workers=workers) as pool:
        futures = [
            pool.submit(refine_frame, i, args) for i in range(args.n_frames)
        ]
        for fut in as_completed(futures):
            print(f"refined frame {fut.result()}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", default="datasets/kitti_scene_flow")
    parser.add_argument("--dataset_split", default="testing")
    parser.add_argument("--semantic_dir", default="semantic_ddr")
    parser.add_argument("--n_frames", type=int, default=200)
    parser.add_argument(
        "--workers", type=int, default=0,
        help="process pool size (0 = auto, up to 8; 1 = serial)",
    )
    main(parser.parse_args())
