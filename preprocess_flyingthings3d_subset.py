#!/usr/bin/env python
"""Preprocess the FlyingThings3D subset into the training format.

Reference semantics: preprocess_flyingthings3d_subset.py:50-206 — lifts
disparity/disparity-change + .flo flow + occlusion PNGs into point-cloud
pairs, with two modes:
  default                 keep occluded points (FlowNet3D protocol)
  --remove_occluded_points drop them (HPLFlowNet protocol)
plus depth<max_depth and NaN filtering, random downsampling to n_points, and
16-bit PNG flow export. Runs a thread pool instead of a torch DataLoader.

Expected input layout (download the "FlyingThings3D subset"):
  <input_dir>/{train,val}/{disparity,disparity_change,disparity_occlusions,
                           flow,flow_occlusions,image_clean}
"""

import argparse
import os
import shutil
from concurrent.futures import ThreadPoolExecutor

import cv2
import numpy as np

from camliflow_tpu.data.io import disp2pc, load_flow, load_pfm, save_flow_png


def process_one(
    input_dir, output_dir, split, index1, n_points, max_depth, remove_occluded_points
):
    np.random.seed(0)
    index2 = index1 + 1
    baseline, f, cx, cy = 1.0, 1050.0, 479.5, 269.5

    disp1 = -load_pfm(
        os.path.join(input_dir, split, "disparity", "left", "%07d.pfm" % index1)
    )
    disp2 = -load_pfm(
        os.path.join(input_dir, split, "disparity", "left", "%07d.pfm" % index2)
    )
    disp1_change = -load_pfm(
        os.path.join(
            input_dir, split, "disparity_change", "left", "into_future",
            "%07d.pfm" % index1,
        )
    )
    flow_2d = load_flow(
        os.path.join(input_dir, split, "flow", "left", "into_future", "%07d.flo" % index1)
    )
    occ_mask_2d = cv2.imread(
        os.path.join(
            input_dir, split, "flow_occlusions", "left", "into_future",
            "%07d.png" % index1,
        )
    )
    occ_mask_2d = occ_mask_2d[..., 0] > 1

    if remove_occluded_points:
        pc1 = disp2pc(disp1, baseline, f, cx, cy)
        pc2 = disp2pc(disp1 + disp1_change, baseline, f, cx, cy, flow_2d)
        noc = np.logical_not(occ_mask_2d)
        pc1, pc2 = pc1[noc], pc2[noc]
        mask = np.logical_and(pc1[..., -1] < max_depth, pc2[..., -1] < max_depth)
        pc1, pc2 = pc1[mask], pc2[mask]
        mask = ~np.isnan(np.sum(pc1, -1) + np.sum(pc2, -1))
        pc1, pc2 = pc1[mask], pc2[mask]
        flow_3d = pc2 - pc1
        occ_mask_3d = np.zeros(len(pc1), dtype=bool)
    else:
        pc1 = disp2pc(disp1, baseline, f, cx, cy)
        pc2 = disp2pc(disp2, baseline, f, cx, cy)
        flow_3d = disp2pc(disp1 + disp1_change, baseline, f, cx, cy, flow_2d) - pc1
        mask1 = pc1[..., -1] < max_depth
        mask2 = pc2[..., -1] < max_depth
        pc1, pc2 = pc1[mask1], pc2[mask2]
        flow_3d, occ_mask_3d = flow_3d[mask1], occ_mask_2d[mask1]
        mask1 = ~np.isnan(np.sum(pc1, -1) + np.sum(flow_3d, -1))
        mask2 = ~np.isnan(np.sum(pc2, -1))
        pc1, flow_3d, occ_mask_3d = pc1[mask1], flow_3d[mask1], occ_mask_3d[mask1]
        pc2 = pc2[mask2]

    idx1 = np.random.choice(pc1.shape[0], size=min(n_points, pc1.shape[0]), replace=False)
    idx2 = np.random.choice(pc2.shape[0], size=min(n_points, pc2.shape[0]), replace=False)
    pc1, pc2 = pc1[idx1], pc2[idx2]
    flow_3d, occ_mask_3d = flow_3d[idx1], occ_mask_3d[idx1]

    np.savez(
        os.path.join(output_dir, split, "pc", "%07d.npz" % index1), pc1=pc1, pc2=pc2
    )
    np.save(
        os.path.join(output_dir, split, "occ_mask_3d", "%07d.npy" % index1),
        np.packbits(occ_mask_3d),
    )

    flow_mask = np.logical_and(
        np.abs(flow_2d[..., 0]) < 500, np.abs(flow_2d[..., 1]) < 500
    )
    flow_2d = flow_2d.copy()
    flow_2d[np.logical_not(flow_mask)] = 0.0
    save_flow_png(
        os.path.join(output_dir, split, "flow_2d", "%07d.png" % index1),
        flow_2d, flow_mask,
    )
    np.save(os.path.join(output_dir, split, "flow_3d", "%07d.npy" % index1), flow_3d)


def main(args):
    n_points = args.n_points
    for split_idx, split in enumerate(["train", "val"]):
        if not os.path.exists(os.path.join(args.input_dir, split)):
            continue
        print(f'Processing "{split}" split...')
        for sub in ("pc", "flow_2d", "flow_3d", "occ_mask_3d"):
            os.makedirs(os.path.join(args.output_dir, split, sub), exist_ok=True)

        if not os.path.exists(os.path.join(args.output_dir, split, "image_clean")):
            print("Copying images...")
            shutil.copytree(
                src=os.path.join(args.input_dir, split, "image_clean", "left"),
                dst=os.path.join(args.output_dir, split, "image_clean"),
            )
        if not os.path.exists(os.path.join(args.output_dir, split, "occ_mask_2d")):
            print("Copying occ_mask_2d...")
            shutil.copytree(
                src=os.path.join(
                    args.input_dir, split, "flow_occlusions", "left", "into_future"
                ),
                dst=os.path.join(args.output_dir, split, "occ_mask_2d"),
            )

        indices = sorted(
            int(fn.split(".")[0])
            for fn in os.listdir(
                os.path.join(args.input_dir, split, "flow", "left", "into_future")
            )
        )
        print(f"Generating point clouds for {len(indices)} frames...")
        with ThreadPoolExecutor(args.n_workers) as pool:
            list(
                pool.map(
                    lambda idx: process_one(
                        args.input_dir, args.output_dir, split, idx,
                        n_points[split_idx], args.max_depth,
                        args.remove_occluded_points,
                    ),
                    indices,
                )
            )
    print("All done.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", default="datasets/flyingthings3d_subset_prep")
    parser.add_argument("--n_points", nargs=2, type=int, default=[32768, 8192])
    parser.add_argument("--max_depth", type=float, default=35.0)
    parser.add_argument("--remove_occluded_points", action="store_true")
    parser.add_argument("--n_workers", type=int, default=8)
    main(parser.parse_args())
