#!/usr/bin/env python
"""Generate a tiny synthetic dataset in the FlyingThings3D-prep format.

Lets the full training/eval CLI run end-to-end without the real dataset:
  python tools/make_synthetic_dataset.py --out /tmp/ft3d_synth --n 8
  python train.py trainset=flyingthings3d_subset valset=flyingthings3d_subset \\
      model=camliraft_l trainset.root_dir=/tmp/ft3d_synth \\
      valset.root_dir=/tmp/ft3d_synth ...
"""

import argparse
import os
import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from camliflow_tpu.data.io import save_flow_png  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--n", type=int, default=8, help="frame pairs per split")
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=192)
    parser.add_argument("--n_points", type=int, default=1024)
    args = parser.parse_args()

    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        base = os.path.join(args.out, split)
        for sub in ("image_clean", "flow_2d", "flow_3d", "pc", "occ_mask_3d"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)

        for i in range(args.n):
            idx1 = i * 2  # consecutive pair (idx1, idx1+1)
            for j in (idx1, idx1 + 1):
                img = rng.randint(0, 255, (args.height, args.width, 3), np.uint8)
                cv2.imwrite(os.path.join(base, "image_clean", "%07d.png" % j), img)

            flow_2d = rng.randn(args.height, args.width, 2).astype(np.float32) * 3
            save_flow_png(
                os.path.join(base, "flow_2d", "%07d.png" % idx1),
                flow_2d,
                np.ones((args.height, args.width), np.float32),
            )

            pc1 = rng.randn(args.n_points, 3).astype(np.float32)
            pc1[:, 2] = np.abs(pc1[:, 2]) * 10 + 5
            pc2 = pc1 + rng.randn(args.n_points, 3).astype(np.float32) * 0.05
            np.savez(os.path.join(base, "pc", "%07d.npz" % idx1), pc1=pc1, pc2=pc2)
            np.save(
                os.path.join(base, "flow_3d", "%07d.npy" % idx1),
                (pc2 - pc1).astype(np.float32),
            )
            occ = rng.rand(args.n_points) > 0.9
            np.save(
                os.path.join(base, "occ_mask_3d", "%07d.npy" % idx1), np.packbits(occ)
            )
    print(f"wrote synthetic dataset to {args.out}")


if __name__ == "__main__":
    main()
