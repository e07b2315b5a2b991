#!/usr/bin/env python
"""Generate a tiny synthetic KITTI-scene-flow-format testing split.

Lets kitti_submission.py / refine_background.py run end-to-end without the
real dataset. Writes calib_cam_to_cam, image_2 (both frames), disp_<provider>
PNGs and semantic masks for `--n` frames.
"""

import argparse
import os
import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from camliflow_tpu.data.io import save_disp_png  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--n", type=int, default=2)
    parser.add_argument("--height", type=int, default=120)
    parser.add_argument("--width", type=int, default=184)
    parser.add_argument("--provider", default="ganet")
    args = parser.parse_args()

    rng = np.random.RandomState(0)
    base = os.path.join(args.out, "testing")
    for sub in ("calib_cam_to_cam", "image_2", f"disp_{args.provider}",
                "semantic_ddr"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    h, w = args.height, args.width
    f, cx, cy = 100.0, (w - 1) / 2, (h - 1) / 2
    for i in range(args.n):
        proj = np.zeros((3, 4), np.float32)
        proj[0, 0] = proj[1, 1] = f
        proj[0, 2], proj[1, 2], proj[2, 2] = cx, cy, 1.0
        with open(os.path.join(base, "calib_cam_to_cam", "%06d.txt" % i), "w") as fd:
            fd.write("P_rect_02: " + " ".join(str(v) for v in proj.reshape(-1)) + "\n")

        for suffix in ("10", "11"):
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(
                os.path.join(base, "image_2", "%06d_%s.png" % (i, suffix)), img
            )
            # smooth positive disparity field (plane-ish scene)
            yy = np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w))
            disp = 8.0 + 6.0 * yy / h + rng.rand(h, w).astype(np.float32)
            save_disp_png(
                os.path.join(base, f"disp_{args.provider}", "%06d_%s.png" % (i, suffix)),
                disp,
            )

        # semantic mask: everything background (class 7 = road)
        cv2.imwrite(
            os.path.join(base, "semantic_ddr", "%06d_10.png" % i),
            np.full((h, w), 7, np.uint8),
        )
    print(f"wrote synthetic KITTI testing split to {base}")


if __name__ == "__main__":
    main()
