"""KITTI scene-flow submission writer.

Reference semantics: kitti_submission.py:43-107 — per frame writes:
  disp_0          the input disparity, copied
  flow_initial    the clipped predicted optical flow (16-bit PNG)
  disp_1_initial  densified warped disparity: knn-interpolate the sparse 3D
                  flow onto the full disp-lifted cloud and reproject
  occ             coarse occlusion mask from out-of-frame warp

The knn densification runs on device (jitted); file IO stays on host.
"""

from __future__ import annotations

import logging
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data import io
from ..data.datasets import KITTITest
from ..data.loader import DataLoader
from ..models.factory import model_factory
from ..ops.geometry import knn_interpolation
from .train_state import make_infer_step

logger = logging.getLogger("camliflow_tpu")


@jax.jit
def _densify(pc1, flow_3d, pc1_dense):
    """[N,3],[N,3],[M,3] -> [M,3] interpolated flow."""
    return knn_interpolation(pc1[None], flow_3d[None], pc1_dense[None])[0]


class SubmissionWriter:
    def __init__(self, cfgs, variables=None):
        self.cfgs = cfgs
        self.spec = model_factory(cfgs.model)
        self.model = self.spec.module_cls(cfgs=cfgs.model.to_dict(), train_mode=False)
        self.infer_step = make_infer_step(self.model)
        self.dataset = KITTITest(cfgs.testset)
        self.loader = DataLoader(
            self.dataset,
            batch_size=int(cfgs.model.get("batch_size", 8)),
            shuffle=False,
            num_workers=int(cfgs.testset.get("n_workers", 4)),
            drop_last=False,
        )
        if variables is not None:
            self.variables = variables
        else:
            from .checkpoint import restore_variables

            self.variables = restore_variables(cfgs.ckpt.path)

    def run(self, out_root: str = "submission"):
        split = self.cfgs.testset.split
        out_dir = os.path.join(
            out_root, "training" if "training" in split else "testing"
        )
        for sub in ("disp_0", "flow_initial", "disp_1_initial", "occ"):
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

        def forward_device(batch):
            arrays = {
                k: jnp.asarray(v)
                for k, v in batch.items()
                if isinstance(v, np.ndarray) and k not in ("index", "input_h", "input_w")
            }
            return self.infer_step(
                self.variables["params"], self.variables.get("batch_stats"), arrays
            )

        def batches():
            # one-batch lookahead: the next forward is enqueued before this
            # batch's outputs are fetched, so the per-frame PNG encoding
            # below overlaps device compute (same pipelining as Evaluator)
            pending = None
            for batch in self.loader:
                out = forward_device(batch)
                if pending is not None:
                    yield pending[0], jax.tree.map(np.asarray, pending[1])
                pending = (batch, out)
            if pending is not None:
                yield pending[0], jax.tree.map(np.asarray, pending[1])

        for batch, outputs in batches():
            for b in range(len(batch["index"])):
                test_id = int(batch["index"][b])
                input_h = int(batch["input_h"][b])
                input_w = int(batch["input_w"][b])
                f, cx, cy = (float(v) for v in batch["intrinsics"][b])

                provider = self.cfgs.testset.disp_provider
                disp_sub = "disp_occ_0" if provider == "kitti" else f"disp_{provider}"
                disp1 = io.load_disp_png(
                    os.path.join(
                        self.dataset.root_dir, disp_sub, "%06d_10.png" % test_id
                    )
                )[0]
                io.save_disp_png(
                    os.path.join(out_dir, "disp_0", "%06d_10.png" % test_id), disp1
                )

                flow_2d = np.clip(outputs["flow_2d"][b], -500, 500)
                flow_2d = flow_2d[:input_h, :input_w]
                io.save_flow_png(
                    os.path.join(out_dir, "flow_initial", "%06d_10.png" % test_id),
                    flow_2d,
                )

                # densification (kitti_submission.py:90-98)
                pc1_dense = io.disp2pc(disp1, baseline=0.54, f=f, cx=cx, cy=cy)
                pc1_dense_flat = pc1_dense.reshape(-1, 3).astype(np.float32)
                pc1 = batch["pcs"][b][:, :3]
                flow_3d_dense = np.asarray(
                    _densify(
                        jnp.asarray(pc1),
                        jnp.asarray(outputs["flow_3d"][b]),
                        jnp.asarray(pc1_dense_flat),
                    )
                )
                warp_z = (pc1_dense_flat + flow_3d_dense)[:, 2].reshape(
                    input_h, input_w
                )
                disp_c = 0.54 * f / warp_z
                disp_c[disp1 < 0] = -1.0
                io.save_disp_png(
                    os.path.join(out_dir, "disp_1_initial", "%06d_10.png" % test_id),
                    disp_c,
                )

                # coarse occlusion mask (kitti_submission.py:101-107)
                xs = np.tile(np.arange(input_w, dtype=np.float32), (input_h, 1))
                ys = np.tile(
                    np.arange(input_h, dtype=np.float32)[:, None], (1, input_w)
                )
                warp_x = xs + flow_2d[..., 0]
                warp_y = ys + flow_2d[..., 1]
                occ = np.logical_or(
                    np.logical_or(warp_x < 0, warp_x > input_w),
                    np.logical_or(warp_y < 0, warp_y > input_h),
                ).astype(np.uint8) * 255
                cv2.imwrite(
                    os.path.join(out_dir, "occ", "%06d_10.png" % test_id), occ
                )
            logger.info("wrote frames up to %d", test_id)
