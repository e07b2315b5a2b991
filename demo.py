#!/usr/bin/env python
"""Demo: run a model on one image pair + stereo disparities.

Reference semantics: demo.py:17-173 — loads image pair + PFM disparities,
lifts them to point clouds (depth < max_depth, 8192 points), runs the model
and writes visualisations. Since this environment is headless we save the
HSV flow visualisation and the warped cloud to files instead of opening
windows.

Usage:
    python demo.py --model camliraft --weights ckpt.npz \\
        --image1 asserts/demo_image1.png --image2 asserts/demo_image2.png \\
        --disp1 asserts/demo_disp1.pfm --disp2 asserts/demo_disp2.pfm
"""

import argparse
import os

import cv2
import numpy as np


from camliflow_tpu.utils.visualization import viz_optical_flow  # noqa: E402


def main(args):
    from camliflow_tpu.data.io import disp2pc, load_pfm
    from camliflow_tpu.models.factory import model_factory
    from camliflow_tpu.utils.config import load_yaml

    import jax
    import jax.numpy as jnp

    image1 = cv2.imread(args.image1)[..., ::-1]
    image2 = cv2.imread(args.image2)[..., ::-1]
    disp1 = -load_pfm(args.disp1)
    disp2 = -load_pfm(args.disp2)

    pc1 = disp2pc(disp1, args.baseline, args.f, args.cx, args.cy)
    pc2 = disp2pc(disp2, args.baseline, args.f, args.cx, args.cy)

    mask1 = pc1[..., -1] < args.max_depth
    mask2 = pc2[..., -1] < args.max_depth
    pc1, pc2 = pc1[mask1], pc2[mask2]
    pc1 = pc1[~np.isnan(np.sum(pc1, axis=-1))]
    pc2 = pc2[~np.isnan(np.sum(pc2, axis=-1))]

    np.random.seed(0)
    idx1 = np.random.choice(pc1.shape[0], size=min(args.n_points, pc1.shape[0]), replace=False)
    idx2 = np.random.choice(pc2.shape[0], size=min(args.n_points, pc2.shape[0]), replace=False)
    pc1, pc2 = pc1[idx1], pc2[idx2]

    cfgs = load_yaml(os.path.join("conf", "model", f"{args.model}.yaml"))["model"]
    spec = model_factory(cfgs)
    model = spec.module_cls(cfgs=cfgs.to_dict(), train_mode=False)

    inputs = {
        "images": jnp.asarray(
            np.concatenate([image1, image2], axis=-1).astype(np.float32)
        )[None],
        "pcs": jnp.asarray(
            np.concatenate([pc1, pc2], axis=1).astype(np.float32)
        )[None],
        "intrinsics": jnp.asarray(
            np.float32([args.f, args.cx, args.cy])
        )[None],
    }

    if args.weights:
        from camliflow_tpu.runtime.checkpoint import restore_variables

        variables = restore_variables(args.weights)
    else:
        print("WARNING: no --weights given, using random init")
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)

    outputs = jax.jit(model.apply)(variables, inputs)
    os.makedirs(args.out_dir, exist_ok=True)

    if "flow_2d" in outputs:
        flow_2d = np.asarray(outputs["flow_2d"][0])
        viz = viz_optical_flow(flow_2d)
        stack = np.concatenate([image1, image2, viz], axis=0)
        cv2.imwrite(os.path.join(args.out_dir, "flow_2d.png"), stack[..., ::-1])
        print(f"wrote {args.out_dir}/flow_2d.png  "
              f"(|flow| max {np.abs(flow_2d).max():.1f} px)")
    if "flow_3d" in outputs:
        flow_3d = np.asarray(outputs["flow_3d"][0])
        np.savez(
            os.path.join(args.out_dir, "flow_3d.npz"),
            pc1=pc1, pc2=pc2, flow_3d=flow_3d,
        )
        print(f"wrote {args.out_dir}/flow_3d.npz  "
              f"(|flow| max {np.abs(flow_3d).max():.2f} m)")
        if args.show:
            _show_clouds(pc1, pc2, flow_3d)


def _show_clouds(pc1, pc2, flow_3d):
    """Interactive scene-flow view (reference demo.py:117-128): pc1 red,
    pc2 green, pc1+flow blue. Requires open3d (not in this image — the
    headless npz above carries the same data); degrades to a message."""
    try:
        import open3d
    except ImportError:
        print("open3d not installed: skipping interactive view "
              "(flow_3d.npz holds pc1/pc2/flow_3d for offline viewing)")
        return
    clouds = []
    for pts, color in (
        (pc1, [1, 0, 0]), (pc2, [0, 1, 0]), (pc1 + flow_3d, [0, 0, 1])
    ):
        cloud = open3d.geometry.PointCloud()
        cloud.points = open3d.utility.Vector3dVector(pts.astype(np.float64))
        cloud.colors = open3d.utility.Vector3dVector(
            np.zeros_like(pts, np.float64) + color
        )
        clouds.append(cloud)
    open3d.visualization.draw_geometries(clouds)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="camliraft")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--image1", default="asserts/demo_image1.png")
    parser.add_argument("--image2", default="asserts/demo_image2.png")
    parser.add_argument("--disp1", default="asserts/demo_disp1.pfm")
    parser.add_argument("--disp2", default="asserts/demo_disp2.pfm")
    parser.add_argument("--out_dir", default="outputs/demo")
    parser.add_argument("--n_points", type=int, default=8192)
    parser.add_argument("--max_depth", type=float, default=35.0)
    parser.add_argument("--baseline", type=float, default=1.0)
    parser.add_argument("--f", type=float, default=1050.0)
    parser.add_argument("--cx", type=float, default=479.5)
    parser.add_argument("--cy", type=float, default=269.5)
    parser.add_argument(
        "--show", action="store_true",
        help="interactive open3d scene-flow view (reference demo.py:117-128)",
    )
    main(parser.parse_args())
