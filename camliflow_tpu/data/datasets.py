"""Dataset pipelines (host-side NumPy, channel-last outputs).

Reference semantics: flyingthings3d.py, kitti.py, sintel.py. Outputs differ
from the reference only in layout — channel-last everywhere:
  images  [H, W, 6]   (frame1 | frame2, RGB uint8-as-float)
  flow_2d [H, W, 2|3] (u, v, optional validity)
  pcs     [N, 6]      (pc1 | pc2)
  flow_3d [N, 3|4]
  occ_mask_3d [N]
  intrinsics [3] = (f, cx, cy)
Fixed n_points sampling keeps all shapes static for XLA.
"""

from __future__ import annotations

import glob
import os

import cv2
import numpy as np

from . import io
from .augmentation import joint_augmentation


class FlyingThings3D:
    """Preprocessed FlyingThings3D subset (flyingthings3d.py:9-91)."""

    def __init__(self, cfgs):
        assert os.path.isdir(cfgs.root_dir), cfgs.root_dir
        self.root_dir = str(cfgs.root_dir)
        self.split = str(cfgs.split)
        self.split_dir = os.path.join(self.root_dir, self.split)
        self.cfgs = cfgs
        self.indices = sorted(
            int(fn.split(".")[0])
            for fn in os.listdir(os.path.join(self.split_dir, "flow_2d"))
        )

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        # deterministic sampling when augmentation is off (flyingthings3d.py:27-28)
        rng = (
            np.random.RandomState(0)
            if not self.cfgs.augmentation.enabled
            else np.random
        )

        idx1 = self.indices[i]
        idx2 = idx1 + 1
        data = {"index": idx1}
        f, cx, cy = 1050.0, 479.5, 269.5

        if self.cfgs.pass_name == "cleanfinal" and self.cfgs.augmentation.enabled:
            pass_name = "clean" if rng.randint(2) == 0 else "final"
        else:
            pass_name = self.cfgs.pass_name

        image1 = cv2.imread(
            os.path.join(self.split_dir, f"image_{pass_name}", "%07d.png" % idx1)
        )[..., ::-1]
        image2 = cv2.imread(
            os.path.join(self.split_dir, f"image_{pass_name}", "%07d.png" % idx2)
        )[..., ::-1]
        flow_2d, flow_mask_2d = io.load_flow_png(
            os.path.join(self.split_dir, "flow_2d", "%07d.png" % idx1)
        )

        pc_dict = np.load(os.path.join(self.split_dir, "pc", "%07d.npz" % idx1))
        flow_3d = np.load(os.path.join(self.split_dir, "flow_3d", "%07d.npy" % idx1))
        pc1, pc2 = pc_dict["pc1"], pc_dict["pc2"]

        occ_path = os.path.join(self.split_dir, "occ_mask_3d")
        if os.path.exists(occ_path):
            occ_mask_3d = np.load(os.path.join(occ_path, "%07d.npy" % idx1))
            occ_mask_3d = np.unpackbits(occ_mask_3d, count=len(pc1))
        else:
            occ_mask_3d = np.zeros(len(pc1), dtype=bool)

        # ignore fast-moving objects (flyingthings3d.py:60)
        flow_mask_2d = np.logical_and(
            flow_mask_2d, np.linalg.norm(flow_2d, axis=-1) < 250.0
        )
        flow_2d = np.concatenate(
            [flow_2d, flow_mask_2d[..., None].astype(np.float32)], axis=2
        )

        # augmentation with retry-on-empty-crop (flyingthings3d.py:64-72)
        while True:
            try:
                results = joint_augmentation(
                    image1, image2, pc1, pc2, flow_2d, flow_3d, f, cx, cy,
                    self.cfgs.augmentation,
                )
            except AssertionError:
                continue
            image1, image2, pc1, pc2, flow_2d, flow_3d, f, cx, cy = results
            break

        n_points = self.cfgs.n_points
        if self.cfgs.augmentation.enabled or pc1.shape[0] != n_points:
            idxs1 = rng.choice(
                pc1.shape[0], size=n_points, replace=pc1.shape[0] < n_points
            )
            idxs2 = rng.choice(
                pc2.shape[0], size=n_points, replace=pc2.shape[0] < n_points
            )
            pc1, pc2 = pc1[idxs1], pc2[idxs2]
            flow_3d, occ_mask_3d = flow_3d[idxs1], occ_mask_3d[idxs1]

        if self.cfgs.with_pc:
            data["pcs"] = np.concatenate([pc1, pc2], axis=1).astype(np.float32)
            data["flow_3d"] = flow_3d.astype(np.float32)
            data["intrinsics"] = np.float32([f, cx, cy])
            data["occ_mask_3d"] = occ_mask_3d.astype(np.float32)
        if self.cfgs.with_image:
            data["images"] = np.concatenate([image1, image2], axis=-1).astype(
                np.float32
            )
            data["flow_2d"] = flow_2d.astype(np.float32)
        return data


class KITTI:
    """KITTI scene-flow training splits (kitti.py:9-95)."""

    def __init__(self, cfgs):
        assert os.path.isdir(cfgs.root_dir), cfgs.root_dir
        assert cfgs.split in ["training200", "training160", "training40", "testing200"]
        sub = "training" if "training" in cfgs.split else "testing"
        self.root_dir = os.path.join(cfgs.root_dir, sub)
        self.split = cfgs.split
        self.cfgs = cfgs
        if self.split in ("training200", "testing200"):
            self.indices = list(range(200))
        elif self.split == "training160":
            self.indices = [i for i in range(200) if i % 5 != 0]
        else:
            self.indices = [i for i in range(200) if i % 5 == 0]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        rng = (
            np.random.RandomState(23333)
            if not self.cfgs.augmentation.enabled
            else np.random
        )
        index = self.indices[i]
        data = {"index": index}

        proj_mat = io.load_calib(
            os.path.join(self.root_dir, "calib_cam_to_cam", "%06d.txt" % index)
        )
        f, cx, cy = proj_mat[0, 0], proj_mat[0, 2], proj_mat[1, 2]

        image1 = cv2.imread(
            os.path.join(self.root_dir, "image_2", "%06d_10.png" % index)
        )[..., ::-1]
        image2 = cv2.imread(
            os.path.join(self.root_dir, "image_2", "%06d_11.png" % index)
        )[..., ::-1]
        data["input_h"], data["input_w"] = image1.shape[:2]

        flow_2d, flow_2d_mask = io.load_flow_png(
            os.path.join(self.root_dir, "flow_occ", "%06d_10.png" % index)
        )
        disp1, mask1 = io.load_disp_png(
            os.path.join(self.root_dir, "disp_occ_0", "%06d_10.png" % index)
        )
        disp2, mask2 = io.load_disp_png(
            os.path.join(self.root_dir, "disp_occ_1", "%06d_10.png" % index)
        )
        mask = np.logical_and(np.logical_and(mask1, mask2), flow_2d_mask)

        pc1 = io.disp2pc(disp1, baseline=0.54, f=f, cx=cx, cy=cy)[mask]
        pc2 = io.disp2pc(disp2, baseline=0.54, f=f, cx=cx, cy=cy, flow=flow_2d)[mask]
        flow_3d = pc2 - pc1
        flow_3d_mask = np.ones(flow_3d.shape[0], dtype=np.float32)

        # out-of-boundary removal creates realistic occlusion (kitti.py:58-65)
        image_h, image_w = disp2.shape[:2]
        xy2 = io.project_pc2image_np(pc2, image_h, image_w, f, cx, cy, clip=False)
        boundary_mask = (
            (xy2[..., 0] >= 0)
            & (xy2[..., 0] < image_w)
            & (xy2[..., 1] >= 0)
            & (xy2[..., 1] < image_h)
        )
        pc2 = pc2[boundary_mask]

        flow_2d = np.concatenate(
            [flow_2d, flow_2d_mask[..., None].astype(np.float32)], axis=-1
        )
        flow_3d = np.concatenate([flow_3d, flow_3d_mask[..., None]], axis=-1)

        image1 = io.zero_padding(image1, 376, 1242)
        image2 = io.zero_padding(image2, 376, 1242)
        flow_2d = io.zero_padding(flow_2d, 376, 1242)

        image1, image2, pc1, pc2, flow_2d, flow_3d, f, cx, cy = joint_augmentation(
            image1, image2, pc1, pc2, flow_2d, flow_3d, f, cx, cy,
            self.cfgs.augmentation,
        )

        n_points = self.cfgs.n_points
        idxs1 = rng.choice(pc1.shape[0], size=n_points, replace=pc1.shape[0] < n_points)
        idxs2 = rng.choice(pc2.shape[0], size=n_points, replace=pc2.shape[0] < n_points)
        pc1, pc2, flow_3d = pc1[idxs1], pc2[idxs2], flow_3d[idxs1]

        data["images"] = np.concatenate([image1, image2], axis=-1).astype(np.float32)
        data["flow_2d"] = flow_2d.astype(np.float32)
        data["pcs"] = np.concatenate([pc1, pc2], axis=1).astype(np.float32)
        data["flow_3d"] = flow_3d.astype(np.float32)
        data["intrinsics"] = np.float32([f, cx, cy])
        return data


class KITTITest:
    """KITTI test split with externally provided disparities (kitti.py:98-157)."""

    def __init__(self, cfgs):
        assert os.path.isdir(cfgs.root_dir), cfgs.root_dir
        assert cfgs.split == "testing200"
        self.root_dir = os.path.join(cfgs.root_dir, "testing")
        self.cfgs = cfgs

    def __len__(self):
        return 200

    def __getitem__(self, index):
        rng = np.random.RandomState(23333)
        data = {"index": index}

        proj_mat = io.load_calib(
            os.path.join(self.root_dir, "calib_cam_to_cam", "%06d.txt" % index)
        )
        f, cx, cy = proj_mat[0, 0], proj_mat[0, 2], proj_mat[1, 2]

        image1 = cv2.imread(
            os.path.join(self.root_dir, "image_2", "%06d_10.png" % index)
        )[..., ::-1]
        image2 = cv2.imread(
            os.path.join(self.root_dir, "image_2", "%06d_11.png" % index)
        )[..., ::-1]
        data["input_h"], data["input_w"] = image1.shape[:2]

        provider = self.cfgs.disp_provider
        disp1, mask1 = io.load_disp_png(
            os.path.join(self.root_dir, f"disp_{provider}", "%06d_10.png" % index)
        )
        disp2, mask2 = io.load_disp_png(
            os.path.join(self.root_dir, f"disp_{provider}", "%06d_11.png" % index)
        )
        # ignore top 110 rows (sky, kitti.py:126-127)
        mask1[:110] = 0
        mask2[:110] = 0

        pc1 = io.disp2pc(disp1, baseline=0.54, f=f, cx=cx, cy=cy)[mask1]
        pc2 = io.disp2pc(disp2, baseline=0.54, f=f, cx=cx, cy=cy)[mask2]
        pc1 = pc1[pc1[..., 1] > -2.0]
        pc2 = pc2[pc2[..., 1] > -2.0]
        pc1 = pc1[pc1[..., -1] < self.cfgs.max_depth]
        pc2 = pc2[pc2[..., -1] < self.cfgs.max_depth]

        # unified padded size; configurable via testset zero_padding
        # (conf/testset/kitti.yaml — the reference hardcodes 376x1242)
        pad_cfg = self.cfgs.get("zero_padding", {})
        pad_h = int(pad_cfg.get("target_h", 376))
        pad_w = int(pad_cfg.get("target_w", 1242))
        image1 = io.zero_padding(image1, pad_h, pad_w)
        image2 = io.zero_padding(image2, pad_h, pad_w)

        n_points = self.cfgs.n_points
        idxs1 = rng.choice(pc1.shape[0], size=n_points, replace=pc1.shape[0] < n_points)
        idxs2 = rng.choice(pc2.shape[0], size=n_points, replace=pc2.shape[0] < n_points)
        pc1, pc2 = pc1[idxs1], pc2[idxs2]

        data["images"] = np.concatenate([image1, image2], axis=-1).astype(np.float32)
        data["pcs"] = np.concatenate([pc1, pc2], axis=1).astype(np.float32)
        data["intrinsics"] = np.float32([f, cx, cy])
        return data


# unofficial Sintel train/val scene split (sintel.py:10-13)
SINTEL_TRAIN_SCENES = [
    "alley_1", "ambush_4", "ambush_6", "ambush_7", "bamboo_2", "bandage_2",
    "cave_2", "market_2", "market_5", "shaman_2", "sleeping_2", "temple_3",
]
SINTEL_VALIDATE_SCENES = [
    "alley_2", "ambush_2", "ambush_5", "bamboo_1", "bandage_1", "cave_4",
    "market_6", "mountain_1", "shaman_3", "sleeping_1", "temple_2",
]


def depth_read_dpt(filename):
    """Sintel .dpt depth reader (sintel.py:16-32)."""
    with open(filename, "rb") as f:
        check = np.fromfile(f, dtype=np.float32, count=1)[0]
        assert check == 202021.25, f"wrong tag in {filename}"
        width = int(np.fromfile(f, dtype=np.int32, count=1)[0])
        height = int(np.fromfile(f, dtype=np.int32, count=1)[0])
        return np.fromfile(f, dtype=np.float32, count=-1).reshape((height, width))


def depth2pc(depth, f, cx, cy):
    """Lift a dense depth map to a point cloud (sintel.py:35-48)."""
    h, w = depth.shape
    xx = np.tile(np.arange(w, dtype=np.float32)[None, :], (h, 1))
    yy = np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w))
    return np.stack([(xx - cx) * depth / f, (yy - cy) * depth / f, depth], axis=-1)


class Sintel:
    """MPI Sintel with synthesized depth clouds — 2D-eval-only (sintel.py:51-156)."""

    def __init__(self, cfgs):
        assert os.path.isdir(cfgs.root_dir), cfgs.root_dir
        assert cfgs.pass_name in ["clean", "final", "clean_final"]
        self.cfgs = cfgs
        if cfgs.split == "train":
            scene_names = SINTEL_TRAIN_SCENES
        elif cfgs.split == "val":
            scene_names = SINTEL_VALIDATE_SCENES
        elif cfgs.split == "trainval":
            scene_names = SINTEL_TRAIN_SCENES + SINTEL_VALIDATE_SCENES
        else:
            raise ValueError(cfgs.split)

        self.samples = []
        for pass_name in ["clean", "final"]:
            if pass_name not in cfgs.pass_name:
                continue
            for scene in scene_names:
                image_dir = os.path.join(cfgs.root_dir, "flow", "training", pass_name, scene)
                depth_dir = os.path.join(cfgs.root_dir, "depth", "training", "depth", scene)
                flow_dir = os.path.join(cfgs.root_dir, "flow", "training", "flow", scene)
                if not os.path.isdir(image_dir):
                    continue  # tolerate partial downloads (reference asserts)
                image_paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
                depth_paths = sorted(glob.glob(os.path.join(depth_dir, "*.dpt")))
                flow_paths = sorted(glob.glob(os.path.join(flow_dir, "*.flo")))
                assert len(image_paths) == len(depth_paths) == len(flow_paths) + 1
                for i, flow_path in enumerate(flow_paths):
                    self.samples.append(
                        {
                            "image1_path": image_paths[i],
                            "image2_path": image_paths[i + 1],
                            "depth1_path": depth_paths[i],
                            "depth2_path": depth_paths[i + 1],
                            "flow_path": flow_path,
                            "scene_name": scene,
                            "sample_name": os.path.basename(image_paths[i]).split(".")[0],
                        }
                    )

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        rng = np.random.RandomState(0)
        sample = self.samples[index]
        data = {
            "index": index,
            "scene_name": sample["scene_name"],
            "sample_name": sample["sample_name"],
        }

        image1 = cv2.imread(sample["image1_path"])[..., ::-1]
        image2 = cv2.imread(sample["image2_path"])[..., ::-1]
        depth1 = depth_read_dpt(sample["depth1_path"])
        depth2 = depth_read_dpt(sample["depth2_path"])
        flow_2d = io.load_flow(sample["flow_path"])

        # depth rescale loop to guarantee n_points within max_depth
        # (sintel.py:121-128)
        while (
            min(
                np.count_nonzero(depth1 < self.cfgs.max_depth),
                np.count_nonzero(depth2 < self.cfgs.max_depth),
            )
            < self.cfgs.n_points
        ):
            depth1 *= 0.1
            depth2 *= 0.1
        min_depth = min(np.min(depth1), np.min(depth2))
        depth1 += 5 - min_depth
        depth2 += 5 - min_depth

        f, cx, cy = 1500.0, 511.5, 217.5
        pc1 = depth2pc(depth1, f, cx, cy)
        pc2 = depth2pc(depth2, f, cx, cy)
        flow_3d = np.zeros_like(pc1)

        mask1 = pc1[..., -1] < max(np.min(pc1[..., -1]) + 1, self.cfgs.max_depth)
        mask2 = pc2[..., -1] < max(np.min(pc2[..., -1]) + 1, self.cfgs.max_depth)
        pc1, pc2, flow_3d = pc1[mask1], pc2[mask2], flow_3d[mask1]

        n_points = self.cfgs.n_points
        idxs1 = rng.choice(pc1.shape[0], size=n_points, replace=pc1.shape[0] < n_points)
        idxs2 = rng.choice(pc2.shape[0], size=n_points, replace=pc2.shape[0] < n_points)
        pc1, pc2, flow_3d = pc1[idxs1], pc2[idxs2], flow_3d[idxs1]

        data["pcs"] = np.concatenate([pc1, pc2], axis=1).astype(np.float32)
        data["flow_3d"] = flow_3d.astype(np.float32)
        data["intrinsics"] = np.float32([f, cx, cy])
        data["images"] = np.concatenate([image1, image2], axis=-1).astype(np.float32)
        data["flow_2d"] = flow_2d.astype(np.float32)
        return data


def dataset_factory(cfgs):
    """Look up a dataset by `cfgs.name` (reference factory.py:10-18)."""
    name = cfgs["name"]
    if name == "flyingthings3d":
        return FlyingThings3D(cfgs)
    if name == "kitti":
        return KITTI(cfgs)
    if name == "kitti_test":
        return KITTITest(cfgs)
    if name == "sintel":
        return Sintel(cfgs)
    raise NotImplementedError(f"Unknown dataset: {name}")
