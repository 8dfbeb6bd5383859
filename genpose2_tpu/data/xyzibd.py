"""BOP-format dataset loader (XYZ-IBD industrial dataset and any BOP split).

reference: datasets_my/xyzibd_dataset.py:35-848. Scene layout (BOP standard):

    <root>/<split>/<scene_id>/
        rgb/<im_id>.png          depth/<im_id>.png (uint16 * depth_scale mm)
        mask_visib/<im_id>_<gt_idx>.png
        scene_gt.json            {im_id: [{obj_id, cam_R_m2c(9), cam_t_m2c(3, mm)}]}
        scene_gt_info.json       {im_id: [{visib_fract, px_count_valid, ...}]}
        scene_camera.json        {im_id: {cam_K(9), depth_scale}}
    <root>/models/models_info.json  {obj_id: {size_x/y/z (mm),
        symmetries_continuous: [{axis, offset}], symmetries_discrete: [4x4]}}

Sample filters match the reference: visib_fract >= 0.1 and
px_count_valid >= 1000 (reference: xyzibd_dataset.py:521-527).

Symmetry inference: continuous axes map to per-axis 'any' tags; discrete
symmetry groups are classified by the minimal rotation angle about their
common axis (order >= 4 -> 'quarter', order 2 -> 'half') — a cleaner rule
than the reference's hard-coded trig pattern matching
(xyzibd_dataset.py:175-245). Deliberate divergence: the reference sets the
GLOBAL 'any' flag for every object with any symmetry (:158-162), which the
metric layer reads as full spherical symmetry and zeroes the rotation error;
here the global flag stays False unless the model is actually a sphere.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import cv2
import numpy as np

from genpose2_tpu.config import DataConfig
from genpose2_tpu.data.omni6dpose import extract_object_sample


def bop_symmetry_label(model_info: dict) -> np.ndarray:
    """models_info entry -> (4,) int32 [any, x, y, z]."""
    tags = {"none": 0, "any": 1, "half": 2, "quarter": 3}
    ax_tag = ["none", "none", "none"]
    for sym in model_info.get("symmetries_continuous", []):
        axis = np.asarray(sym.get("axis", [0, 0, 0]), float)
        if np.linalg.norm(axis) > 1e-6:
            ax_tag[int(np.argmax(np.abs(axis)))] = "any"

    discrete = model_info.get("symmetries_discrete", [])
    if discrete:
        angles = {0: [], 1: [], 2: []}
        for mat in discrete:
            M = np.asarray(mat, float).reshape(4, 4)
            R = M[:3, :3]
            cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
            ang = np.arccos(cos)
            if ang < 1e-6:
                continue
            # rotation axis from the antisymmetric part (or eigenvector for pi)
            if abs(np.pi - ang) > 1e-3:
                v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
            else:
                w, vecs = np.linalg.eigh(R)
                v = vecs[:, np.argmax(w)]
            axis_idx = int(np.argmax(np.abs(v)))
            angles[axis_idx].append(ang)
        for i in range(3):
            if angles[i] and ax_tag[i] == "none":
                order = int(round(2 * np.pi / min(angles[i])))
                ax_tag[i] = "quarter" if order >= 4 else "half"
    return np.asarray(
        [0, tags[ax_tag[0]], tags[ax_tag[1]], tags[ax_tag[2]]], np.int32
    )


class XyzibdDataset:
    """Per-object BOP samples through the shared crop/backprojection pipeline."""

    def __init__(
        self,
        cfg: DataConfig,
        split_dir: str,
        models_info_path: Optional[str] = None,
        mode: str = "train",
        min_visib_fract: float = 0.1,
        min_px_count: int = 1000,
        cameras: Optional[list] = None,
    ):
        self.cfg = cfg
        self.train = mode == "train"
        # epoch set by the DataLoader; per-sample RNG derives from it (numpy
        # Generators are not thread-safe under the threaded loader)
        self.epoch = 0

        models_info_path = models_info_path or os.path.join(
            os.path.dirname(split_dir.rstrip("/")), "models", "models_info.json"
        )
        with open(models_info_path) as f:
            self.models_info = {int(k): v for k, v in json.load(f).items()}
        self.sym_labels = {
            oid: bop_symmetry_label(mi) for oid, mi in self.models_info.items()
        }
        self.sizes_m = {
            oid: np.asarray(
                [mi.get("size_x", 0), mi.get("size_y", 0), mi.get("size_z", 0)], np.float32
            )
            / 1000.0
            for oid, mi in self.models_info.items()
        }

        self.samples = []  # (scene_dir, im_id, gt_idx, obj_id)
        self.scene_meta = {}
        for scene_dir in sorted(glob.glob(os.path.join(split_dir, "*"))):
            gt_p = os.path.join(scene_dir, "scene_gt.json")
            if not os.path.exists(gt_p):
                continue
            with open(gt_p) as f:
                scene_gt = json.load(f)
            info_p = os.path.join(scene_dir, "scene_gt_info.json")
            scene_info = {}
            if os.path.exists(info_p):
                with open(info_p) as f:
                    scene_info = json.load(f)
            with open(os.path.join(scene_dir, "scene_camera.json")) as f:
                scene_cam = json.load(f)
            self.scene_meta[scene_dir] = (scene_gt, scene_info, scene_cam)
            for im_id, gts in scene_gt.items():
                infos = scene_info.get(im_id, [{}] * len(gts))
                for gi, (gt, inf) in enumerate(zip(gts, infos)):
                    if inf.get("visib_fract", 1.0) < min_visib_fract:
                        continue
                    if inf.get("px_count_valid", min_px_count) < min_px_count:
                        continue
                    self.samples.append((scene_dir, im_id, gi, int(gt["obj_id"])))
        if not self.samples:
            raise FileNotFoundError(f"no BOP samples under {split_dir}")
        if cfg.percentage_data < 1.0:
            # seeded random subset (reference: datasets_omni6dpose.py:588-589,
            # dataset_port.py sample_ratio)
            n = max(1, int(len(self.samples) * cfg.percentage_data))
            perm = np.random.default_rng(cfg.seed).permutation(len(self.samples))
            self.samples = [self.samples[i] for i in np.sort(perm[:n])]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> dict:
        rng = np.random.default_rng(
            np.random.SeedSequence(entropy=(self.cfg.seed, self.epoch, index))
        )
        for _ in range(len(self)):
            scene_dir, im_id, gi, obj_id = self.samples[index % len(self)]
            scene_gt, scene_info, scene_cam = self.scene_meta[scene_dir]
            gt = scene_gt[im_id][gi]
            cam = scene_cam[im_id]
            K = np.asarray(cam["cam_K"], np.float32).reshape(3, 3)
            depth_scale = float(cam.get("depth_scale", 1.0))

            imi = int(im_id)
            rgb_p = os.path.join(scene_dir, "rgb", f"{imi:06d}.png")
            if not os.path.exists(rgb_p):
                rgb_p = os.path.join(scene_dir, "gray", f"{imi:06d}.png")
            rgb = cv2.imread(rgb_p, cv2.IMREAD_COLOR)
            rgb = cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB)
            depth = (
                cv2.imread(
                    os.path.join(scene_dir, "depth", f"{imi:06d}.png"),
                    cv2.IMREAD_UNCHANGED,
                ).astype(np.float32)
                * depth_scale
                / 1000.0
            )  # -> meters
            mask = cv2.imread(
                os.path.join(scene_dir, "mask_visib", f"{imi:06d}_{gi:06d}.png"),
                cv2.IMREAD_UNCHANGED,
            )
            mask = (mask > 0).astype(np.int32)

            R = np.asarray(gt["cam_R_m2c"], np.float32).reshape(3, 3)
            t = np.asarray(gt["cam_t_m2c"], np.float32) / 1000.0  # mm -> m
            from scipy.spatial.transform import Rotation as ScipyRot

            quat_xyzw = ScipyRot.from_matrix(R).as_quat()
            meta = {
                "camera": {
                    "intrinsics": {
                        "fx": float(K[0, 0]), "fy": float(K[1, 1]),
                        "cx": float(K[0, 2]), "cy": float(K[1, 2]),
                        "width": rgb.shape[1], "height": rgb.shape[0],
                    }
                }
            }
            obj = {
                "mask_id": 1,
                "quaternion_wxyz": quat_xyzw[[3, 0, 1, 2]].tolist(),
                "translation": t.tolist(),
                "meta": {
                    "oid": str(obj_id),
                    "class_label": obj_id,
                    "class_name": str(obj_id),
                    "bbox_side_len": self.sizes_m[obj_id].tolist(),
                },
            }
            sample = extract_object_sample(
                rgb, depth, mask, meta, obj, self.sym_labels[obj_id],
                self.cfg, rng, self.train,
            )
            if sample is None:
                index += 1
                continue
            sample["path"] = os.path.join(scene_dir, f"{imi:06d}_{gi}")
            return sample
        raise RuntimeError("no valid BOP samples")
