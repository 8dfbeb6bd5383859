"""Omni6DPose (SOPE/ROPE) dataset: per-object RoI crops + clouds from RGB-D.

Replaces the reference's cutoop-backed loader
(reference: datasets/datasets_omni6dpose.py:73-500). Frame layout on disk
(cutoop convention): each frame is a path PREFIX with

    <prefix>color.png    uint8 RGB
    <prefix>depth.exr    float32 depth in meters (values > 1e3 zeroed)
                         (or depth.png, uint16 millimeters, as a fallback)
    <prefix>mask.exr     integer instance mask (or mask.png)
    <prefix>meta.json    {"camera": {"intrinsics": {fx, fy, cx, cy, width,
                         height}}, "objects": [{"is_valid", "mask_id",
                         "quaternion_wxyz", "translation",
                         "meta": {"oid", "class_label", "class_name",
                         "bbox_side_len"}}]}

plus a dataset-level obj_meta.json mapping oid ->
{"tag": {"symmetry": {"any", "x", "y", "z"}}}
(reference: README.md:77-85 external asset).

The per-object extraction pipeline mirrors datasets_omni6dpose.py:195-443:
square 40-px-quantized bbox -> DZI jitter (train) -> affine crops of
rgb/mask/depth/coord2d -> mask deformation -> depth backprojection -> random
1024-point sampling -> symmetry/GT packaging. One deliberate fix: the sampled
point ids index roi_xs/roi_ys too, so the per-point pixel coordinates
correspond to the sampled cloud (the reference stores the unsampled pixel
lists, datasets_omni6dpose.py:369-374, which only collates because its masks
happen to produce fixed counts).
"""

from __future__ import annotations

import glob
import json
import threading
import os
from typing import Optional

import cv2
import numpy as np

from genpose2_tpu.config import DataConfig
from genpose2_tpu.data.pointcloud import depth_to_pcl, pixel2xyz, sample_points
from genpose2_tpu.data.roi import (
    aug_bbox_dzi,
    crop_resize_by_warp_affine,
    defor_2D,
    get_2d_coord_np,
    get_bbox,
    normalize_rgb,
)

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

_SYM_IDX = {"none": 0, "any": 1, "half": 2, "quarter": 3}


def load_color(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _imread_exr(path: str):
    """EXR via cv2 when its build has the codec, else the built-in numpy
    codec (genpose2_tpu/data/exr.py) — many OpenCV builds ship without
    OpenEXR support, and the Omni6DPose depth/mask files are EXR."""
    d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if d is None:
        from genpose2_tpu.data.exr import read_exr

        d = read_exr(path)
        if d.dtype == np.float16:
            d = d.astype(np.float32)
    return d


def load_depth(prefix: str) -> np.ndarray:
    """Depth in meters; EXR preferred, uint16-mm PNG fallback."""
    if os.path.exists(prefix + "depth.exr"):
        d = _imread_exr(prefix + "depth.exr")
        if d is not None and d.ndim == 3:
            d = d[..., 0]
    else:
        d = cv2.imread(prefix + "depth.png", cv2.IMREAD_UNCHANGED)
        if d is not None:
            d = d.astype(np.float32) / 1000.0
    d = d.astype(np.float32)
    d[d > 1e3] = 0  # reference: datasets_omni6dpose.py:231
    return d


def load_mask(prefix: str) -> np.ndarray:
    for name in ("mask.exr", "mask.png"):
        p = prefix + name
        if os.path.exists(p):
            m = _imread_exr(p) if name.endswith(".exr") else cv2.imread(p, cv2.IMREAD_UNCHANGED)
            if m is not None and m.ndim == 3:
                m = m[..., 0]
            return m.astype(np.int32)
    raise FileNotFoundError(f"no mask at {prefix}")


def load_meta(prefix: str) -> dict:
    with open(prefix + "meta.json") as f:
        return json.load(f)


def extract_object_sample(
    rgb: np.ndarray,
    depth: np.ndarray,
    mask: np.ndarray,
    meta: dict,
    obj: dict,
    sym_info: np.ndarray,
    cfg: DataConfig,
    rng: np.random.Generator,
    train: bool = True,
) -> Optional[dict]:
    """The shared per-object crop/backproject pipeline. Returns None when the
    object has no usable depth pixels (caller retries with another index,
    reference: datasets_omni6dpose.py:199-330)."""
    intr = meta["camera"]["intrinsics"]
    im_h, im_w = rgb.shape[:2]
    img_resize_scale = im_h / intr["height"]
    K = np.array(
        [
            [intr["fx"], 0, intr["cx"]],
            [0, intr["fy"], intr["cy"]],
            [0, 0, 1.0 / img_resize_scale],
        ],
        np.float32,
    ) * img_resize_scale  # scale fx/fy/cx/cy; K[2,2] back to 1

    object_mask = mask == obj["mask_id"]
    if not np.any(object_mask):
        return None
    ys, xs = np.nonzero(object_mask)
    rmin, rmax, cmin, cmax = get_bbox(
        [ys.min(), xs.min(), ys.max(), xs.max()], im_h, im_w
    )
    bbox_xyxy = np.array([cmin, rmin, cmax, rmax])
    center, scale = aug_bbox_dzi(
        rng,
        bbox_xyxy,
        im_h,
        im_w,
        pad_scale=cfg.dzi_pad_scale,
        dzi_type=cfg.dzi_type if train else "none",
        scale_ratio=cfg.dzi_scale_ratio,
        shift_ratio=cfg.dzi_shift_ratio,
    )

    coord_2d = get_2d_coord_np(im_w, im_h).transpose(1, 2, 0)
    S = cfg.img_size
    roi_coord_2d = crop_resize_by_warp_affine(
        coord_2d, center, scale, S, interpolation=cv2.INTER_NEAREST
    ).transpose(2, 0, 1)
    roi_rgb_raw = crop_resize_by_warp_affine(
        rgb, center, scale, S, interpolation=cv2.INTER_LINEAR
    )
    roi_rgb = normalize_rgb(roi_rgb_raw)
    mask_f = object_mask.astype(np.float32)
    roi_mask = crop_resize_by_warp_affine(
        mask_f, center, scale, S, interpolation=cv2.INTER_NEAREST
    )
    roi_depth = crop_resize_by_warp_affine(
        depth, center, scale, S, interpolation=cv2.INTER_NEAREST
    )
    if (roi_depth > 0).sum() <= 1:
        return None
    roi_mask_def = (
        defor_2D(rng, roi_mask, cfg.roi_mask_r, cfg.roi_mask_pro) if train else roi_mask
    )
    # fused native backproject+sample when the C++ core is available
    # (native/gp2_host.cc); numpy fallback keeps identical geometry
    from genpose2_tpu.data import native as _native

    if _native.available():
        n_valid, pcl, rows, cols = _native.extract_cloud(
            roi_depth,
            (roi_mask_def > 0).astype(np.uint8),
            roi_coord_2d[0],
            roi_coord_2d[1],
            float(K[0, 0]), float(K[1, 1]), float(K[0, 2]), float(K[1, 2]),
            cfg.num_points,
            seed=int(rng.integers(1 << 62)),
        )
        if n_valid <= 1 or n_valid < 50:
            return None
        pix_rows, pix_cols, ids = rows, cols, np.arange(cfg.num_points)
    else:
        valid2d = (roi_depth > 0) * (roi_mask_def > 0)
        if valid2d.sum() <= 1:
            return None
        pix_rows, pix_cols = np.nonzero(valid2d)
        valid = valid2d.reshape(-1) > 0
        pcl = depth_to_pcl(roi_depth, K, roi_coord_2d, valid)
        if len(pcl) < 50:
            return None
        ids, pcl = sample_points(rng, pcl, cfg.num_points)

    q = np.asarray(obj["quaternion_wxyz"], np.float32)
    w, x, y, z = q / np.linalg.norm(q)
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )
    t = np.asarray(obj["translation"], np.float32)
    affine = np.eye(4, dtype=np.float32)
    affine[:3, :3] = R
    affine[:3, 3] = t

    return {
        "pcl_in": pcl.astype(np.float32),
        "rotation": R,
        "translation": t,
        "affine": affine,
        "sym_info": sym_info.astype(np.int32),
        "roi_rgb": roi_rgb.astype(np.float32),  # (S, S, 3) normalized, HWC
        "roi_xs": pix_rows[ids].astype(np.int32),  # row indices of sampled pts
        "roi_ys": pix_cols[ids].astype(np.int32),
        "roi_center_dir": pixel2xyz(im_h, im_w, center, intr),
        "intrinsics": np.array(
            [intr["fx"], intr["fy"], intr["cx"], intr["cy"], intr["width"], intr["height"]],
            np.float32,
        ),
        "bbox_side_len": np.asarray(obj["meta"]["bbox_side_len"], np.float32),
        "class_label": np.int32(obj["meta"]["class_label"]),
        "handle_visibility": np.int32(1),
    }


class Omni6DPoseDataset:
    """Frame-prefix dataset with REPCNT oversampling per train image
    (reference: datasets_omni6dpose.py:73-224)."""

    REPCNT = 8

    def __init__(
        self,
        cfg: DataConfig,
        mode: str = "train",
        data_dir: Optional[str] = None,
        per_obj: str = "",
        agent_type: str = "score",
        scale_batch_size: int = 64,
    ):
        self.cfg = cfg
        self.mode = mode
        self.train = mode == "train"
        self.per_obj = per_obj or cfg.per_obj
        self.agent_type = agent_type
        self.scale_batch_size = scale_batch_size
        # epoch counter set by the DataLoader before each pass; folded into the
        # per-sample RNG seed so different epochs draw different augmentations
        self.epoch = 0
        data_dir = data_dir or cfg.data_path

        self.img_list = sorted(
            p[: -len("meta.json")]
            for p in glob.glob(os.path.join(data_dir, "**", "*meta.json"), recursive=True)
            if not p.endswith("obj_meta.json")
        )
        if not self.img_list:
            raise FileNotFoundError(f"no frames under {data_dir}")

        obj_meta_path = os.path.join(data_dir, "obj_meta.json")
        self.obj_meta = {}
        if os.path.exists(obj_meta_path):
            with open(obj_meta_path) as f:
                self.obj_meta = json.load(f).get("instance_dict", {})
        if self.train:
            self.eval_pairs = None
            self.length = len(self.img_list) * self.REPCNT
        else:
            # eval enumerates EVERY valid object exactly once: (frame, object)
            # pairs built from the per-frame valid counts — the reference's
            # cumsum indexing (reference: datasets_omni6dpose.py:179-186,
            # 219-224)
            self.eval_pairs = []
            for fi, prefix in enumerate(self.img_list):
                meta = load_meta(prefix)
                for oi, o in enumerate(meta["objects"]):
                    if not o.get("is_valid", True):
                        continue
                    if self.per_obj and o["meta"]["class_name"] != self.per_obj:
                        continue
                    self.eval_pairs.append((fi, oi))
            self.length = len(self.eval_pairs)
        # percentage_data subsetting: a seeded random subset of sample indices
        # (the reference random_split's train-percentage slice,
        # datasets_omni6dpose.py:588-589)
        self.index_map = None
        if cfg.percentage_data < 1.0:
            n = max(1, int(self.length * cfg.percentage_data))
            perm = np.random.default_rng(cfg.seed).permutation(self.length)[:n]
            self.index_map = np.sort(perm)
            self.length = n
        # decoded-frame LRU: REPCNT oversampling re-reads every training frame
        # REPCNT times per epoch, and each multi-object frame is re-read once
        # per object at eval — caching the (rgb, depth, mask) decode converts
        # those into hits. Thread-safe for the threaded DataLoader.
        self._cache_frames = max(0, int(cfg.frame_cache))
        self._cache: "dict[str, tuple]" = {}
        self._cache_lock = threading.Lock()

    def _load_frame(self, prefix: str):
        if self._cache_frames:
            with self._cache_lock:
                hit = self._cache.pop(prefix, None)
                if hit is not None:
                    self._cache[prefix] = hit  # re-insert as most-recent
                    return hit
        frame = (load_color(prefix + "color.png"), load_depth(prefix), load_mask(prefix))
        if self._cache_frames:
            with self._cache_lock:
                self._cache[prefix] = frame
                while len(self._cache) > self._cache_frames:
                    self._cache.pop(next(iter(self._cache)))
        return frame

    def __len__(self):
        return self.length

    def _sym_for(self, oid: str) -> np.ndarray:
        info = self.obj_meta.get(oid)
        if info is None:
            return np.zeros(4, np.int32)
        s = info["tag"]["symmetry"]
        return np.array(
            [int(bool(s["any"])), _SYM_IDX[s["x"]], _SYM_IDX[s["y"]], _SYM_IDX[s["z"]]],
            np.int32,
        )

    def __getitem__(self, index: int) -> dict:
        # per-call generator: numpy Generators are not thread-safe, and the
        # DataLoader runs __getitem__ concurrently — deriving one from
        # (dataset seed, epoch, index) is both safe and deterministic
        rng = np.random.default_rng(
            np.random.SeedSequence(entropy=(self.cfg.seed, self.epoch, index))
        )
        for _ in range(len(self)):  # bad-sample retry (reference: :199-330)
            i = int(self.index_map[index]) if self.index_map is not None else index
            if self.train:
                prefix = self.img_list[i // self.REPCNT % len(self.img_list)]
                meta = load_meta(prefix)
                valid_objects = [o for o in meta["objects"] if o.get("is_valid", True)]
                if self.per_obj:
                    valid_objects = [
                        o for o in valid_objects if o["meta"]["class_name"] == self.per_obj
                    ]
                if not valid_objects:
                    index = (index + 1) % len(self)
                    continue
                sel = i % self.REPCNT
                if sel < self.REPCNT - self.REPCNT % len(valid_objects):
                    obj = valid_objects[sel % len(valid_objects)]
                else:
                    obj = valid_objects[int(rng.integers(len(valid_objects)))]
            else:
                fi, oi = self.eval_pairs[i]
                prefix = self.img_list[fi]
                meta = load_meta(prefix)
                obj = meta["objects"][oi]

            rgb, depth, mask = self._load_frame(prefix)
            sym = self._sym_for(obj["meta"]["oid"])
            sample = extract_object_sample(
                rgb, depth, mask, meta, obj, sym, self.cfg, rng, self.train
            )
            if sample is None:
                index = (index + 1) % len(self)
                continue
            sample["path"] = prefix
            if self.agent_type == "scale":
                # noised GT axes for scale training
                # (reference: datasets_omni6dpose.py:399-415, 10-deg jitter)
                from scipy.spatial.transform import Rotation as ScipyRot

                S = self.scale_batch_size
                angles = np.clip(rng.normal(0, 10, S), -20, 20)
                axes = rng.normal(size=(S, 3))
                axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
                noise = ScipyRot.from_rotvec(
                    axes * np.radians(angles)[:, None]
                ).as_matrix()
                sample["axes_training"] = (noise @ sample["rotation"][None]).astype(
                    np.float32
                )
                sample["length_training"] = np.tile(
                    sample["bbox_side_len"][None], (S, 1)
                )
            return sample
        raise RuntimeError("no valid samples in dataset")
