"""Host-side RoI extraction: square crop windows, dynamic zoom-in (DZI)
augmentation, CenterNet-style affine crops, and mask deformation.

Behavioral spec from the reference:
- get_bbox: 40-px-quantized square window clamped into the image
  (reference: utils/sgpa_utils.py:171-198);
- aug_bbox_DZI: uniform scale/shift jitter with pad scale 1.5
  (reference: utils/datasets_utils.py:26-71);
- crop_resize_by_warp_affine / get_affine_transform: CenterNet affine
  (reference: utils/datasets_utils.py:92-177);
- defor_2D: randomized erosion-based mask deformation
  (reference: utils/data_augmentation.py:10-36);
- get_2d_coord_np: pixel-coordinate maps (reference: utils/datasets_utils.py:5-23).
"""

from __future__ import annotations

import cv2
import numpy as np


def get_2d_coord_np(width: int, height: int, fmt: str = "CHW") -> np.ndarray:
    x = np.linspace(0, width - 1, width, dtype=np.float32)
    y = np.linspace(0, height - 1, height, dtype=np.float32)
    xy = np.asarray(np.meshgrid(x, y))
    if fmt == "HWC":
        xy = xy.transpose(1, 2, 0)
    return xy


def get_bbox(bbox, img_height: int = 480, img_length: int = 640):
    """(y1, x1, y2, x2) -> square (rmin, rmax, cmin, cmax), side quantized to
    40 px and clamped into the image."""
    y1, x1, y2, x2 = bbox
    window_size = (max(y2 - y1, x2 - x1) // 40 + 1) * 40
    window_size = min(window_size, img_height - 40, img_length - 40)
    center = [(y1 + y2) // 2, (x1 + x2) // 2]
    rmin = center[0] - int(window_size / 2)
    rmax = center[0] + int(window_size / 2)
    cmin = center[1] - int(window_size / 2)
    cmax = center[1] + int(window_size / 2)
    if rmin < 0:
        rmax += -rmin
        rmin = 0
    if cmin < 0:
        cmax += -cmin
        cmin = 0
    if rmax > img_height:
        rmin -= rmax - img_height
        rmax = img_height
    if cmax > img_length:
        cmin -= cmax - img_length
        cmax = img_length
    return rmin, rmax, cmin, cmax


def aug_bbox_dzi(
    rng: np.random.Generator,
    bbox_xyxy: np.ndarray,
    im_h: int,
    im_w: int,
    pad_scale: float = 1.5,
    dzi_type: str = "uniform",
    scale_ratio: float = 0.25,
    shift_ratio: float = 0.25,
):
    """Dynamic zoom-in: returns (center (2,), square side)."""
    x1, y1, x2, y2 = np.asarray(bbox_xyxy, np.float64).copy()
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    bh, bw = y2 - y1, x2 - x1
    if dzi_type == "uniform":
        s = 1 + scale_ratio * (2 * rng.random() - 1)
        sh = shift_ratio * (2 * rng.random(2) - 1)
        center = np.array([cx + bw * sh[0], cy + bh * sh[1]])
        scale = max(bh, bw) * s * pad_scale
    elif dzi_type == "roi10d":
        a, b = -0.15, 0.15
        x1 += bw * (rng.random() * (b - a) + a)
        x2 += bw * (rng.random() * (b - a) + a)
        y1 += bh * (rng.random() * (b - a) + a)
        y2 += bh * (rng.random() * (b - a) + a)
        x1, x2 = np.clip(x1, 0, im_w), np.clip(x2, 0, im_w)
        y1, y2 = np.clip(y1, 0, im_h), np.clip(y2, 0, im_h)
        center = np.array([0.5 * (x1 + x2), 0.5 * (y1 + y2)])
        scale = max(y2 - y1, x2 - x1) * pad_scale
    elif dzi_type == "none":
        center = np.array([cx, cy])
        scale = max(bh, bw)
    else:
        raise NotImplementedError(dzi_type)
    return center, float(min(scale, max(im_h, im_w)))


def aug_bbox_eval(bbox_xyxy, im_h, im_w):
    """Deterministic eval-time window (reference: datasets_utils.py:74-89)."""
    rng = np.random.default_rng(0)
    return aug_bbox_dzi(rng, bbox_xyxy, im_h, im_w, dzi_type="none")


def _get_3rd_point(a, b):
    d = a - b
    return b + np.array([-d[1], d[0]], dtype=np.float32)


def get_affine_transform(center, scale, rot_deg, output_size, inv=False):
    """CenterNet affine from a square source window to the output crop."""
    center = np.asarray(center, np.float32)
    if isinstance(scale, (int, float)):
        scale = np.array([scale, scale], np.float32)
    if isinstance(output_size, (int, float)):
        output_size = (output_size, output_size)
    src_w = scale[0]
    dst_w, dst_h = output_size
    rot = np.pi * rot_deg / 180
    sn, cs = np.sin(rot), np.cos(rot)
    # reference get_dir([0, -w/2], rot): (x cos - y sin, x sin + y cos)
    src_dir = np.array(
        [0 * cs - (src_w * -0.5) * sn, 0 * sn + (src_w * -0.5) * cs], np.float32
    )
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    src[2] = _get_3rd_point(src[0], src[1])
    dst[2] = _get_3rd_point(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def crop_resize_by_warp_affine(img, center, scale, output_size, rot=0, interpolation=cv2.INTER_LINEAR):
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    trans = get_affine_transform(center, scale, rot, output_size)
    return cv2.warpAffine(
        img, trans, (int(output_size[0]), int(output_size[1])), flags=interpolation
    )


def defor_2D(rng: np.random.Generator, roi_mask: np.ndarray, rand_r: int = 3, rand_pro: float = 0.5):
    """Randomized mask erosion: with probability rand_pro, erode the mask with
    a random kernel and drop random boundary pixels
    (reference: utils/data_augmentation.py:10-36)."""
    if rng.random() > rand_pro or rand_r <= 0:
        return roi_mask
    mask = roi_mask.squeeze().copy().astype(np.uint8)
    change_list = []
    kernel_size = int(rng.integers(1, rand_r + 1))
    kernel = np.ones((kernel_size, kernel_size), np.uint8)
    erode = cv2.erode(mask, kernel, iterations=1)
    boundary = mask - erode
    ys, xs = np.nonzero(boundary)
    if len(ys) == 0:
        return roi_mask
    keep = rng.random(len(ys)) > 0.5
    mask_out = mask.copy()
    mask_out[ys[~keep], xs[~keep]] = 0
    return mask_out.reshape(roi_mask.shape).astype(roi_mask.dtype)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_rgb(rgb_hwc_uint8: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 HWC, ImageNet-normalized
    (reference: datasets_omni6dpose.py:493-500, channels-first there)."""
    x = rgb_hwc_uint8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
