"""ctypes bindings for the native host data core (native/gp2_host.cc).

Auto-builds ``native/libgp2_host.so`` on first import when a compiler is
available; every entry point has a numpy fallback so the Python path never
hard-depends on the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgp2_host.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.gp2_mask_bbox.argtypes = [i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    lib.gp2_mask_bbox.restype = ctypes.c_int
    lib.gp2_warp_nearest_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f64p, f32p, ctypes.c_int, ctypes.c_int,
    ]
    lib.gp2_warp_nearest_f32.restype = None
    lib.gp2_extract_cloud.argtypes = [
        f32p, u8p, f32p, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_uint64, ctypes.c_int, f32p, i32p, i32p,
    ]
    lib.gp2_extract_cloud.restype = ctypes.c_int
    if hasattr(lib, "gp2_exr_chunk"):  # older cached .so builds lack it
        lib.gp2_exr_chunk.argtypes = [
            ctypes.c_char_p, ctypes.c_int, u8p, ctypes.c_int,
        ]
        lib.gp2_exr_chunk.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    if os.environ.get("GP2_DISABLE_NATIVE"):
        return False  # A/B escape hatch (scripts/bench_dataloader.py)
    return get_lib() is not None


def exr_chunk(zdata: bytes, expect: int) -> Optional[np.ndarray]:
    """Native inflate + EXR ZIP reconstruct/deinterleave of one chunk.
    Returns the decoded (expect,) uint8 block, or None when the native
    library is unavailable (caller falls back to the numpy path)."""
    if os.environ.get("GP2_DISABLE_NATIVE"):
        return None
    lib = get_lib()
    if lib is None or not hasattr(lib, "gp2_exr_chunk"):
        return None
    out = np.empty(expect, np.uint8)
    n = lib.gp2_exr_chunk(zdata, len(zdata), out, expect)
    if n != expect:
        raise ValueError(f"native EXR chunk decode failed (rc={n})")
    return out


def mask_bbox(mask: np.ndarray, mask_id: int) -> Tuple[int, Tuple[int, int, int, int]]:
    """Returns (pixel_count, (rmin, rmax, cmin, cmax))."""
    lib = get_lib()
    mask = np.ascontiguousarray(mask, np.int32)
    if lib is None:
        sel = mask == mask_id
        count = int(sel.sum())
        if count == 0:
            return 0, (mask.shape[0], -1, mask.shape[1], -1)
        ys, xs = np.nonzero(sel)
        return count, (int(ys.min()), int(ys.max()), int(xs.min()), int(xs.max()))
    out = np.zeros(4, np.int32)
    count = lib.gp2_mask_bbox(mask, mask.shape[0], mask.shape[1], mask_id, out)
    return int(count), tuple(int(v) for v in out)


def warp_nearest(src: np.ndarray, M: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Nearest-neighbor affine crop of a float32 single-channel image with the
    forward 2x3 affine M (src->dst)."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.float32)
    if lib is None:
        import cv2

        return cv2.warpAffine(src, M.astype(np.float64), (dw, dh), flags=cv2.INTER_NEAREST)
    dst = np.zeros((dh, dw), np.float32)
    lib.gp2_warp_nearest_f32(
        src, src.shape[0], src.shape[1], np.ascontiguousarray(M, np.float64), dst, dh, dw
    )
    return dst


def extract_cloud(
    roi_depth: np.ndarray,
    roi_mask: np.ndarray,
    coord_x: np.ndarray,
    coord_y: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    n_pts: int,
    seed: int = 0,
):
    """Backproject + sample in one native call.
    Returns (n_valid, pts (n_pts, 3), rows (n_pts,), cols (n_pts,))."""
    lib = get_lib()
    h, w = roi_depth.shape
    if lib is None:
        valid2d = (roi_depth > 0) & (roi_mask > 0)
        n_valid = int(valid2d.sum())
        if n_valid == 0:
            return 0, None, None, None
        rows, cols = np.nonzero(valid2d)
        z = roi_depth[rows, cols]
        x = (coord_x[rows, cols] - cx) * z / fx
        y = (coord_y[rows, cols] - cy) * z / fy
        pts = np.stack([x, y, z], -1).astype(np.float32)
        rng = np.random.default_rng(seed)
        if n_valid >= n_pts:
            ids = rng.permutation(n_valid)[:n_pts]
        else:
            ids = np.arange(n_pts) % n_valid
        return n_valid, pts[ids], rows[ids].astype(np.int32), cols[ids].astype(np.int32)
    pts = np.zeros((n_pts, 3), np.float32)
    rows = np.zeros(n_pts, np.int32)
    cols = np.zeros(n_pts, np.int32)
    n_valid = lib.gp2_extract_cloud(
        np.ascontiguousarray(roi_depth, np.float32),
        np.ascontiguousarray(roi_mask, np.uint8),
        np.ascontiguousarray(coord_x, np.float32),
        np.ascontiguousarray(coord_y, np.float32),
        h, w, fx, fy, cx, cy, seed, n_pts, pts, rows, cols,
    )
    if n_valid == 0:
        return 0, None, None, None
    return int(n_valid), pts, rows, cols
