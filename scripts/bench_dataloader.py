"""Host data-path benchmark: dataset -> loader samples/s, EXR vs PNG decode,
native C++ core vs numpy fallback.

Fabricates an on-disk Omni6DPose-format scene set (depth-rendered boxes with
known poses, the same generator as tests/test_data.py), then measures:

- raw decode rates (cv2 EXR float32 vs uint16-mm PNG),
- end-to-end Omni6DPoseDataset.__getitem__ + threaded DataLoader throughput
  with the native host core enabled and disabled.

CPU-only (no TPU needed). Prints one JSON line per measurement.
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_box_scene(K, R, t, size, im_h=480, im_w=640):
    n = 120000
    rng = np.random.default_rng(0)
    face = rng.integers(0, 6, n)
    uv = rng.random((n, 2)) - 0.5
    pts = np.zeros((n, 3))
    ax = face // 2
    sign = np.where(face % 2 == 0, 0.5, -0.5)
    pts[np.arange(n), ax] = sign
    pts[np.arange(n), (ax + 1) % 3] = uv[:, 0]
    pts[np.arange(n), (ax + 2) % 3] = uv[:, 1]
    pts *= size
    cam = pts @ R.T + t
    z = cam[:, 2]
    u = (cam[:, 0] * K[0, 0] / z + K[0, 2]).astype(int)
    v = (cam[:, 1] * K[1, 1] / z + K[1, 2]).astype(int)
    ok = (u >= 0) & (u < im_w) & (v >= 0) & (v < im_h)
    depth = np.zeros((im_h, im_w), np.float32)
    mask = np.zeros((im_h, im_w), np.int32)
    order = np.argsort(-z[ok])
    uu, vv, zz = u[ok][order], v[ok][order], z[ok][order]
    depth[vv, uu] = zz
    mask[vv, uu] = 7
    return depth, mask


def fabricate(root: str, num_frames: int = 24):
    from scipy.spatial.transform import Rotation as ScipyRot

    K = np.array([[560.0, 0, 320], [0, 560.0, 240], [0, 0, 1]], np.float32)
    size = np.array([0.12, 0.2, 0.08])
    for i in range(num_frames):
        R = ScipyRot.random(random_state=i).as_matrix()
        t = np.array([0.02 * (i % 5), -0.01, 0.65])
        depth, mask = render_box_scene(K, R, t, size)
        prefix = os.path.join(root, f"frame{i:04d}_")
        from genpose2_tpu.data.exr import write_exr

        cv2.imwrite(prefix + "color.png", np.full((480, 640, 3), 128, np.uint8))
        write_exr(prefix + "depth.exr", depth, "zip")  # float32 (primary format)
        cv2.imwrite(prefix + "depth16.png", (depth * 1000).astype(np.uint16))
        cv2.imwrite(prefix + "mask.png", mask.astype(np.uint16))
        meta = {
            "camera": {
                "intrinsics": {
                    "fx": 560.0, "fy": 560.0, "cx": 320.0, "cy": 240.0,
                    "width": 640, "height": 480,
                }
            },
            "objects": [
                {
                    "is_valid": True,
                    "mask_id": 7,
                    "quaternion_wxyz": ScipyRot.from_matrix(R)
                    .as_quat()[[3, 0, 1, 2]]
                    .tolist(),
                    "translation": t.tolist(),
                    "meta": {
                        "oid": "box_0",
                        "class_label": 3,
                        "class_name": "box",
                        "bbox_side_len": size.tolist(),
                    },
                }
            ],
        }
        with open(prefix + "meta.json", "w") as f:
            json.dump(meta, f)
    obj_meta = {
        "instance_dict": {
            "box_0": {"tag": {"symmetry": {"any": False, "x": "none", "y": "half", "z": "none"}}}
        }
    }
    with open(os.path.join(root, "obj_meta.json"), "w") as f:
        json.dump(obj_meta, f)


def bench_decode(root, reps=40):
    from genpose2_tpu.data.exr import read_exr

    exr = os.path.join(root, "frame0000_depth.exr")
    png = os.path.join(root, "frame0000_depth16.png")
    for name, path, reader in [
        ("exr_float32", exr, read_exr),
        ("png_uint16mm", png, lambda p: cv2.imread(p, cv2.IMREAD_UNCHANGED)),
    ]:
        start = time.perf_counter()
        for _ in range(reps):
            d = reader(path)
        dt = (time.perf_counter() - start) / reps
        mb = d.nbytes / 1e6
        print(
            json.dumps(
                {
                    "metric": f"depth_decode_{name}",
                    "value": round(1.0 / dt, 1),
                    "unit": f"images/s (640x480, {mb:.1f} MB decoded)",
                }
            )
        )


def bench_loader(root, use_native: bool, num_workers=8, epochs=4):
    from genpose2_tpu.config import DataConfig
    from genpose2_tpu.data import native
    from genpose2_tpu.data.loader import DataLoader
    from genpose2_tpu.data.omni6dpose import Omni6DPoseDataset

    native_ok = native.available()
    if use_native and not native_ok:
        print(json.dumps({"metric": "loader_native", "value": None, "unit": "native lib unavailable"}))
        return
    prev = os.environ.get("GP2_DISABLE_NATIVE")
    if not use_native:
        os.environ["GP2_DISABLE_NATIVE"] = "1"
    try:
        cfg = DataConfig(num_points=1024, img_size=256, dzi_type="uniform")
        ds = Omni6DPoseDataset(cfg, mode="train", data_dir=root)
        dl = DataLoader(ds, batch_size=24, shuffle=True, num_workers=num_workers)
        n = 0
        # warm epoch (page cache, JITless python warmup)
        for b in dl:
            n += len(b["pcl_in"])
        start = time.perf_counter()
        n = 0
        for _ in range(epochs):
            for b in dl:
                n += len(b["pcl_in"])
        dt = time.perf_counter() - start
        print(
            json.dumps(
                {
                    "metric": f"loader_samples_per_s_{'native' if use_native else 'python'}",
                    "value": round(n / dt, 1),
                    "unit": f"samples/s ({num_workers} threads, 640x480 EXR frames, "
                    "full crop+backproject+sample path)",
                }
            )
        )
    finally:
        if not use_native:
            if prev is None:
                os.environ.pop("GP2_DISABLE_NATIVE", None)
            else:
                os.environ["GP2_DISABLE_NATIVE"] = prev


def main():
    with tempfile.TemporaryDirectory() as root:
        fabricate(root)
        bench_decode(root)
        bench_loader(root, use_native=False)
        bench_loader(root, use_native=True)


if __name__ == "__main__":
    main()
