"""Demo: end-to-end inference on a synthetic RGB-D frame.

Equivalent of the reference's demo entry (reference: demo.py / runners/infer.py
:362-405) without external assets: renders a box scene with known pose, runs
the full GenPose2TPU pipeline (crop -> cloud -> score ODE -> aggregate ->
scale), prints pose error, and writes a bbox-overlay + SO(3) candidate plot
under ./demo_out.

    python demo.py [--trained]    # --trained: brief on-the-fly score training
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyRot

from genpose2_tpu import so3
from genpose2_tpu.api import GenPose2TPU
from genpose2_tpu.config import DataConfig, tiny_test_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.training import PoseAgent
from genpose2_tpu.utils.visualize import draw_3d_bbox, visualize_so3


def render_box_scene(K, R, t, size, im_h=240, im_w=320, n=60000, seed=0):
    rng = np.random.default_rng(seed)
    face = rng.integers(0, 6, n)
    uv = rng.random((n, 2)) - 0.5
    pts = np.zeros((n, 3))
    ax = face // 2
    pts[np.arange(n), ax] = np.where(face % 2 == 0, 0.5, -0.5)
    pts[np.arange(n), (ax + 1) % 3] = uv[:, 0]
    pts[np.arange(n), (ax + 2) % 3] = uv[:, 1]
    pts *= size
    cam = pts @ R.T + t
    z = cam[:, 2]
    u = (cam[:, 0] * K[0, 0] / z + K[0, 2]).astype(int)
    v = (cam[:, 1] * K[1, 1] / z + K[1, 2]).astype(int)
    ok = (u >= 0) & (u < im_w) & (v >= 0) & (v < im_h)
    order = np.argsort(-z[ok])
    depth = np.zeros((im_h, im_w), np.float32)
    mask = np.zeros((im_h, im_w), np.int32)
    depth[v[ok][order], u[ok][order]] = z[ok][order]
    mask[v[ok][order], u[ok][order]] = 7
    return depth, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trained", action="store_true", help="train a tiny score net first")
    ap.add_argument("--out", default="demo_out")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = tiny_test_config()
    cfg = cfg.replace(data=DataConfig(num_points=cfg.model.num_points, img_size=64))

    K = np.array([[280.0, 0, 160], [0, 280.0, 120], [0, 0, 1]], np.float32)
    size = np.array([0.12, 0.2, 0.08])
    R_gt = ScipyRot.random(random_state=11).as_matrix()
    t_gt = np.array([0.02, -0.01, 0.62])
    depth, mask = render_box_scene(K, R_gt, t_gt, size)
    frame = {
        "color": np.full((240, 320, 3), 110, np.uint8),
        "depth": depth,
        "mask": mask,
        "intrinsics": {"fx": 280.0, "fy": 280.0, "cx": 160.0, "cy": 120.0,
                       "width": 320, "height": 240},
    }

    engine = GenPose2TPU(cfg, num_steps=50)
    if args.trained:
        print("training a tiny score model on matching synthetic scenes ...")
        data = SyntheticPoseData(num_points=cfg.model.num_points)
        agent = PoseAgent(cfg, "score", steps_per_epoch=500)
        key = jax.random.PRNGKey(0)
        state = agent.init_state(key, data.batch(key, 16))
        for i in range(1500):
            b = data.batch(jax.random.PRNGKey(i), 16)
            state, m = agent.train_step(state, b, jax.random.PRNGKey(i))
            if i % 300 == 0:
                print(f"  step {i}: loss {float(m['loss']):.3f}")
        engine.score_agent = agent
        engine.score_state = state

    out = engine.inference(frame, key=jax.random.PRNGKey(0))
    assert out is not None, "no object found"
    R_pred = out["pose"][0, :3, :3]
    t_pred = out["pose"][0, :3, 3]
    deg = float(so3.rotation_angle_deg(jnp.asarray(R_pred), jnp.asarray(R_gt)))
    cm = float(np.linalg.norm(t_pred - t_gt) * 100)
    print(f"pose error: {deg:.1f} deg, {cm:.2f} cm; lengths {out['lengths'][0]}")

    img = draw_3d_bbox(frame["color"], K, R_pred, t_pred, out["lengths"][0])
    img = draw_3d_bbox(img, K, R_gt, t_gt, size, color=(255, 0, 0), thickness=1)
    import cv2

    cv2.imwrite(os.path.join(args.out, "bbox_overlay.png"), img[..., ::-1])
    print(f"wrote {args.out}/bbox_overlay.png (green=pred, red=gt)")

    # candidate SO(3) distribution
    batch_poses = engine.score_agent.sample_candidates(
        engine.score_state,
        _frame_batch(engine, frame),
        jax.random.PRNGKey(1),
        repeat_num=32,
        T0=1.0,
        method="fixed",
        num_steps=50,
    )
    Rs = so3.rot6d_cols_to_matrix(batch_poses[0, :, :6])
    visualize_so3(np.asarray(Rs), R_gt, path=os.path.join(args.out, "so3_candidates.png"))
    print(f"wrote {args.out}/so3_candidates.png")


def _frame_batch(engine, frame):
    from genpose2_tpu.data.infer_dataset import frame_to_object_batch
    from genpose2_tpu.data.loader import process_batch

    raw = frame_to_object_batch(
        frame["color"], frame["depth"], frame["mask"], frame["intrinsics"], engine.cfg.data
    )
    return process_batch(raw, engine.cfg.model.pose_mode)


if __name__ == "__main__":
    main()
