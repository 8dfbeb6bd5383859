"""Conditional-generalization validation + training throughput, on-device.

Trains the tiny-config ScoreNet on synthetic random-pose scenes with the
WHOLE training loop on device (scan chunks of 200 steps with on-the-fly data:
one host dispatch per chunk instead of per step), then evaluates unseen poses
through the full sample -> aggregate pipeline with symmetry-calibrated
metrics. Also reports steady-state training steps/s.

Prints JSON lines.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from genpose2_tpu.config import tiny_test_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates, batch_criterion, sym_label
from genpose2_tpu.training import PoseAgent

CHUNK = 200
CHUNKS = 60  # 12k steps
B = 64


def main():
    from genpose2_tpu.config import ModelConfig, PointNet2Config

    # 3-stage encoder at 256 points: big enough to learn the conditional
    # rotation field, small enough to train in ~a minute on one chip
    pn2 = PointNet2Config(
        npoints=(64, 32, None),
        radii=((0.04, 0.08), (0.08, 0.16), (None, None)),
        nsamples=((8, 16), (8, 16), (None, None)),
        mlps=(
            ((16, 32), (16, 32)),
            ((32, 64), (32, 64)),
            ((128, 256), (128, 256)),
        ),
        compute_dtype="bfloat16",
    )
    cfg = tiny_test_config()
    cfg = cfg.replace(
        model=ModelConfig(num_points=256, pointnet2=pn2, dino="none", img_size=64)
    )
    data = SyntheticPoseData(num_points=cfg.model.num_points, noise=0.001)
    agent = PoseAgent(cfg, "score", steps_per_epoch=CHUNK)
    keep = ("pts", "zero_mean_gt_pose", "pts_center")

    key = jax.random.PRNGKey(0)
    b0 = {k: v for k, v in data.batch(key, B).items() if k in keep}
    state = agent.init_state(key, b0)

    @jax.jit
    def train_chunk(state, key):
        def body(st, k):
            b = {k2: v for k2, v in data.batch(k, B).items() if k2 in keep}
            st, m = agent.train_step(st, b, jax.random.fold_in(k, 1))
            return st, m["loss"]

        return jax.lax.scan(body, state, jax.random.split(key, CHUNK))

    state, losses = train_chunk(state, jax.random.fold_in(key, 0))
    _ = float(losses[-1])  # fence after compile
    start = time.perf_counter()
    for c in range(1, CHUNKS):
        state, losses = train_chunk(state, jax.random.fold_in(key, c))
    last = float(losses[-1])  # single fence at the end
    dt = time.perf_counter() - start
    steps = (CHUNKS - 1) * CHUNK
    print(
        json.dumps(
            {
                "metric": "train_steps_per_s_per_chip",
                "value": round(steps / dt, 1),
                "unit": f"steps/s (B={B}, 3-stage encoder, on-device scan x{CHUNK})",
                "samples_per_s": round(steps * B / dt, 1),
                "final_loss": round(last, 4),
            }
        )
    )

    # unseen-pose conditional generalization through the full pipeline
    test_batch = data.batch(jax.random.PRNGKey(31337), 64)
    poses = agent.sample_candidates(
        state, test_batch, jax.random.PRNGKey(7), repeat_num=50,
        T0=1.0, method="fixed", num_steps=100,
    )
    agg = aggregate_candidates(poses, None, retain_ratio=0.4)
    sym = jnp.tile(sym_label(x="half", y="half", z="half")[None], (64, 1))
    sizes = test_batch["bbox_side_len"]
    iou, deg, sht = batch_criterion(
        agg["rotation"], agg["translation"], sizes,
        test_batch["gt_rotation"], test_batch["gt_translation"], sizes, sym,
    )
    deg = np.asarray(deg)
    sht = np.asarray(sht)
    print(
        json.dumps(
            {
                "metric": "unseen_pose_generalization",
                "rot_deg_median": round(float(np.median(deg)), 2),
                "rot_deg_mean": round(float(deg.mean()), 2),
                "trans_cm_mean": round(float(sht.mean()), 2),
                "iou_mean": round(float(np.asarray(iou).mean()), 3),
                "unit": "64 unseen poses, 50 candidates, full aggregate pipeline",
            }
        )
    )


if __name__ == "__main__":
    main()
