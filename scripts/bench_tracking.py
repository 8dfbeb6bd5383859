"""Tracking-path benchmark: frames/s of the warm-start video loop.

Workload = the reference's tracking evaluation configuration
(reference: scripts/eval_tracking.sh: T0=0.25 warm start from the previous
frame's pose; evaluation_tracking.py:110-216): per frame, re-center the
temporal prior, run the ODE from T0=0.25 over K=50 candidates per object,
aggregate, regress lengths, emit the next prior. B objects per frame batch
(the reference multiplexes ~30 videos to fill this).

Steady-state methodology as bench.py: `reps` sequential frames chained in one
jit (the frame recurrence through prev_pose is the real dependency), single
D2H fence. Prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval.tracking import PoseTracker
from genpose2_tpu.training import PoseAgent


def main():
    B, N = 128, 1024
    cfg = default_config().replace(
        model=ModelConfig(dino="none", pointnet2=PointNet2Config(compute_dtype="bfloat16"))
    )
    agent = PoseAgent(cfg, "score", steps_per_epoch=1000)
    data = SyntheticPoseData(num_points=N)
    key = jax.random.PRNGKey(0)
    batch = data.batch(key, B)
    batch = {
        k: batch[k]
        for k in ("pts", "zero_mean_gt_pose", "pts_center", "gt_rotation", "gt_translation")
    }
    state = agent.init_state(key, batch)

    # tracking: T0=0.25 with the same step density as the single-frame setting
    # (50 steps over [0.55, eps] -> ~23 over [0.25, eps])
    tracker = PoseTracker(cfg, agent, state, T0=0.25, num_steps=23)
    prev0 = tracker.init_from_gt(key, batch["gt_rotation"], batch["gt_translation"])

    reps = 20

    @jax.jit
    def frames_loop(state_unused, batch, prev, key):
        def body(prev_pose, k):
            keyk = jax.random.fold_in(key, k)
            out = tracker.step(batch, prev_pose, keyk)
            return out["prev_pose"], None

        final, _ = jax.lax.scan(body, prev, jnp.arange(reps))
        return final

    final = frames_loop(state, batch, prev0, jax.random.PRNGKey(10_000))
    _ = float(final[0, 0])

    best = float("inf")
    for i in range(3):
        start = time.perf_counter()
        final = frames_loop(state, batch, prev0, jax.random.PRNGKey(i))
        _ = float(final[0, 0])
        best = min(best, time.perf_counter() - start)
    dt = best / reps

    print(
        json.dumps(
            {
                "metric": "tracking_object_frames_per_s_per_chip",
                "value": round(B / dt, 1),
                "unit": f"object-frames/s (B={B} objects/frame, K=50, T0=0.25 "
                "warm start, 23-step RK4, aggregation + analytic scale)",
                "ms_per_frame_batch": round(dt * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
