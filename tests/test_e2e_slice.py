"""Minimum end-to-end slice (SURVEY.md §7 step 6): train a ScoreNet on a
synthetic single-object scene, sample 50 candidates with the on-device ODE,
aggregate with energy-free ranking, and check the pose is recovered.

Mirrors BASELINE.json config #1 (demo-style single object, no DINO, no
energy — the dino='none' path of the reference, posenet.py:77)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpose2_tpu import so3
from genpose2_tpu.config import tiny_test_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates, batch_criterion, sym_label
from genpose2_tpu.training import PoseAgent


@pytest.mark.slow
def test_e2e_score_training_recovers_pose():
    cfg = tiny_test_config()
    data = SyntheticPoseData(num_points=cfg.model.num_points, noise=0.001)
    agent = PoseAgent(cfg, "score", steps_per_epoch=50)

    key = jax.random.PRNGKey(0)
    batch = data.batch(key, 8, fixed_pose=True)
    state = agent.init_state(key, batch)

    losses = []
    for i in range(2000):
        batch = data.batch(jax.random.PRNGKey(100 + i), 16, fixed_pose=True)
        state, m = agent.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], "training did not reduce the DSM loss"

    # sample 50 candidates per object, fully on device
    test_batch = data.batch(jax.random.PRNGKey(999), 4, fixed_pose=True)
    poses = agent.sample_candidates(
        state,
        test_batch,
        jax.random.PRNGKey(7),
        repeat_num=50,
        T0=1.0,
        method="fixed",
        num_steps=100,
    )
    assert poses.shape == (4, 50, 9)

    agg = aggregate_candidates(poses, None, retain_ratio=0.4)
    sym = jnp.tile(sym_label()[None], (4, 1))
    sizes = test_batch["bbox_side_len"]
    iou, deg, sht = batch_criterion(
        agg["rotation"],
        agg["translation"],
        sizes,
        test_batch["gt_rotation"],
        test_batch["gt_translation"],
        sizes,
        sym,
    )
    deg = np.asarray(deg)
    sht = np.asarray(sht)
    # the slice recovers the pose to a few degrees / cm (random would be ~90
    # deg); thresholds leave slack for CPU-speed training budgets
    assert deg.mean() < 10.0, f"rotation error {deg}"
    assert sht.mean() < 6.0, f"translation error (cm) {sht}"
    assert float(np.asarray(iou).mean()) > 0.25, f"IoU {iou}"
