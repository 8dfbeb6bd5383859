"""Training-agent tests: a tiny score agent learns a synthetic pose
distribution (loss decreases, sampled poses approach GT), EMA/NaN-guard/LR
behaviors, energy agent second-order step, scale agent regression,
checkpoint roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpose2_tpu.config import tiny_test_config
from genpose2_tpu.so3 import matrix_to_rot6d_cols
from genpose2_tpu.training import PoseAgent
from genpose2_tpu.training.agent import ScaleAgent, make_lr_schedule
from genpose2_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from genpose2_tpu.training.ranking import ranking_loss, sort_poses_by_energy, sort_results

CFG = tiny_test_config()


def synthetic_batch(key, B=4, N=128):
    """Clouds drawn from a fixed object rotated by a fixed pose."""
    k1, k2 = jax.random.split(key)
    pts = jax.random.normal(k1, (B, N, 3)) * 0.1
    gt_pose = jnp.tile(
        jnp.concatenate(
            [matrix_to_rot6d_cols(jnp.eye(3)), jnp.asarray([0.05, -0.02, 0.01])]
        )[None],
        (B, 1),
    )
    return {
        "pts": pts,
        "zero_mean_gt_pose": gt_pose,
        "pts_center": jnp.zeros((B, 3)),
    }


class TestScoreAgent:
    def test_loss_decreases(self):
        agent = PoseAgent(CFG, "score", steps_per_epoch=10)
        key = jax.random.PRNGKey(0)
        batch = synthetic_batch(key)
        state = agent.init_state(key, batch)
        losses = []
        for i in range(30):
            state, metrics = agent.train_step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_sample_candidates_shape(self):
        agent = PoseAgent(CFG, "score", steps_per_epoch=10)
        key = jax.random.PRNGKey(0)
        batch = synthetic_batch(key)
        state = agent.init_state(key, batch)
        poses = agent.sample_candidates(
            state, batch, key, repeat_num=4, T0=1.0, method="fixed", num_steps=20
        )
        assert poses.shape == (4, 4, 9)
        a1 = np.asarray(poses)[..., :3]
        np.testing.assert_allclose(np.linalg.norm(a1, axis=-1), 1.0, atol=1e-4)

    def test_nan_guard_skips_update(self):
        agent = PoseAgent(CFG, "score", steps_per_epoch=10)
        key = jax.random.PRNGKey(0)
        batch = synthetic_batch(key)
        state = agent.init_state(key, batch)
        bad = dict(batch)
        bad["zero_mean_gt_pose"] = batch["zero_mean_gt_pose"] * jnp.nan
        new_state, metrics = agent.train_step(state, bad, key)
        assert not np.isfinite(float(metrics["loss"]))
        # params unchanged
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
        )
        assert max(jax.tree.leaves(diff)) == 0.0
        assert int(new_state.step) == int(state.step) + 1

    def test_ema_tracks_params(self):
        agent = PoseAgent(CFG, "score", steps_per_epoch=10)
        key = jax.random.PRNGKey(0)
        batch = synthetic_batch(key)
        state = agent.init_state(key, batch)
        for i in range(3):
            state, _ = agent.train_step(state, batch, jax.random.PRNGKey(i))
        # early EMA decay is (1+n)/(10+n), so EMA moves fast toward params
        p = jax.tree.leaves(state.params)[0]
        e = jax.tree.leaves(state.ema_params)[0]
        assert np.isfinite(np.asarray(e)).all()
        assert float(state.ema_updates) == 3.0


class TestLRSchedule:
    def test_warmup_and_decay(self):
        sched = make_lr_schedule(CFG, steps_per_epoch=100)
        lr0 = float(sched(0))
        lr_mid = float(sched(50))
        lr_warm = float(sched(200))
        assert lr0 < lr_mid < lr_warm
        assert abs(lr_warm - CFG.train.lr * 0.98**2) < 1e-8
        # floor
        assert float(sched(100 * 100000)) >= 1e-4 - 1e-9


class TestEnergyAgent:
    def test_energy_train_step_with_ranking(self):
        agent = PoseAgent(CFG, "energy", steps_per_epoch=10)
        key = jax.random.PRNGKey(0)
        batch = synthetic_batch(key)
        state = agent.init_state(key, batch)
        B, K = 4, 5
        batch = dict(batch)
        batch["candidate_poses"] = jax.random.normal(key, (B, K, 9)) * 0.1
        batch["candidate_metrics"] = jax.random.uniform(key, (B, K, 2))
        state, metrics = agent.train_step(state, batch, key)
        assert np.isfinite(float(metrics["loss"]))
        assert "ranking_loss" in metrics

    def test_get_energy_shape(self):
        agent = PoseAgent(CFG, "energy", steps_per_epoch=10)
        key = jax.random.PRNGKey(0)
        batch = synthetic_batch(key)
        state = agent.init_state(key, batch)
        poses = jax.random.normal(key, (4, 6, 9))
        e = agent.get_energy(state, batch, poses)
        assert e.shape == (4, 6, 2)


class TestRanking:
    def test_ranking_loss_ordering(self):
        # well-ordered energies (descending) -> low loss; inverted -> high
        good = jnp.asarray([[[10.0, 10], [5, 5], [1, 1]]])
        bad = jnp.asarray([[[1.0, 1], [5, 5], [10, 10]]])
        assert float(ranking_loss(good)) < float(ranking_loss(bad))

    def test_reference_golden_value(self):
        # reference: reward.py:158-164 test_ranking_loss fixture
        energy = jnp.asarray([[[100.0, 100], [9, 9], [8, 8], [10, 10]]])
        loss = float(ranking_loss(energy))
        # pairs: (0,1)+, (0,2)+, (0,3)+, (1,2)+, (1,3)-, (2,3)-  -> 2/6 * 2 = 0.667
        assert abs(loss - 2.0 / 3.0) < 1e-3

    def test_sort_results(self):
        energy = jnp.asarray([[[1.0, 10], [2, 20], [3, 30]]])
        metrics = jnp.asarray([[[0.3, 0.1], [0.1, 0.3], [0.2, 0.2]]])
        out = np.asarray(sort_results(energy, metrics))
        np.testing.assert_allclose(out[0, :, 0], [2, 3, 1])  # by rot error asc
        np.testing.assert_allclose(out[0, :, 1], [10, 30, 20])  # by trans error asc

    def test_sort_poses_by_energy_decoupled(self):
        poses = jnp.asarray(
            [[[1.0] * 6 + [1, 1, 1], [2.0] * 6 + [2, 2, 2], [3.0] * 6 + [3, 3, 3]]]
        )
        energy = jnp.asarray([[[1.0, 3], [2, 2], [3, 1]]])
        sp, se = sort_poses_by_energy(poses, energy)
        sp = np.asarray(sp)
        np.testing.assert_allclose(sp[0, :, 0], [3, 2, 1])  # rot from rot-energy order
        np.testing.assert_allclose(sp[0, :, -1], [1, 2, 3])  # trans from trans order
        np.testing.assert_allclose(np.asarray(se)[0, :, 0], [3, 2, 1])


class TestScaleAgent:
    def test_learns_constant_scale(self):
        agent = ScaleAgent(CFG, steps_per_epoch=10)
        key = jax.random.PRNGKey(0)
        state = agent.init_state(key, pts_dim=64)
        batch = {
            "pts_feat": jax.random.normal(key, (8, 64)),
            "axes_training": jnp.tile(jnp.eye(3), (8, 4, 1, 1)),
            "gt_length": jnp.tile(jnp.asarray([[0.1, 0.2, 0.3]]), (8, 1)),
        }
        losses = []
        for i in range(50):
            state, m = agent.train_step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.1
        pred = agent.predict(state, batch["pts_feat"], batch["axes_training"][:, 0])
        np.testing.assert_allclose(
            np.asarray(pred).mean(0), [0.1, 0.2, 0.3], atol=0.05
        )


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        agent = PoseAgent(CFG, "score", steps_per_epoch=10)
        key = jax.random.PRNGKey(0)
        batch = synthetic_batch(key)
        state = agent.init_state(key, batch)
        state, _ = agent.train_step(state, batch, key)
        path = save_checkpoint(str(tmp_path / "ckpt"), state)
        restored = load_checkpoint(path, state)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)


class TestTrainSteps:
    def test_scan_matches_sequential(self):
        """train_steps (scanned) == the same train_step calls in a loop."""
        from genpose2_tpu.config import tiny_test_config
        from genpose2_tpu.data.synthetic import SyntheticPoseData

        cfg = tiny_test_config()
        agent = PoseAgent(cfg, "score", steps_per_epoch=10)
        data = SyntheticPoseData(num_points=cfg.model.num_points)
        key = jax.random.PRNGKey(0)
        b0 = data.batch(key, 4)
        keep = ("pts", "zero_mean_gt_pose", "pts_center")
        b0 = {k: b0[k] for k in keep}
        state = agent.init_state(key, b0)

        S = 3
        batches = [
            {k: v for k, v in data.batch(jax.random.PRNGKey(i), 4).items() if k in keep}
            for i in range(S)
        ]
        stacked = {k: jnp.stack([b[k] for b in batches]) for k in keep}

        scan_state, scan_metrics = agent.train_steps(state, stacked, jax.random.PRNGKey(5))

        seq_state = state
        keys = jax.random.split(jax.random.PRNGKey(5), S)
        seq_losses = []
        for i in range(S):
            seq_state, m = agent.train_step(seq_state, batches[i], keys[i])
            seq_losses.append(float(m["loss"]))

        np.testing.assert_allclose(
            np.asarray(scan_metrics["loss"]), np.asarray(seq_losses), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(scan_state.step), np.asarray(seq_state.step)
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            ),
            scan_state.params,
            seq_state.params,
        )
