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


class TestEDMEndToEnd:
    """sde 'edm' + sampler 'edm' (VERDICT r2 #8): the score agent becomes the
    EDM-preconditioned PoseDecoderNet trained with edm_loss, sampled with the
    Karras-Heun sampler (reference: configs/config.py:28-31 sampler_mode list,
    scorenet.py:278-424, samplers.py:261-340, losses.py:8-45)."""

    def _edm_cfg(self):
        import dataclasses

        cfg = tiny_test_config()
        # same reasoning as the tiny config's VE sigma_max=2.0: the reference
        # sigma_max=80 needs far more training than a CPU unit-test budget
        # before large-sigma denoising is accurate enough to pull the
        # trajectory onto the data scale (full-size runs keep 80)
        return cfg.replace(
            sde=dataclasses.replace(cfg.sde, mode="edm", edm_sigma_max=2.0)
        )

    def test_decoder_agent_builds_and_trains(self):
        cfg = self._edm_cfg()
        data = SyntheticPoseData(num_points=cfg.model.num_points)
        agent = PoseAgent(cfg, "score", 10)
        assert agent.use_decoder
        batch = data.batch(jax.random.PRNGKey(0), 8, fixed_pose=True)
        state = agent.init_state(jax.random.PRNGKey(0), batch)
        losses = []
        for i in range(30):
            b = data.batch(jax.random.PRNGKey(100 + i), 8, fixed_pose=True)
            state, m = agent.train_step(state, b, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], "EDM denoiser loss did not decrease"

    def test_edm_sampling_shapes_and_score_fallback(self):
        cfg = self._edm_cfg()
        data = SyntheticPoseData(num_points=cfg.model.num_points)
        agent = PoseAgent(cfg, "score", 10)
        batch = data.batch(jax.random.PRNGKey(0), 4, fixed_pose=True)
        state = agent.init_state(jax.random.PRNGKey(0), batch)
        poses = agent.sample_candidates(
            state, batch, jax.random.PRNGKey(1), repeat_num=6,
            method="edm", num_steps=18,
        )
        assert poses.shape == (4, 6, 9)
        assert np.isfinite(np.asarray(poses)).all()
        # the denoiser-derived score field also drives the generic ODE path
        poses_ode = agent.sample_candidates(
            state, batch, jax.random.PRNGKey(2), repeat_num=3,
            T0=1.0, method="fixed", num_steps=10,
        )
        assert poses_ode.shape == (4, 3, 9)
        assert np.isfinite(np.asarray(poses_ode)).all()

    @pytest.mark.slow
    def test_edm_training_recovers_pose(self):
        cfg = self._edm_cfg()
        data = SyntheticPoseData(num_points=cfg.model.num_points, noise=0.001)
        agent = PoseAgent(cfg, "score", 50)
        key = jax.random.PRNGKey(0)
        batch = data.batch(key, 8, fixed_pose=True)
        state = agent.init_state(key, batch)
        for i in range(1500):
            b = data.batch(jax.random.PRNGKey(100 + i), 16, fixed_pose=True)
            state, m = agent.train_step(state, b, jax.random.PRNGKey(i))
        test_batch = data.batch(jax.random.PRNGKey(999), 4, fixed_pose=True)
        poses = agent.sample_candidates(
            state, test_batch, jax.random.PRNGKey(7),
            repeat_num=50, method="edm", num_steps=18,
        )
        agg = aggregate_candidates(poses, None, retain_ratio=0.4)
        sym = jnp.tile(sym_label()[None], (4, 1))
        sizes = test_batch["bbox_side_len"]
        iou, deg, sht = batch_criterion(
            agg["rotation"], agg["translation"], sizes,
            test_batch["gt_rotation"], test_batch["gt_translation"], sizes, sym,
        )
        deg = np.asarray(deg)
        assert deg.mean() < 15.0, f"EDM rotation error {deg}"
        assert np.asarray(sht).mean() < 8.0, f"EDM translation error {np.asarray(sht)}"
