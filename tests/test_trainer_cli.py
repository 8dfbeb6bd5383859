"""Trainer-driver, augmentation, and multiplexed-tracking tests."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpose2_tpu.config import tiny_test_config
from genpose2_tpu.data.augmentation import (
    data_augment,
    defor_3d_bb,
    defor_3d_pc,
    defor_3d_rt,
)
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.training.trainer import Trainer, candidate_metrics_for_ranking
from genpose2_tpu.training import PoseAgent

CFG = tiny_test_config()


class TestAugmentation:
    def _scene(self, B=4, N=64):
        data = SyntheticPoseData(num_points=N, noise=0.0)
        b = data.batch(jax.random.PRNGKey(0), B)
        return b["cam_pts"], b["gt_rotation"], b["gt_translation"], b["bbox_side_len"], b["sym_info"]

    def test_bb_rescale_consistency(self):
        pc, R, t, s, sym = self._scene()
        aug = jnp.asarray(np.tile([1.1, 0.9, 1.05], (4, 1)), jnp.float32)
        pc2, s2, _ = defor_3d_bb(pc, jnp.zeros_like(pc), R, t, s, sym, aug)
        # object-frame extents scale by the same factors as the sizes
        obj = jnp.einsum("bji,bnj->bni", R, pc - t[:, None, :])
        obj2 = jnp.einsum("bji,bnj->bni", R, pc2 - t[:, None, :])
        ratio = np.asarray(jnp.max(jnp.abs(obj2), 1) / jnp.max(jnp.abs(obj), 1))
        np.testing.assert_allclose(ratio, np.tile([1.1, 0.9, 1.05], (4, 1)), atol=1e-4)
        np.testing.assert_allclose(np.asarray(s2 / s), np.tile([1.1, 0.9, 1.05], (4, 1)), atol=1e-5)

    def test_rt_jitter_keeps_pose_consistent(self):
        pc, R, t, s, sym = self._scene()
        aug_t = jnp.asarray(np.tile([0.01, -0.02, 0.005], (4, 1)), jnp.float32)
        from genpose2_tpu.so3.rotations import euler_zyx_to_matrix

        aug_R = jnp.tile(euler_zyx_to_matrix(jnp.asarray([0.1, -0.05, 0.2]))[None], (4, 1, 1))
        pc2, R2, t2 = defor_3d_rt(pc, R, t, aug_t, aug_R)
        # the object-frame cloud must be unchanged under the NEW gt pose
        obj_before = jnp.einsum("bji,bnj->bni", R, pc - t[:, None, :])
        obj_after = jnp.einsum("bji,bnj->bni", R2, pc2 - t2[:, None, :])
        np.testing.assert_allclose(np.asarray(obj_after), np.asarray(obj_before), atol=1e-5)

    def test_pc_jitter_magnitude(self):
        pc, R, t, s, sym = self._scene()
        pc2 = defor_3d_pc(jax.random.PRNGKey(1), pc, t, r=0.1)
        rel = np.asarray(jnp.linalg.norm(pc2 - pc, axis=-1) / jnp.linalg.norm(pc - t[:, None], axis=-1))
        assert rel.max() <= 0.1 * np.sqrt(3) + 1e-5

    def test_process_batch_wires_aug_for_nocs_batches(self):
        """Production-path gating (reference: datasets_omni6dpose.py:687-702):
        process_batch applies data_augment iff aug_params is set AND the raw
        batch is NOCS-style ('old_sym_info' present); the augmented
        cloud/pose feed the standard zero-centering tail."""
        from genpose2_tpu.data.loader import process_batch

        pc, R, t, s, sym4 = self._scene()
        raw = {
            "pcl_in": np.asarray(pc),
            "rotation": np.asarray(R),
            "translation": np.asarray(t),
            "old_sym_info": np.asarray(sym4),
            "fsnet_scale": np.asarray(s) * 0.5,
            "mean_shape": np.asarray(s) * 0.5,
        }
        params = dict(CFG.data.pts_aug_params(), aug_rt_pro=1.0, aug_bb_pro=1.0,
                      aug_pc_pro=1.0, aug_bc_pro=0.0)
        plain = process_batch(dict(raw), CFG.model.pose_mode)
        auged = process_batch(
            dict(raw), CFG.model.pose_mode, aug_params=params,
            aug_key=jax.random.PRNGKey(3),
        )
        # flags change the training batch...
        assert not np.allclose(np.asarray(plain["pts"]), np.asarray(auged["pts"]))
        assert not np.allclose(
            np.asarray(plain["gt_pose"]), np.asarray(auged["gt_pose"])
        )
        # ...consistently: zero-centering tail still holds on the augmented batch
        np.testing.assert_allclose(
            np.asarray(jnp.mean(auged["zero_mean_pts"][..., :3], axis=1)),
            0.0, atol=1e-5,
        )
        # non-NOCS batches are untouched even with aug_params set
        raw2 = {k: raw[k] for k in ("pcl_in", "rotation", "translation")}
        same = process_batch(
            dict(raw2), CFG.model.pose_mode, aug_params=params,
            aug_key=jax.random.PRNGKey(3),
        )
        np.testing.assert_allclose(
            np.asarray(same["pts"]), np.asarray(plain["pts"]), atol=0
        )

    def test_trainer_prepare_applies_nocs_aug(self):
        """Trainer._prepare (the production train path) routes cfg.data's aug
        probabilities into process_batch for NOCS-style raw batches."""
        pc, R, t, s, sym4 = self._scene()
        raw = {
            "pcl_in": np.asarray(pc),
            "rotation": np.asarray(R),
            "translation": np.asarray(t),
            "old_sym_info": np.asarray(sym4),
            "fsnet_scale": np.asarray(s) * 0.5,
            "mean_shape": np.asarray(s) * 0.5,
        }
        import dataclasses

        cfg = dataclasses.replace(
            CFG,
            data=dataclasses.replace(CFG.data, aug_rt_pro=1.0, aug_pc_pro=1.0),
        )
        tr = Trainer(cfg, "score", steps_per_epoch=1)
        out = tr._prepare(dict(raw), jax.random.PRNGKey(5))
        assert not np.allclose(np.asarray(out["pts"]), np.asarray(pc))

    def test_full_stack_runs(self):
        pc, R, t, s, sym = self._scene()
        params = {"aug_pc_pro": 1.0, "aug_pc_r": 0.05, "aug_rt_pro": 1.0,
                  "aug_bb_pro": 1.0, "aug_bc_pro": 0.0}
        pc2, R2, t2, s2 = data_augment(
            jax.random.PRNGKey(2), params, pc, R, t, s, sym
        )
        assert np.isfinite(np.asarray(pc2)).all()
        # gt pose still valid rotations
        RtR = np.einsum("bij,bik->bjk", np.asarray(R2), np.asarray(R2))
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)


class TestTrainerDriver:
    def test_score_fit_with_eval_and_ckpt(self, tmp_path):
        data = SyntheticPoseData(num_points=CFG.model.num_points)
        cfg = CFG.replace(train=CFG.train.__class__(batch_size=8, repeat_num=2, eval_freq=2, n_epochs=2))
        trainer = Trainer(cfg, "score", steps_per_epoch=5, log_dir=str(tmp_path))
        batch0 = data.batch(jax.random.PRNGKey(0), 8)
        trainer.init(jax.random.PRNGKey(0), batch0)

        evals = []

        def loader_fn(epoch):
            for i in range(5):
                yield data.batch(jax.random.PRNGKey(epoch * 100 + i), 8)

        def eval_fn(state, epoch):
            evals.append(epoch)
            return {"eval_marker": epoch}

        state = trainer.fit(loader_fn, epochs=2, eval_fn=eval_fn)
        assert int(state.step) == 10
        assert evals == [2]
        assert os.path.exists(tmp_path / "ckpt" / "final")
        assert os.path.exists(tmp_path / "score_metrics.jsonl")

    def test_energy_with_ranking_epoch(self):
        data = SyntheticPoseData(num_points=CFG.model.num_points)
        score_agent = PoseAgent(CFG, "score", 10)
        b0 = data.batch(jax.random.PRNGKey(0), 4)
        score_state = score_agent.init_state(jax.random.PRNGKey(0), b0)
        trainer = Trainer(
            CFG, "energy_with_ranking", 10, log_dir="/tmp/gp2_test_energy",
            frozen_score=(score_agent, score_state),
        )
        trainer.init(jax.random.PRNGKey(1), b0)

        def batches():
            for i in range(2):
                yield data.batch(jax.random.PRNGKey(i), 4)

        metrics = trainer.train_epoch(batches(), 1, jax.random.PRNGKey(2))
        assert "ranking_loss" in metrics
        assert np.isfinite(float(metrics["loss"]))

    def test_candidate_metrics_shapes(self):
        data = SyntheticPoseData(num_points=CFG.model.num_points)
        agent = PoseAgent(CFG, "score", 10)
        b = data.batch(jax.random.PRNGKey(0), 4)
        state = agent.init_state(jax.random.PRNGKey(0), b)
        cand, met = candidate_metrics_for_ranking(agent, state, b, jax.random.PRNGKey(1), 5)
        assert cand.shape == (4, 5, 9)
        assert met.shape == (4, 5, 2)
        assert np.isfinite(np.asarray(met)).all()


class TestMultiplexedTracking:
    def test_two_videos_multiplexed(self, tmp_path):
        # reuse the on-disk video fixture machinery
        from tests.test_bop_tracking_data import video_root  # noqa: F401
        import tests.test_bop_tracking_data as tb
        from genpose2_tpu.config import DataConfig
        from genpose2_tpu.data.tracking import open_video_datasets
        from genpose2_tpu.eval.tracking import PoseTracker
        from genpose2_tpu.eval.tracking_multiplex import (
            track_videos_multiplexed,
            tracking_metrics,
        )

        # fabricate two videos via the fixture builder
        import pytest as _pytest

        class FakeFactory:
            def __init__(self, base):
                self.base = base

            def mktemp(self, name):
                p = self.base / name
                os.makedirs(p, exist_ok=True)
                return p

        root = tb.video_root.__wrapped__(FakeFactory(tmp_path))
        cfg = DataConfig(num_points=CFG.model.num_points, img_size=64)
        videos = open_video_datasets(cfg, root)
        assert len(videos) == 1

        data = SyntheticPoseData(num_points=CFG.model.num_points)
        agent = PoseAgent(CFG, "score", 10)
        b0 = data.batch(jax.random.PRNGKey(0), 2)
        state = agent.init_state(jax.random.PRNGKey(0), b0)
        tracker = PoseTracker(CFG, agent, state, T0=0.5, num_steps=10)
        results = track_videos_multiplexed(
            tracker, videos, jax.random.PRNGKey(0), object_budget=4
        )
        assert len(results) == 1
        assert len(results[0]) == 3  # 3 frames
        m = tracking_metrics(results)
        assert np.isfinite(m.deg_mean)


class TestDistillation:
    def test_distilled_step_and_trainer_path(self):
        data = SyntheticPoseData(num_points=CFG.model.num_points)
        teacher = PoseAgent(CFG, "score", 10)
        b0 = data.batch(jax.random.PRNGKey(0), 4)
        t_state = teacher.init_state(jax.random.PRNGKey(0), b0)
        # brief teacher training so its score is nonzero
        for i in range(50):
            t_state, _ = teacher.train_step(t_state, b0, jax.random.PRNGKey(i))

        cfg = CFG.replace(train=CFG.train.__class__(batch_size=4, repeat_num=2, distillation=True))
        trainer = Trainer(cfg, "score", 10, log_dir="/tmp/gp2_test_distill",
                          frozen_score=(teacher, t_state))
        trainer.init(jax.random.PRNGKey(1), b0)
        metrics = trainer.train_epoch([b0, b0], 1, jax.random.PRNGKey(2))
        assert "distill_loss" in metrics
        assert np.isfinite(float(metrics["loss"]))
        # student trained toward the teacher's (nonzero) score field: a second
        # epoch must keep the loss finite and the params updated
        p0 = jax.tree.leaves(trainer.state.params)[0]
        trainer.train_epoch([b0], 2, jax.random.PRNGKey(3))
        p1 = jax.tree.leaves(trainer.state.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))


class TestTrajectory:
    def test_fixed_sampler_returns_trajectory(self):
        from genpose2_tpu.diffusion import init_sde, ode_sampler

        sde = init_sde("ve")
        mu = jnp.zeros((6,))

        def score_fn(x, t):
            _, std = sde.marginal_prob(None, t)
            return -(x - mu) / (std ** 2)

        final, traj = ode_sampler(
            jax.random.PRNGKey(0), score_fn, sde, 4, 6, pose_mode="euler_xyz",
            method="fixed", num_steps=30, return_trajectory=True,
        )
        assert traj.shape == (30, 4, 6)
        # trajectory converges toward the final pose
        d_first = np.abs(np.asarray(traj[0, :, -3:])).mean()
        d_last = np.abs(np.asarray(traj[-1, :, -3:])).mean()
        assert d_last < d_first


class TestEvalHook:
    def test_sampling_eval_fn(self, tmp_path):
        from genpose2_tpu.training.eval_hooks import make_sampling_eval_fn

        data = SyntheticPoseData(num_points=CFG.model.num_points)
        agent = PoseAgent(CFG, "score", 10)
        b0 = data.batch(jax.random.PRNGKey(0), 4)
        state = agent.init_state(jax.random.PRNGKey(0), b0)
        eval_fn = make_sampling_eval_fn(
            agent, CFG, lambda epoch: data.batch(jax.random.PRNGKey(epoch), 4),
            log_dir=str(tmp_path), repeat_num=4, num_steps=10,
        )
        scalars = eval_fn(state, 1)
        assert "eval_deg_mean" in scalars and np.isfinite(scalars["eval_deg_mean"])
        assert os.path.exists(tmp_path / "eval_img" / "epoch_1.png")


class TestScannedTrainerAndMesh:
    def _cfg(self, **train_kw):
        import dataclasses
        return CFG.replace(train=dataclasses.replace(CFG.train, **train_kw))

    def test_scan_chunk_equals_stepwise(self, tmp_path):
        """The scanned device-resident epoch must produce the same state as
        the per-step dispatch path (same batches, same keys)."""
        data = SyntheticPoseData(num_points=CFG.model.num_points)

        def run(chunk):
            cfg = self._cfg(batch_size=4, repeat_num=2, scan_chunk=chunk)
            tr = Trainer(cfg, "score", steps_per_epoch=6,
                         log_dir=str(tmp_path / f"c{chunk}"))
            b0 = data.batch(jax.random.PRNGKey(0), 4)
            tr.init(jax.random.PRNGKey(0), b0)
            batches = [data.batch(jax.random.PRNGKey(10 + i), 4) for i in range(6)]
            tr.train_epoch(iter(batches), 1, jax.random.PRNGKey(7))
            return tr.state

        s1 = run(1)
        s3 = run(3)
        assert int(s1.step) == int(s3.step) == 6
        # same total work; parameters close (keys are folded per-dispatch so
        # noise draws differ — compare magnitudes not exact equality)
        n1 = float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x**2), s1.params, 0.0))
        n3 = float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x**2), s3.params, 0.0))
        assert abs(n1 - n3) / max(n1, 1e-9) < 0.2

    def test_mesh_trainer_epoch(self, tmp_path):
        """CLI-reachable data-parallel path: 8 virtual CPU devices, scanned
        chunks sharded on the 'data' axis."""
        from genpose2_tpu.parallel.mesh import make_mesh

        assert len(jax.devices()) >= 8
        mesh = make_mesh(data=8, cand=1)
        data = SyntheticPoseData(num_points=CFG.model.num_points)
        cfg = self._cfg(batch_size=16, repeat_num=2, scan_chunk=2)
        tr = Trainer(cfg, "score", steps_per_epoch=4,
                     log_dir=str(tmp_path), mesh=mesh)
        b0 = data.batch(jax.random.PRNGKey(0), 16)
        tr.init(jax.random.PRNGKey(0), b0)
        batches = [data.batch(jax.random.PRNGKey(i), 16) for i in range(4)]
        metrics = tr.train_epoch(iter(batches), 1, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(tr.state.step) == 4

    def test_resume_from_checkpoint(self, tmp_path):
        data = SyntheticPoseData(num_points=CFG.model.num_points)
        cfg = self._cfg(batch_size=4, repeat_num=2, n_epochs=2, eval_freq=100)

        def loader_fn(epoch):
            for i in range(3):
                yield data.batch(jax.random.PRNGKey(epoch * 100 + i), 4)

        tr = Trainer(cfg, "score", steps_per_epoch=3, log_dir=str(tmp_path / "a"))
        tr.init(jax.random.PRNGKey(0), data.batch(jax.random.PRNGKey(0), 4))
        tr.fit(loader_fn, epochs=1)
        ckpt = os.path.join(str(tmp_path / "a"), "ckpt", "final")
        assert os.path.exists(ckpt)

        # resume: restored step -> training continues at epoch 2
        tr2 = Trainer(cfg, "score", steps_per_epoch=3,
                      log_dir=str(tmp_path / "b"), resume_from=ckpt)
        tr2.init(jax.random.PRNGKey(5), data.batch(jax.random.PRNGKey(0), 4))
        assert int(tr2.state.step) == 3  # restored, not fresh
        state = tr2.fit(loader_fn, epochs=2)
        assert int(state.step) == 6  # only epoch 2 ran


class TestZeroInitAllHeads:
    """zero_init_energy_heads must zero the output layer of WHICHEVER
    regression head is configured (reference: energynet.py:129-148), not just
    the named Rx_Ry_and_T fusion tails."""

    @pytest.mark.parametrize("head", ["RT", "R_and_T", "Rx_Ry_and_T"])
    def test_energy_is_zero_after_reinit(self, head):
        import dataclasses

        from genpose2_tpu.training.trainer import zero_init_energy_heads

        cfg = CFG.replace(model=dataclasses.replace(CFG.model, regression_head=head))
        data = SyntheticPoseData(num_points=cfg.model.num_points)
        agent = PoseAgent(cfg, "energy", 10)
        b = data.batch(jax.random.PRNGKey(0), 4)
        state = agent.init_state(jax.random.PRNGKey(0), b)
        # simulate loading non-zero score weights into every leaf
        # (get_energy reads the EMA params, zero_init_energy_heads sets both)
        nonzero = jax.tree.map(lambda x: x + 0.05, state.params)
        dirty = state.replace(params=nonzero, ema_params=nonzero)
        poses = jnp.ones((4, 2, 9))
        e_dirty = np.asarray(agent.get_energy(dirty, b, poses))
        assert np.abs(e_dirty).max() > 0  # heads really were non-zero

        clean = zero_init_energy_heads(dirty)
        e = np.asarray(agent.get_energy(clean, b, poses))
        # IP energy = <pose, f_theta/std>; zeroed head output => exactly 0
        np.testing.assert_array_equal(e, np.zeros_like(e))

        # the pose trunk (MLP_0) and t-embed Dense keep their loaded weights
        trunk_before = jax.tree_util.tree_leaves(dirty.params["pose_net"]["MLP_0"])
        trunk_after = jax.tree_util.tree_leaves(clean.params["pose_net"]["MLP_0"])
        for x, y in zip(trunk_before, trunk_after):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
