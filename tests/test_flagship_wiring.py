"""End-to-end flagship (pointwise-DINO) wiring: PIXELS -> frozen DinoV3 ViT ->
ImgEncoder fusion -> per-point gather -> fused PointNet++ -> score heads,
through the production agent entry points (train_step / extract_features /
sample_candidates / get_energy). The reference computes DINO features inside
every forward pass (reference: networks/posenet.py:127-228); here the agent's
ImageFeatureProvider does it once per step from batch['roi_rgb']."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from genpose2_tpu.config import tiny_flagship_config
from genpose2_tpu.data.loader import process_batch
from genpose2_tpu.models.provider import PROVIDER_KEY
from genpose2_tpu.training.agent import PoseAgent


def pixel_batch(B=2, N=128, S=64, seed=0):
    rng = np.random.default_rng(seed)
    R = ScipyRot.random(B, random_state=seed).as_matrix().astype(np.float32)
    t = np.tile(np.array([0.0, 0.0, 0.6], np.float32), (B, 1))
    batch = {
        "pcl_in": (rng.normal(0, 0.05, (B, N, 3)) + t[:, None]).astype(np.float32),
        "rotation": R,
        "translation": t,
        "roi_rgb": rng.normal(size=(B, S, S, 3)).astype(np.float32),
        "roi_xs": rng.integers(0, S, (B, N)).astype(np.int32),
        "roi_ys": rng.integers(0, S, (B, N)).astype(np.int32),
        "roi_center_dir": np.tile(np.array([0.0, 0.0, 1.0], np.float32), (B, 1)),
    }
    return process_batch(batch)


class TestFlagshipWiring:
    def test_train_step_from_pixels(self):
        cfg = tiny_flagship_config()
        agent = PoseAgent(cfg, "score", 10)
        batch = pixel_batch()
        state = agent.init_state(jax.random.PRNGKey(0), batch)
        assert PROVIDER_KEY in state.constants  # backbone rides in the state
        state, metrics = agent.train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # backbone params are NOT optimized (not in params at all)
        assert "img_encoder" in state.params  # the trainable fusion IS

    def test_sample_candidates_from_pixels(self):
        cfg = tiny_flagship_config()
        agent = PoseAgent(cfg, "score", 10)
        batch = pixel_batch()
        state = agent.init_state(jax.random.PRNGKey(0), batch)
        poses = agent.sample_candidates(
            state, batch, jax.random.PRNGKey(2), repeat_num=4, T0=0.55,
            method="fixed", num_steps=10,
        )
        assert poses.shape == (2, 4, 9)
        assert np.isfinite(np.asarray(poses)).all()

    def test_pixels_match_precomputed_features(self):
        """The provider path must equal handing the same features in the
        batch (the interchangeable-provider contract)."""
        cfg = tiny_flagship_config()
        agent = PoseAgent(cfg, "score", 10)
        batch = pixel_batch()
        state = agent.init_state(jax.random.PRNGKey(0), batch)
        withf = agent.with_image_features(state, batch)
        assert "dino_layers" in withf
        f_pix, _ = agent.extract_features(state, batch)
        f_pre, _ = agent.extract_features(state, withf)
        np.testing.assert_allclose(np.asarray(f_pix), np.asarray(f_pre), atol=1e-6)

    def test_energy_agent_from_pixels(self):
        cfg = tiny_flagship_config()
        agent = PoseAgent(cfg, "energy", 10)
        batch = pixel_batch()
        state = agent.init_state(jax.random.PRNGKey(0), batch)
        poses = jnp.zeros((2, 3, 9)).at[..., :6].set(1.0)
        e = agent.get_energy(state, batch, poses)
        assert e.shape == (2, 3, 2)
        assert np.isfinite(np.asarray(e)).all()

    def test_global_mode_from_pixels(self):
        import dataclasses

        cfg = tiny_flagship_config()
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, dino="global"))
        agent = PoseAgent(cfg, "score", 10)
        batch = pixel_batch()
        state = agent.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = agent.train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        poses = agent.sample_candidates(
            state, batch, jax.random.PRNGKey(2), repeat_num=3, T0=0.55,
            method="fixed", num_steps=5,
        )
        assert poses.shape == (2, 3, 9)
        assert np.isfinite(np.asarray(poses)).all()

    def test_checkpoint_roundtrip_keeps_backbone(self, tmp_path):
        from genpose2_tpu.training.checkpoint import load_checkpoint, save_checkpoint

        cfg = tiny_flagship_config()
        agent = PoseAgent(cfg, "score", 10)
        batch = pixel_batch()
        state = agent.init_state(jax.random.PRNGKey(0), batch)
        path = save_checkpoint(str(tmp_path / "ckpt"), state, "t")
        restored = load_checkpoint(path, state)
        a = jax.tree_util.tree_leaves(state.constants[PROVIDER_KEY])
        b = jax.tree_util.tree_leaves(restored.constants[PROVIDER_KEY])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestSingleBackboneRunPerBatch:
    """Round-3 hoist (VERDICT r2 #2): one frozen-ViT forward and one score-
    encoder forward per eval/tracking batch, shared by sampler, energy and
    ScaleNet stages."""

    def _counting(self, monkeypatch):
        from genpose2_tpu.models.provider import ImageFeatureProvider

        calls = {"n": 0}
        orig = ImageFeatureProvider.patch_features

        def counted(self, variables, rgb):
            calls["n"] += 1
            return orig(self, variables, rgb)

        monkeypatch.setattr(ImageFeatureProvider, "patch_features", counted)
        return calls

    def test_streaming_eval_runs_backbone_once(self, monkeypatch):
        from genpose2_tpu.eval import sym_label
        from genpose2_tpu.eval.pipeline import SingleFrameEvaluator
        from genpose2_tpu.training.agent import ScaleAgent

        cfg = tiny_flagship_config()
        score = PoseAgent(cfg, "score", 10)
        energy = PoseAgent(cfg, "energy", 10)
        batch = pixel_batch()
        # GT fields the criterion stage consumes
        batch["bbox_side_len"] = np.full((2, 3), 0.1, np.float32)
        batch["sym_info"] = np.tile(np.asarray(sym_label())[None], (2, 1))
        batch["class_label"] = np.zeros((2,), np.int32)
        ss = score.init_state(jax.random.PRNGKey(0), batch)
        es = energy.init_state(jax.random.PRNGKey(1), batch)
        sc = ScaleAgent(cfg, 10)
        pts_dim = int(score.extract_features(ss, batch)[0].shape[-1])
        scs = sc.init_state(jax.random.PRNGKey(2), pts_dim=pts_dim)

        def scale_fn(b, R, t, pts_feat=None):
            assert pts_feat is not None, "eval must pass the hoisted features"
            return sc.predict(scs, pts_feat, R)

        calls = self._counting(monkeypatch)
        ev = SingleFrameEvaluator(cfg, score, ss, energy, es, scale_fn=scale_fn)
        m = ev.run_streaming(iter([batch]), key=jax.random.PRNGKey(3))
        assert calls["n"] == 1, f"backbone ran {calls['n']}x for one batch"
        assert np.isfinite(m.deg_mean)

    def test_tracking_step_runs_backbone_once(self, monkeypatch):
        from genpose2_tpu.eval.tracking import PoseTracker

        cfg = tiny_flagship_config()
        score = PoseAgent(cfg, "score", 10)
        energy = PoseAgent(cfg, "energy", 10)
        batch = pixel_batch()
        ss = score.init_state(jax.random.PRNGKey(0), batch)
        es = energy.init_state(jax.random.PRNGKey(1), batch)
        calls = self._counting(monkeypatch)
        tracker = PoseTracker(cfg, score, ss, energy, es, num_steps=5)
        prev = tracker.init_from_gt(
            jax.random.PRNGKey(2), batch["gt_rotation"], batch["gt_translation"]
        )
        out = tracker.step(batch, prev, jax.random.PRNGKey(3))
        assert calls["n"] == 1, f"backbone ran {calls['n']}x for one frame"
        assert np.isfinite(np.asarray(out["rotation"])).all()

    def test_sample_candidates_features_arg_parity(self):
        cfg = tiny_flagship_config()
        agent = PoseAgent(cfg, "score", 10)
        batch = pixel_batch()
        state = agent.init_state(jax.random.PRNGKey(0), batch)
        feats = agent.extract_features(state, batch)
        kw = dict(repeat_num=3, T0=0.55, method="fixed", num_steps=5)
        a = agent.sample_candidates(state, batch, jax.random.PRNGKey(2), **kw)
        b = agent.sample_candidates(
            state, batch, jax.random.PRNGKey(2), features=feats, **kw
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
