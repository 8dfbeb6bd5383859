"""Library-style inference API: the GenPose2-class equivalent.

reference: runners/infer.py:34-310 — bundles the score / energy / scale agents
behind one ``inference(frame, prev_pose, tracking)`` call with single-frame
(T0=0.55) and tracking (T0=0.15 warm-start) modes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpose2_tpu.config import Config, default_config
from genpose2_tpu.data.infer_dataset import frame_to_object_batch
from genpose2_tpu.data.loader import process_batch
from genpose2_tpu.eval.aggregate import aggregate_candidates, analytic_bbox_lengths
from genpose2_tpu.so3.rotations import matrix_to_rot6d_cols
from genpose2_tpu.training.agent import PoseAgent, ScaleAgent
from genpose2_tpu.training.checkpoint import load_params_only


class GenPose2TPU:
    """End-user inference over raw RGB-D frames.

    Typical use (reference: runners/infer.py:362-405 demo loop):

        engine = GenPose2TPU(cfg, score_ckpt, energy_ckpt, scale_ckpt)
        result = engine.inference(frame)                      # detection mode
        result = engine.inference(frame, prev_pose=result["prev_pose"],
                                  tracking=True)              # video mode
    """

    def __init__(
        self,
        cfg: Optional[Config] = None,
        score_ckpt: Optional[str] = None,
        energy_ckpt: Optional[str] = None,
        scale_ckpt: Optional[str] = None,
        single_T0: float = 0.55,
        tracking_T0: float = 0.15,
        num_steps: int = 100,
    ):
        self.cfg = cfg or default_config()
        self.single_T0 = single_T0
        self.tracking_T0 = tracking_T0
        self.num_steps = num_steps
        key = jax.random.PRNGKey(0)

        self.score_agent = PoseAgent(self.cfg, "score")
        dummy = self._dummy_batch()
        self.score_state = self.score_agent.init_state(key, dummy)
        if score_ckpt:
            self.score_state = load_params_only(score_ckpt, self.score_state, cfg=self.cfg, provider=self.score_agent.provider)

        self.energy_agent = self.energy_state = None
        if energy_ckpt is not None:
            self.energy_agent = PoseAgent(self.cfg, "energy")
            self.energy_state = self.energy_agent.init_state(key, dummy)
            if isinstance(energy_ckpt, str):
                self.energy_state = load_params_only(energy_ckpt, self.energy_state, cfg=self.cfg, provider=self.energy_agent.provider)

        self.scale_agent = self.scale_state = None
        if scale_ckpt is not None:
            self.scale_agent = ScaleAgent(self.cfg)
            self.scale_state = self.scale_agent.init_state(key)
            if isinstance(scale_ckpt, str):
                self.scale_state = load_params_only(scale_ckpt, self.scale_state, cfg=self.cfg)

    def _dummy_batch(self):
        m = self.cfg.model
        B, N = 1, m.num_points
        d = {
            "pts": jnp.zeros((B, N, 3)),
            "zero_mean_gt_pose": jnp.zeros((B, m.pose_dim)),
            "pts_center": jnp.zeros((B, 3)),
        }
        if m.dino != "none":
            if m.backbone != "none":
                # pixels in the dummy batch -> the agent initializes its
                # frozen backbone provider; inference batches then carry
                # roi_rgb and features are computed on device
                d["roi_rgb"] = jnp.zeros((B, m.img_size, m.img_size, 3))
            else:  # precomputed-feature mode
                P = (m.img_size // m.patch_size) ** 2
                if m.dino == "pointwise":
                    d["dino_layers"] = [jnp.zeros((B, P, m.dino_dim))] * 3
                else:
                    d["dino_global"] = jnp.zeros((B, m.dino_dim))
        if m.dino == "pointwise":
            d["roi_xs"] = jnp.zeros((B, N), jnp.int32)
            d["roi_ys"] = jnp.zeros((B, N), jnp.int32)
        if m.dino == "global":
            d["roi_center_dir"] = jnp.zeros((B, 3))
        return d

    # ----------------------------------------------------------- inference
    def inference(
        self,
        frame: dict,
        prev_pose: Optional[jnp.ndarray] = None,
        tracking: bool = False,
        key: Optional[jax.Array] = None,
        mask_ids=None,
    ) -> Optional[dict]:
        """frame: {color (H,W,3) uint8, depth (H,W) m, mask (H,W) int,
        intrinsics {fx,fy,cx,cy,width,height}}. Returns dict with pose (n,4,4),
        lengths (n,3), mask_ids (n,), prev_pose (n,9) for the next call —
        or None when no valid object (reference: infer.py:276-310)."""
        key = jax.random.PRNGKey(0) if key is None else key
        raw = frame_to_object_batch(
            frame["color"], frame["depth"], frame["mask"], frame["intrinsics"],
            self.cfg.data, mask_ids=mask_ids,
        )
        if raw is None:
            return None
        batch = process_batch(raw, self.cfg.model.pose_mode)

        if tracking and prev_pose is not None:
            T0 = self.tracking_T0
            init_x = jnp.asarray(prev_pose).at[..., -3:].add(-batch["pts_center"])
        else:
            T0 = self.single_T0
            init_x = None
        # one backbone + one score-encoder forward per call: dino features
        # ride the batch and pts_feat feeds both the sampler and ScaleNet
        batch = self.score_agent.with_image_features(self.score_state, batch)
        feats = self.score_agent.extract_features(self.score_state, batch)
        poses = self.score_agent.sample_candidates(
            self.score_state,
            batch,
            key,
            repeat_num=self.cfg.eval.eval_repeat_num,
            T0=T0,
            init_x=init_x,
            method="fixed",
            num_steps=self.num_steps,
            features=feats,
        )
        energy = None
        if self.energy_agent is not None:
            energy = self.energy_agent.get_energy(
                self.energy_state, batch, poses, fixed_t=None, key=key
            )
        agg = aggregate_candidates(
            poses,
            energy,
            retain_ratio=self.cfg.eval.retain_ratio,
            clustering=self.cfg.eval.clustering,
            eps=self.cfg.eval.clustering_eps,
            minpts_ratio=self.cfg.eval.clustering_minpts_ratio,
        )
        R, t = agg["rotation"], agg["translation"]
        if self.scale_agent is not None:
            lengths = self.scale_agent.predict(self.scale_state, feats[0], R)
        else:
            lengths = analytic_bbox_lengths(batch["pts"], R, t)

        n = R.shape[0]
        pose44 = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        pose44[:, :3, :3] = np.asarray(R)
        pose44[:, :3, 3] = np.asarray(t)
        return {
            "pose": pose44,
            "lengths": np.clip(np.asarray(lengths), 1e-3, None),
            "mask_ids": raw["mask_ids"],
            "prev_pose": jnp.concatenate([matrix_to_rot6d_cols(R), t], axis=-1),
        }
