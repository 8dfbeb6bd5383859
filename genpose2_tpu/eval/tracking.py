"""Video pose tracking with temporal candidate propagation.

reference: runners/evaluation_tracking.py:110-216 (work_batch) and :219-384
(the multiplexed video loop). Per frame:

1. the previous frame's aggregated pose (9D, camera frame) is re-centered to
   the current cloud (translation -= pts_center);
2. the ODE warm-starts at T0~0.25 from that pose plus prior noise at level T0
   (reference: samplers.py:197-201) — the temporal prior;
3. candidates are energy-ranked, retained, clustered, averaged as in the
   single-frame path;
4. the aggregated pose is the next frame's prior; first frames initialize
   from noised GT (evaluation_tracking.py:292-304) or a detection.

The tracker state is pure data (a (B, 9) pose array), so multiplexing many
video streams is just batching: streams ride the 'data' mesh axis with no
cross-stream communication (SURVEY §2.8 video-parallel row).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpose2_tpu.config import Config
from genpose2_tpu.eval.aggregate import aggregate_candidates, analytic_bbox_lengths
from genpose2_tpu.so3.noise import add_noise_to_RT
from genpose2_tpu.so3.rotations import matrix_to_rot6d_cols


class PoseTracker:
    def __init__(
        self,
        cfg: Config,
        score_agent,
        score_state,
        energy_agent=None,
        energy_state=None,
        scale_fn: Optional[Callable] = None,
        T0: float = 0.25,
        num_steps: int = 100,
    ):
        self.cfg = cfg
        self.score_agent = score_agent
        self.score_state = score_state
        self.energy_agent = energy_agent
        self.energy_state = energy_state
        self.scale_fn = scale_fn
        self.T0 = T0
        self.num_steps = num_steps

    def init_from_gt(self, key, gt_rotation, gt_translation, r_deg=5.0, t_std=0.03):
        """Noised-GT first-frame prior (reference: evaluation_tracking.py:292-304,
        tracking_utils.add_noise_to_RT)."""
        R, t = add_noise_to_RT(key, gt_rotation, gt_translation, r_deg, t_std)
        return jnp.concatenate([matrix_to_rot6d_cols(R), t], axis=-1)

    def init_from_pose(self, rotation, translation):
        return jnp.concatenate([matrix_to_rot6d_cols(rotation), translation], axis=-1)

    def step(self, batch, prev_pose, key):
        """One tracking step for a (possibly multi-stream) batch of objects.

        batch: process_batch output; prev_pose (B, 9) camera frame.
        Returns dict(rotation (B,3,3), translation (B,3), lengths (B,3),
        prev_pose (B, 9) for the next frame)."""
        # re-center the temporal prior to the current cloud
        # (reference: evaluation_tracking.py:111-118)
        init_x = prev_pose.at[..., -3:].add(-batch["pts_center"])
        # frozen backbone + score encoder run ONCE per frame batch: dino
        # features ride the batch (the energy stage skips the ViT) and the
        # score features feed both the sampler and ScaleNet
        batch = self.score_agent.with_image_features(self.score_state, batch)
        feats = self.score_agent.extract_features(self.score_state, batch)
        poses = self.score_agent.sample_candidates(
            self.score_state,
            batch,
            key,
            repeat_num=self.cfg.eval.eval_repeat_num,
            T0=self.T0,
            init_x=init_x,
            method="fixed",
            num_steps=self.num_steps,
            features=feats,
        )
        if self.energy_agent is not None:
            energy = self.energy_agent.get_energy(
                self.energy_state, batch, poses, fixed_t=1e-5
            )
        else:
            energy = None
        agg = aggregate_candidates(
            poses,
            energy,
            retain_ratio=self.cfg.eval.retain_ratio,
            clustering=self.cfg.eval.clustering,
            eps=self.cfg.eval.clustering_eps,
            minpts_ratio=self.cfg.eval.clustering_minpts_ratio,
        )
        R, t = agg["rotation"], agg["translation"]
        if self.scale_fn is not None:
            lengths = self.scale_fn(batch, R, t, pts_feat=feats[0])
        else:
            lengths = analytic_bbox_lengths(batch["pts"], R, t)
        next_prev = jnp.concatenate([matrix_to_rot6d_cols(R), t], axis=-1)
        return {
            "rotation": R,
            "translation": t,
            "lengths": jnp.clip(lengths, 1e-3),
            "prev_pose": next_prev,
        }


def track_video(
    tracker: PoseTracker,
    frames,
    key,
    first_frame_init: str = "gt_noise",
):
    """Track a single video (list of processed frame batches, same objects in
    the same order every frame — the reference's per-video dataset invariant,
    datasets_tracking.py:117-144). Returns per-frame results."""
    results = []
    prev = None
    for i, batch in enumerate(frames):
        k = jax.random.fold_in(key, i)
        if prev is None:
            if first_frame_init == "gt_noise":
                prev = tracker.init_from_gt(
                    k, batch["gt_rotation"], batch["gt_translation"]
                )
            else:
                prev = tracker.init_from_pose(
                    batch["gt_rotation"], batch["gt_translation"]
                )
        out = tracker.step(batch, prev, k)
        prev = out["prev_pose"]
        results.append(
            {k2: np.asarray(v) for k2, v in out.items() if k2 != "prev_pose"}
        )
    return results
