"""Periodic in-training evaluation hooks.

reference: networks/posenet_agent.py:400-488 (eval_score_func: EMA-weights
sampling eval with metric scalars and TensorBoard grid images every
eval_freq epochs, trainer.py:87-103)."""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpose2_tpu.config import Config
from genpose2_tpu.eval.aggregate import aggregate_candidates
from genpose2_tpu.eval.metrics import batch_criterion


def make_sampling_eval_fn(
    agent,
    cfg: Config,
    eval_batch_fn: Callable[[int], dict],
    log_dir: Optional[str] = None,
    repeat_num: int = 10,
    num_steps: int = 50,
    save_images: bool = True,
):
    """Returns eval_fn(state, epoch) -> scalar dict for Trainer.fit.

    Samples candidates with EMA weights, aggregates, computes symmetry-aware
    errors vs GT, and optionally saves a render grid."""

    def eval_fn(state, epoch: int):
        batch = eval_batch_fn(epoch)
        key = jax.random.PRNGKey(epoch)
        poses = agent.sample_candidates(
            state, batch, key, repeat_num=repeat_num, T0=1.0,
            method="fixed", num_steps=num_steps, use_ema=True,
        )
        agg = aggregate_candidates(poses, None, retain_ratio=cfg.eval.retain_ratio)
        sizes = batch.get(
            "bbox_side_len", jnp.ones((poses.shape[0], 3), poses.dtype) * 0.1
        )
        iou, deg, sht = batch_criterion(
            agg["rotation"],
            agg["translation"],
            sizes,
            batch["gt_rotation"],
            batch["gt_translation"],
            sizes,
            batch.get("sym_info", jnp.zeros((poses.shape[0], 4), jnp.int32)),
        )
        scalars = {
            "eval_deg_mean": float(jnp.mean(deg)),
            "eval_deg_median": float(jnp.median(deg)),
            "eval_sht_mean_cm": float(jnp.mean(sht)),
            "eval_iou_mean": float(jnp.mean(iou)),
        }
        if save_images and log_dir:
            try:
                from genpose2_tpu.so3.rotations import matrix_to_rot6d_cols
                from genpose2_tpu.utils.visualize import create_grid_image

                os.makedirs(os.path.join(log_dir, "eval_img"), exist_ok=True)
                pred9 = np.concatenate(
                    [
                        np.asarray(matrix_to_rot6d_cols(agg["rotation"])),
                        np.asarray(agg["translation"]),
                    ],
                    axis=-1,
                )
                gt9 = np.concatenate(
                    [
                        np.asarray(matrix_to_rot6d_cols(batch["gt_rotation"])),
                        np.asarray(batch["gt_translation"]),
                    ],
                    axis=-1,
                )
                pts_cam = np.asarray(batch["pts"]) + np.asarray(batch["pts_center"])[:, None, :]
                create_grid_image(
                    pts_cam,
                    pred_pose=pred9,
                    gt_pose=gt9,
                    path=os.path.join(log_dir, "eval_img", f"epoch_{epoch}.png"),
                )
            except Exception as e:  # visualization must never kill training
                scalars["eval_image_error"] = 0.0
        return scalars

    return eval_fn
