"""Orbax checkpointing of the full TrainState (params + EMA + optimizer +
batch stats + step), replacing the reference's torch.save dict with EMA-folded
weights (reference: networks/posenet_agent.py:141-203). Because the EMA tree
is saved separately (not folded into the weights), resume is exact.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from genpose2_tpu.training.agent import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, name: Optional[str] = None):
    """Write ``<ckpt_dir>/<name or step>`` atomically."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    name = name or f"step_{int(state.step)}"
    path = os.path.join(ckpt_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def load_checkpoint(path: str, target: TrainState) -> TrainState:
    """Restore into the structure of ``target`` (an abstract/initialized
    TrainState from the same agent)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)


def load_params_only(path: str, target: TrainState, use_ema_as_params: bool = False) -> TrainState:
    """Model-weights-only restore (reference ``load_model_only`` flag,
    posenet_agent.py:171-203): keeps the target's optimizer/step, takes
    params/EMA/batch_stats/constants from the checkpoint. With
    ``use_ema_as_params`` the restored EMA weights become the live params
    (the reference folds EMA into saved weights at save time)."""
    restored = load_checkpoint(path, target)
    params = restored.ema_params if use_ema_as_params else restored.params
    return target.replace(
        params=params,
        ema_params=restored.ema_params,
        batch_stats=restored.batch_stats,
        constants=restored.constants,
    )
