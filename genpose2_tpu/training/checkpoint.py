"""Orbax checkpointing of the full TrainState (params + EMA + optimizer +
batch stats + step), replacing the reference's torch.save dict with EMA-folded
weights (reference: networks/posenet_agent.py:141-203). Because the EMA tree
is saved separately (not folded into the weights), resume is exact.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
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


def is_torch_checkpoint(path: str) -> bool:
    return path.endswith((".pth", ".pt", ".pth.tar", ".pt.tar"))


def load_params_only(
    path: str,
    target: TrainState,
    use_ema_as_params: bool = False,
    cfg=None,
    provider=None,
) -> TrainState:
    """Model-weights-only restore (reference ``load_model_only`` flag,
    posenet_agent.py:171-203): keeps the target's optimizer/step, takes
    params/EMA/batch_stats/constants from the checkpoint. With
    ``use_ema_as_params`` the restored EMA weights become the live params
    (the reference folds EMA into saved weights at save time).

    A ``.pth``/``.pt`` path is treated as a REFERENCE torch checkpoint and
    converted via training/torch_ingest.py — pass ``cfg`` (a Config or
    ModelConfig) for GFObjectPose checkpoints; ScaleNet torch checkpoints are
    detected by their key space and need no cfg. ``provider`` (the agent's
    ImageFeatureProvider) ingests any embedded 'dino.*' backbone subtree."""
    if is_torch_checkpoint(path):
        return load_torch_params_only(path, target, cfg, provider)
    restored = load_checkpoint(path, target)
    params = restored.ema_params if use_ema_as_params else restored.params
    return target.replace(
        params=params,
        ema_params=restored.ema_params,
        batch_stats=restored.batch_stats,
        constants=restored.constants,
    )


def load_torch_params_only(
    path: str, target: TrainState, cfg=None, provider=None
) -> TrainState:
    """Convert a reference torch checkpoint into ``target``'s weight slots.
    The torch dict holds ONE copy of the weights (the reference folds EMA in
    at save time, posenet_agent.py:150-156), so params and ema_params both get
    the converted tree.

    If the checkpoint embeds the hub DINO backbone ('dino.*' keys,
    reference: posenet.py:56-62) and ``provider`` is given, the subtree is
    ingested into the provider variables riding in ``target.constants`` —
    one command takes a published reference .pth to a runnable flagship
    state. Without a provider the dino subtree is skipped with a warning."""
    import torch

    from genpose2_tpu.models.provider import (
        attach_provider_variables,
        split_provider_variables,
    )
    from genpose2_tpu.training import torch_ingest

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    dino_sd = None
    if any(k.startswith("fusion_tail_length.") for k in sd):
        vs = torch_ingest.convert_scalenet_state_dict(sd)
    else:
        if cfg is None:
            raise ValueError("GFObjectPose torch checkpoints need cfg for conversion")
        model_cfg = getattr(cfg, "model", cfg)
        vs, dino_sd = torch_ingest.convert_posenet_state_dict(sd, model_cfg)

    # the model's constants come from the checkpoint; the provider entry in
    # target.constants (the frozen backbone) must survive the replace
    _, target_provider_vars = split_provider_variables(target.constants)
    constants = jax.tree.map(jnp.asarray, vs.get("constants", {})) or {}
    loaded_dino = False
    if target_provider_vars is not None:
        provider_vars = target_provider_vars
        if dino_sd and provider is not None:
            provider_vars = provider.load_torch_state_dict(provider_vars, dino_sd)
            loaded_dino = True
        constants = attach_provider_variables(constants, provider_vars)
    if dino_sd and not loaded_dino:
        # fires for BOTH "no provider passed" and "target has no provider
        # slot" (dino='none' / precomputed-feature configs) — embedded
        # backbone tensors must never be discarded silently
        import warnings

        warnings.warn(
            f"{path} embeds {len(dino_sd)} DINO backbone tensors but the "
            "target has no backbone provider — backbone weights NOT loaded.",
            stacklevel=2,
        )
    params = jax.tree.map(jnp.asarray, vs["params"])
    return target.replace(
        params=params,
        ema_params=params,
        batch_stats=jax.tree.map(jnp.asarray, vs.get("batch_stats", target.batch_stats)),
        constants=constants,
    )
