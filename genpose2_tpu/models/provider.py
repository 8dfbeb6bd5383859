"""Image feature provider: the frozen ViT backbone as a first-class pipeline
stage.

The reference computes DINO features inside GFObjectPose.forward with a frozen
torch.hub backbone (reference: networks/posenet.py:49-66, 127-197). Here the
backbone is owned by the agent, its variables ride in
``TrainState.constants['image_provider']`` (never optimized, checkpointed with
the state), and every production path — train, eval, tracking, inference API —
computes features from ``roi_rgb`` pixels through this provider whenever the
batch does not already carry them. Precomputed-feature batches keep working
(the interchangeable-provider design, SURVEY.md §7 decision 7).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from genpose2_tpu.config import ModelConfig
from genpose2_tpu.models.vit import (
    DinoV3ViT,
    ViT,
    load_dinov3_state_dict,
    load_torch_state_dict,
)

PROVIDER_KEY = "image_provider"


class ImageFeatureProvider:
    """Builds + applies the frozen backbone selected by ``cfg.backbone``."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        dt = jnp.bfloat16 if cfg.backbone_dtype == "bfloat16" else None
        if cfg.backbone == "dinov3_vits16plus":
            self.vit = DinoV3ViT(
                patch_size=cfg.patch_size,
                dim=cfg.dino_dim,
                depth=cfg.backbone_depth,
                num_heads=6,
                num_storage_tokens=4,
                ffn_hidden=cfg.dino_dim * 4,
                ffn_layer="swiglu",
                dtype=dt,
            )
        elif cfg.backbone == "dinov2_vits16":
            self.vit = ViT(
                patch_size=cfg.patch_size,
                dim=cfg.dino_dim,
                depth=cfg.backbone_depth,
                num_heads=6,
                dtype=dt,
            )
        else:
            raise NotImplementedError(cfg.backbone)
        # intermediate layer ids, clipped into the (possibly truncated) depth
        self.layer_ids = tuple(
            min(i, cfg.backbone_depth - 1) for i in cfg.dino_layer_ids
        )

    def init(self, key) -> dict:
        x = jnp.zeros((1, self.cfg.img_size, self.cfg.img_size, 3), jnp.float32)
        return self.vit.init(key, x)

    # jitted at the provider level: callers (with_image_features, the eval /
    # tracking / API hoists) invoke these OUTSIDE any enclosing jit, and an
    # eager 12-block ViT forward would dispatch hundreds of ops per batch on
    # a remote backend. Inside an enclosing jit the inner jit is inlined.
    @functools.partial(jax.jit, static_argnums=(0,))
    def _patch_features_impl(self, variables, rgb):
        outs = self.vit.apply(variables, rgb, self.layer_ids)
        return [jax.lax.stop_gradient(o) for o in outs]

    def patch_features(self, variables: dict, rgb: jnp.ndarray):
        """rgb (B, S, S, 3) normalized -> list of 3 (B, P, D) patch-token
        tensors from the configured intermediate blocks
        (reference: posenet.py:138-144 get_intermediate_layers([2, 6, 11]))."""
        return self._patch_features_impl(variables, rgb)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _global_feature_impl(self, variables, rgb):
        out = self.vit.apply(variables, rgb, return_class_token=True)
        return jax.lax.stop_gradient(out)

    def global_feature(self, variables: dict, rgb: jnp.ndarray) -> jnp.ndarray:
        """Final normed CLS embedding (B, D) (dino='global',
        reference: posenet.py:316-337)."""
        return self._global_feature_impl(variables, rgb)

    def load_torch_state_dict(self, variables: dict, state_dict: dict) -> dict:
        """Ingest a torch backbone checkpoint (optionally prefixed 'dino.'
    as in a full GFObjectPose .pth)."""
        sd = {
            (k[len("dino."):] if k.startswith("dino.") else k): v
            for k, v in state_dict.items()
        }
        if isinstance(self.vit, DinoV3ViT):
            return load_dinov3_state_dict(variables, sd)
        return load_torch_state_dict(variables, sd)


def attach_provider_variables(constants: dict, provider_vars: Optional[dict]) -> dict:
    """Stash the provider's variable tree under the agent's constants
    collection (checkpointed, never optimized)."""
    if provider_vars is None:
        return constants
    out = dict(constants)
    out[PROVIDER_KEY] = provider_vars
    return out


def split_provider_variables(constants: dict):
    """-> (model constants without the provider entry, provider variables or
    None). The model's flax collections must not see the foreign key."""
    if PROVIDER_KEY not in constants:
        return constants, None
    out = dict(constants)
    provider_vars = out.pop(PROVIDER_KEY)
    return out, provider_vars
