"""Ingest the reference's torch checkpoints into this framework's flax trees.

The reference saves ``{'model_state_dict': net.state_dict(), ...}``
(reference: networks/posenet_agent.py:141-168). This module converts those
torch state dicts — for the full GFObjectPose (score or energy agents), the
ScaleNet, and every sub-encoder — into the exact ``{'params', 'batch_stats',
'constants'}`` variable trees produced by ``GFObjectPose.init`` /
``ScaleNet.init`` here, so published reference checkpoints run unmodified on
TPU.

Layout rules (verified per-module by tests/test_torch_ingest.py, which runs
the reference's own torch modules on CPU against the converted flax modules):

- ``nn.Linear``/1x1 ``ConvNd`` weight (out, in[, 1, 1]) -> Dense kernel
  (in, out);
- ``nn.BatchNormNd`` -> flax BatchNorm: weight->scale, bias->bias,
  running_mean->batch_stats.mean, running_var->batch_stats.var
  (torch momentum 0.1 == flax momentum 0.9; eps 1e-5 both);
- the SA module's first conv (reference: pytorch_utils.py:5-33 layer0)
  becomes ``proj_kernel_{s}`` — the projected-gather form in
  models/pointnet2.py applies the SAME linear map before the gather, so the
  kernel is just transposed;
- GaussianFourierProjection W (reference: scorenet.py:77-88, a frozen
  nn.Parameter) -> the 'constants' collection;
- the reference's dead-at-runtime params (GatedAttentionFusion.downsample,
  the GroupAll stage's relative_pos_encoders entry) are dropped;
- ``dino.*`` keys (the torch.hub DINO backbone registered as a submodule,
  reference: posenet.py:56-62) are returned separately for
  models.vit.load_torch_state_dict.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from flax.traverse_util import unflatten_dict

from genpose2_tpu.config import ModelConfig, PointNet2Config


def _np(v) -> np.ndarray:
    """torch tensor | array-like -> float32/original-dtype numpy array."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    pl = len(prefix)
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix)}


class _Tree:
    """Accumulates (collection, path) -> array, then unflattens."""

    def __init__(self):
        self.flat: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(self, collection: str, path: str, value) -> None:
        self.flat[(collection,) + tuple(path.split("/"))] = _np(value)

    def linear(self, sd, tkey: str, path: str, bias: bool = True) -> None:
        """nn.Linear `{tkey}.weight/.bias` -> Dense at params/{path}."""
        self.put("params", f"{path}/kernel", _np(sd[f"{tkey}.weight"]).T)
        if bias:
            self.put("params", f"{path}/bias", sd[f"{tkey}.bias"])

    def conv1x1(self, sd, tkey: str, path: str, bias: bool = True) -> None:
        """1x1 Conv1d/Conv2d -> Dense (weight (out, in, 1[, 1]))."""
        w = _np(sd[f"{tkey}.weight"])
        self.put("params", f"{path}/kernel", w.reshape(w.shape[0], w.shape[1]).T)
        if bias and f"{tkey}.bias" in sd:
            self.put("params", f"{path}/bias", sd[f"{tkey}.bias"])

    def bn(self, sd, tkey: str, path: str) -> None:
        self.put("params", f"{path}/scale", sd[f"{tkey}.weight"])
        self.put("params", f"{path}/bias", sd[f"{tkey}.bias"])
        self.put("batch_stats", f"{path}/mean", sd[f"{tkey}.running_mean"])
        self.put("batch_stats", f"{path}/var", sd[f"{tkey}.running_var"])

    def layernorm(self, sd, tkey: str, path: str) -> None:
        self.put("params", f"{path}/scale", sd[f"{tkey}.weight"])
        self.put("params", f"{path}/bias", sd[f"{tkey}.bias"])

    def mlp(self, sd, tkey: str, path: str, torch_idxs=(0, 2)) -> None:
        """nn.Sequential(Linear, act, Linear, ...) -> layers.MLP."""
        for i, ti in enumerate(torch_idxs):
            self.linear(sd, f"{tkey}.{ti}", f"{path}/Dense_{i}")

    def variables(self) -> dict:
        return unflatten_dict(self.flat)


# --------------------------------------------------------------- score/energy
def _convert_pose_head(t: _Tree, sd, prefix: str, path: str, regression_head: str):
    """PoseScoreNet / PoseEnergyNet share trunk+head naming
    (reference: scorenet.py:109-275, energynet.py:32-150)."""
    t.put("constants", f"{path}/GaussianFourierProjection_0/W", sd[f"{prefix}t_encoder.0.W"])
    t.linear(sd, f"{prefix}t_encoder.1", f"{path}/Dense_0")
    t.mlp(sd, f"{prefix}pose_encoder", f"{path}/MLP_0")
    if regression_head == "RT":
        t.mlp(sd, f"{prefix}fusion_tail", f"{path}/MLP_1")
    elif regression_head == "R_and_T":
        t.mlp(sd, f"{prefix}fusion_tail_rot", f"{path}/MLP_1")
        t.mlp(sd, f"{prefix}fusion_tail_trans", f"{path}/MLP_2")
    elif regression_head == "Rx_Ry_and_T":
        for name in ("fusion_tail_rot_x", "fusion_tail_rot_y", "fusion_tail_trans"):
            t.mlp(sd, f"{prefix}{name}", f"{path}/{name}")
    else:
        raise NotImplementedError(regression_head)


def convert_scorenet_state_dict(sd, regression_head: str = "Rx_Ry_and_T") -> dict:
    """Standalone PoseScoreNet/PoseEnergyNet state dict -> variables."""
    t = _Tree()
    _convert_pose_head(t, {k: _np(v) for k, v in sd.items()}, "", ".", regression_head)
    vs = t.variables()
    # "." path segment -> collapse to the root
    return {c: vs[c]["."] for c in vs}


# ------------------------------------------------------------------- scalenet
def convert_scalenet_state_dict(sd) -> dict:
    """reference: networks/scalenet.py:12-49 (axes_encoder, fusion_tail_length)."""
    sd = {k: _np(v) for k, v in sd.items()}
    t = _Tree()
    t.mlp(sd, "axes_encoder", "./MLP_0")
    t.mlp(sd, "fusion_tail_length", "./MLP_1")
    vs = t.variables()
    return {c: vs[c]["."] for c in vs}


# ---------------------------------------------------------------- img encoder
def _convert_img_encoder(t: _Tree, sd, prefix: str, path: str):
    """reference: networks/img_encoder/img_encoder.py:6-100."""
    t.linear(sd, f"{prefix}layer_attn.0", f"{path}/Dense_0")
    t.linear(sd, f"{prefix}layer_attn.2", f"{path}/Dense_1")
    t.put("params", f"{path}/Embed_0/embedding", sd[f"{prefix}rel_pos_emb.weight"])
    w = _np(sd[f"{prefix}edge_guide.0.weight"])  # (out, in, 3, 3)
    t.put("params", f"{path}/Conv_0/kernel", w.transpose(2, 3, 1, 0))
    t.put("params", f"{path}/Conv_0/bias", sd[f"{prefix}edge_guide.0.bias"])
    t.put("params", f"{path}/geo_weight", sd[f"{prefix}geo_weight"])
    t.put("params", f"{path}/edge_weight", sd[f"{prefix}edge_weight"])


def convert_img_encoder_state_dict(sd) -> dict:
    sd = {k: _np(v) for k, v in sd.items()}
    t = _Tree()
    _convert_img_encoder(t, sd, "", ".")
    vs = t.variables()
    return {c: vs[c]["."] for c in vs}


# ------------------------------------------------------------------ attention
def _convert_relative_pe(t: _Tree, sd, prefix: str, path: str):
    """reference: attention.py:648-688 (distance/direction encoders + fusion).
    Creation order here: Dense_0/1 distance, Dense_2/3 direction, Dense_4 fusion."""
    t.linear(sd, f"{prefix}distance_encoder.0", f"{path}/Dense_0")
    t.linear(sd, f"{prefix}distance_encoder.2", f"{path}/Dense_1")
    t.linear(sd, f"{prefix}direction_encoder.0", f"{path}/Dense_2")
    t.linear(sd, f"{prefix}direction_encoder.2", f"{path}/Dense_3")
    t.linear(sd, f"{prefix}fusion", f"{path}/Dense_4")


def _convert_transformer_block(t: _Tree, sd, prefix: str, path: str):
    """reference: attention.py:491-533 (post-norm block, named wq/wk/wv/wo)."""
    mha = f"{path}/MultiheadAttentionWithRelativePE_0"
    for w in ("wq", "wk", "wv", "wo"):
        t.linear(sd, f"{prefix}self_attn.{w}", f"{mha}/{w}")
    t.linear(sd, f"{prefix}linear1", f"{path}/Dense_0")
    t.linear(sd, f"{prefix}linear2", f"{path}/Dense_1")
    t.layernorm(sd, f"{prefix}norm1", f"{path}/LayerNorm_0")
    t.layernorm(sd, f"{prefix}norm2", f"{path}/LayerNorm_1")


def _convert_gated_fusion(t: _Tree, sd, prefix: str, path: str):
    """reference: attention.py:224-283. Our creation order (models/attention.py
    GatedAttentionFusion): Dense_0+BatchNorm_0 = original_transform,
    Dense_1/Dense_2 = channel_attention convs, Conv_0 = spatial_attention,
    Dense_3+BatchNorm_1 = gate, Dense_4+BatchNorm_2 = output_conv. The
    reference's `downsample` branch is unreachable with 1x1 convs (it only
    runs when the transform changes the point count) and is dropped."""
    t.conv1x1(sd, f"{prefix}original_transform.0", f"{path}/Dense_0")
    t.bn(sd, f"{prefix}original_transform.1", f"{path}/BatchNorm_0")
    t.conv1x1(sd, f"{prefix}channel_attention.1", f"{path}/Dense_1")
    t.conv1x1(sd, f"{prefix}channel_attention.3", f"{path}/Dense_2")
    w = _np(sd[f"{prefix}spatial_attention.0.weight"])  # (1, 2, 7)
    t.put("params", f"{path}/Conv_0/kernel", w.transpose(2, 1, 0))
    t.conv1x1(sd, f"{prefix}gate.0", f"{path}/Dense_3")
    t.bn(sd, f"{prefix}gate.1", f"{path}/BatchNorm_1")
    t.conv1x1(sd, f"{prefix}output_conv.0", f"{path}/Dense_4")
    t.bn(sd, f"{prefix}output_conv.1", f"{path}/BatchNorm_2")


# ------------------------------------------------------------------ pointnet2
def _convert_sa_module(t: _Tree, sd, prefix: str, path: str, grouped: bool):
    """One PointnetSAModuleMSG (reference: pointnet2_modules.py:77-125;
    SharedMLP naming from pytorch_utils.py:5-33: mlps.{s}.layer{i}.conv/bn.bn).

    grouped=True (npoint set): layer0 -> proj_kernel_{s} + BatchNorm_{s},
    layers 1.. -> SharedMLP_{s}. grouped=False (GroupAll): all layers ->
    SharedMLP_{s}."""
    sub = strip_prefix(sd, f"{prefix}mlps.")
    scales = sorted({int(k.split(".")[0]) for k in sub})
    for s in scales:
        layers = sorted(
            {int(k.split(".")[1][len("layer"):]) for k in sub if k.startswith(f"{s}.layer")}
        )
        start = 0
        if grouped:
            w = _np(sd[f"{prefix}mlps.{s}.layer0.conv.weight"])  # (h1, Cin, 1, 1)
            t.put("params", f"{path}/proj_kernel_{s}", w.reshape(w.shape[0], w.shape[1]).T)
            t.bn(sd, f"{prefix}mlps.{s}.layer0.bn.bn", f"{path}/BatchNorm_{s}")
            start = 1
        for i in layers[start:]:
            j = i - start
            t.conv1x1(
                sd, f"{prefix}mlps.{s}.layer{i}.conv", f"{path}/SharedMLP_{s}/Dense_{j}", bias=False
            )
            t.bn(sd, f"{prefix}mlps.{s}.layer{i}.bn.bn", f"{path}/SharedMLP_{s}/BatchNorm_{j}")


def _convert_pointnet2_cls(t: _Tree, sd, prefix: str, path: str, cfg: PointNet2Config):
    for k, npoint in enumerate(cfg.npoints):
        _convert_sa_module(
            t, sd, f"{prefix}SA_modules.{k}.", f"{path}/SetAbstractionMSG_{k}", npoint is not None
        )


def _convert_pointnet2_fus(t: _Tree, sd, prefix: str, path: str, cfg: PointNet2Config):
    """reference: pointnet2.py:255-388 (SA + relative PE + transformer +
    gated fusion per stage; the GroupAll stage's PE params are dead there)."""
    _convert_pointnet2_cls(t, sd, prefix, path, cfg)
    for k, npoint in enumerate(cfg.npoints):
        if npoint is not None:
            _convert_relative_pe(
                t,
                sd,
                f"{prefix}relative_pos_encoders.{k}.",
                f"{path}/EfficientRelativePositionalEncoding_{k}",
            )
        _convert_transformer_block(
            t, sd, f"{prefix}transformer_blocks.{k}.", f"{path}/TransformerBlockWithRelativePE_{k}"
        )
        if k > 0:
            _convert_gated_fusion(
                t, sd, f"{prefix}feature_fusions.{k - 1}.", f"{path}/GatedAttentionFusion_{k - 1}"
            )


# -------------------------------------------------------------- pointnet (legacy)
def _convert_stn(t: _Tree, sd, prefix: str, path: str):
    """reference: pointnets.py:45-79 (STNkd: conv1-3 are 1x1 Conv1d, fc1-3 Linear)."""
    for i, tkey in enumerate(("conv1", "conv2", "conv3")):
        t.conv1x1(sd, f"{prefix}{tkey}", f"{path}/Dense_{i}")
    for i, tkey in enumerate(("fc1", "fc2", "fc3")):
        t.linear(sd, f"{prefix}{tkey}", f"{path}/Dense_{i + 3}")


def _convert_pointnet_feat(t: _Tree, sd, prefix: str, path: str):
    """reference: pointnets.py:83-123 (PointNetfeat, BN removed there)."""
    _convert_stn(t, sd, f"{prefix}stn.", f"{path}/STNkd_0")
    for i, tkey in enumerate(("conv1", "conv2", "conv3", "conv4")):
        t.conv1x1(sd, f"{prefix}{tkey}", f"{path}/Dense_{i}")
    if any(k.startswith(f"{prefix}fstn.") for k in sd):
        _convert_stn(t, sd, f"{prefix}fstn.", f"{path}/STNkd_1")


# ------------------------------------------------------------------ posenet
def convert_posenet_state_dict(
    sd, cfg: ModelConfig
) -> Tuple[dict, Optional[Dict[str, np.ndarray]]]:
    """Full GFObjectPose model_state_dict -> (variables, dino_state_dict).

    `variables` has 'params' / 'batch_stats' / 'constants' exactly matching
    ``GFObjectPose(cfg, std_fn, agent_type).init``; `dino_state_dict` is the
    raw torch sub-dict for the hub backbone (feed to
    models.vit.load_torch_state_dict), or None if absent."""
    sd = {k: _np(v) for k, v in sd.items()}
    t = _Tree()

    if cfg.pts_encoder == "pointnet":
        _convert_pointnet_feat(t, sd, "pts_encoder.", "pts_encoder")
    elif cfg.pts_encoder == "pointnet2":
        if cfg.dino == "pointwise":
            _convert_pointnet2_fus(t, sd, "pts_encoder.", "pts_encoder", cfg.pointnet2)
        else:
            _convert_pointnet2_cls(t, sd, "pts_encoder.", "pts_encoder", cfg.pointnet2)
    elif cfg.pts_encoder == "pointnet_and_pointnet2":
        _convert_pointnet_feat(t, sd, "pts_pointnet_encoder.", "pts_pointnet")
        _convert_pointnet2_cls(t, sd, "pts_pointnet2_encoder.", "pts_pointnet2", cfg.pointnet2)
        t.linear(sd, "fusion_layer", "fusion_layer")
    else:
        raise NotImplementedError(cfg.pts_encoder)

    if cfg.dino != "none" and any(k.startswith("img_encoder.") for k in sd):
        _convert_img_encoder(t, sd, "img_encoder.", "img_encoder")

    _convert_pose_head(t, sd, "pose_score_net.", "pose_net", cfg.regression_head)

    dino_sd = strip_prefix(sd, "dino.") or None
    return t.variables(), dino_sd


def convert_reference_checkpoint(
    ckpt: dict, cfg: ModelConfig
) -> Tuple[dict, Optional[Dict[str, np.ndarray]]]:
    """A torch.load()'d reference checkpoint (or a bare model state dict) ->
    (GFObjectPose variables, dino state dict). Score and energy checkpoints
    share the head naming ('pose_score_net.*', reference posenet.py:99-120),
    so one conversion covers both agent types."""
    sd = ckpt.get("model_state_dict", ckpt)
    return convert_posenet_state_dict(sd, cfg)


def load_torch_checkpoint(path: str, cfg: ModelConfig):
    """torch.load a reference .pth and convert. Requires torch (CPU is fine)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return convert_reference_checkpoint(ckpt, cfg)
