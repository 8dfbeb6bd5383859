"""Symmetry-aware pose metrics: the cutoop (Omni6DPose toolkit) replacement.

The reference delegates to the external ``cutoop`` package: DetectMatch
.calibrate_rotation() / .criterion() / .metrics()
(reference: runners/evaluation_single.py:291-370, utils/metrics.py:15-61).
cutoop is not available here, so the needed slice is reimplemented from the
documented semantics and the community-standard NOCS math the reference also
vendors (reference: utils/sgpa_utils.py:236-318, 383-422):

- symmetry labels are (any, x, y, z) with per-axis tags
  none(0) / any(1) / half(2) / quarter(3)
  (reference: datasets/datasets_omni6dpose.py:334-342);
- rotation calibration snaps the prediction along its symmetry orbit to the
  closest pose to GT: continuous axes via a closed-form angle, discrete axes
  via enumeration of the cyclic group, global 'any' objects to GT exactly;
- 3D IoU uses the NOCS axis-aligned-in-camera-frame approximation
  (sgpa_utils.py:276-297): each oriented box is replaced by its world AABB;
- rotation error = geodesic angle (deg), translation error = L2 * 100 (cm)
  (sgpa_utils.py:403-419);
- metrics: per-class means, acc@thresholds, IoU-AUC over threshold sweeps and
  pose VUS over (deg, cm) grids (evaluation_single.py:343-368).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genpose2_tpu.so3.rotations import axis_angle_to_matrix, rotation_angle_deg

_TAGS = {"none": 0, "any": 1, "half": 2, "quarter": 3}
_AXES = jnp.eye(3)  # object-frame x, y, z

SYM_NONE = jnp.zeros((4,), jnp.int32)


def sym_label(any_sym: bool = False, x: str = "none", y: str = "none", z: str = "none"):
    """Build a (4,) int32 symmetry label [any, x, y, z]."""
    return jnp.asarray([int(any_sym), _TAGS[x], _TAGS[y], _TAGS[z]], jnp.int32)


# ---------------------------------------------------------------------------
# rotation calibration
# ---------------------------------------------------------------------------
def _continuous_calibrate(R_pred, R_gt, axis):
    """Best theta for R_pred @ Rot(axis, theta) ~ R_gt, closed form:
    maximize trace(M @ Rot(axis, theta)) with M = R_gt^T R_pred."""
    M = jnp.swapaxes(R_gt, -1, -2) @ R_pred
    a = axis
    aMa = jnp.einsum("i,...ij,j->...", a, M, a)
    trM = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]
    # trace(M K_a) with K_a = skew(a): linear coefficient of sin(theta)
    v = jnp.stack(
        [
            M[..., 1, 2] - M[..., 2, 1],
            M[..., 2, 0] - M[..., 0, 2],
            M[..., 0, 1] - M[..., 1, 0],
        ],
        axis=-1,
    )
    s_coef = jnp.einsum("i,...i->...", a, v)
    c_coef = trM - aMa
    theta = jnp.arctan2(s_coef, c_coef)
    rot = axis_angle_to_matrix(jnp.broadcast_to(a, R_pred.shape[:-2] + (3,)), theta)
    return R_pred @ rot


def _discrete_group_angles(tag):
    """tag (scalar int) -> 4 angles of the cyclic subgroup (duplicates when the
    order < 4; none/any -> all zeros)."""
    n = jnp.where(tag == 2, 2, jnp.where(tag == 3, 4, 1))
    k = jnp.arange(4)
    return 2.0 * jnp.pi * (k % n) / n


@jax.jit
def calibrate_rotation(R_pred: jnp.ndarray, R_gt: jnp.ndarray, sym: jnp.ndarray):
    """Snap each predicted rotation along its symmetry orbit to the closest
    rotation to GT. R_pred, R_gt (B, 3, 3); sym (B, 4) int
    (reference: DetectMatch.calibrate_rotation, evaluation_single.py:319)."""

    def per_obj(Rp, Rg, s):
        # continuous axes first (priority x, y, z — at most one in practice)
        R = Rp
        for i in range(3):
            Rc = _continuous_calibrate(R, Rg, _AXES[i])
            R = jnp.where(s[1 + i] == 1, Rc, R)
        # discrete: enumerate the product of per-axis cyclic groups
        ax_angles = [_discrete_group_angles(s[1 + i]) for i in range(3)]
        gx, gy, gz = jnp.meshgrid(*ax_angles, indexing="ij")
        angles = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)  # (64, 3)

        def cand(a3):
            g = (
                axis_angle_to_matrix(_AXES[0], a3[0])
                @ axis_angle_to_matrix(_AXES[1], a3[1])
                @ axis_angle_to_matrix(_AXES[2], a3[2])
            )
            Rc = R @ g
            return Rc, rotation_angle_deg(Rc, Rg)

        cands, errs = jax.vmap(cand)(angles)
        best = jnp.argmin(errs)
        R = cands[best]
        # global symmetry: rotation is unconstrained
        return jnp.where(s[0] == 1, Rg, R)

    return jax.vmap(per_obj)(R_pred, R_gt, sym)


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------
_CORNERS = jnp.asarray(
    [
        [+1, +1, +1], [+1, +1, -1], [-1, +1, +1], [-1, +1, -1],
        [+1, -1, +1], [+1, -1, -1], [-1, -1, +1], [-1, -1, -1],
    ],
    jnp.float32,
)  # reference: sgpa_utils.py:236-254 (x size/2)


def _world_aabb(R, t, size):
    corners = 0.5 * size[..., None, :] * _CORNERS  # (..., 8, 3)
    world = jnp.einsum("...ij,...nj->...ni", R, corners) + t[..., None, :]
    return jnp.min(world, axis=-2), jnp.max(world, axis=-2)


def iou_3d(R1, t1, size1, R2, t2, size2):
    """NOCS-style 3D IoU: IoU of the two boxes' camera-frame AABBs
    (reference: sgpa_utils.py:276-297). Batched over leading dims."""
    lo1, hi1 = _world_aabb(R1, t1, size1)
    lo2, hi2 = _world_aabb(R2, t2, size2)
    inter_lo = jnp.maximum(lo1, lo2)
    inter_hi = jnp.minimum(hi1, hi2)
    edge = inter_hi - inter_lo
    inter = jnp.where(jnp.min(edge, axis=-1) < 0, 0.0, jnp.prod(edge, axis=-1))
    v1 = jnp.prod(hi1 - lo1, axis=-1)
    v2 = jnp.prod(hi2 - lo2, axis=-1)
    return inter / jnp.maximum(v1 + v2 - inter, 1e-12)


# ---------------------------------------------------------------------------
# criterion + metrics
# ---------------------------------------------------------------------------
@jax.jit
def batch_criterion(
    pred_R, pred_t, pred_size, gt_R, gt_t, gt_size, sym
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-instance (iou, rotation deg, shift cm) after symmetry calibration
    (reference: DetectMatch.criterion, evaluation_single.py:324-332)."""
    R_cal = calibrate_rotation(pred_R, gt_R, sym)
    deg = rotation_angle_deg(R_cal, gt_R)
    deg = jnp.where(sym[:, 0] == 1, 0.0, deg)
    sht = jnp.linalg.norm(pred_t - gt_t, axis=-1) * 100.0
    iou = iou_3d(R_cal, pred_t, pred_size, gt_R, gt_t, gt_size)
    return iou, deg, sht


def rot_error_deg(pred_R, gt_R, sym):
    """Symmetry-aware rotation error only (used for training-time ranking,
    reference: utils/metrics.py:15-61)."""
    R_cal = calibrate_rotation(pred_R, gt_R, sym)
    deg = rotation_angle_deg(R_cal, gt_R)
    return jnp.where(sym[:, 0] == 1, 0.0, deg)


@dataclasses.dataclass
class PoseMetrics:
    iou_mean: float
    deg_mean: float
    sht_mean: float
    iou_acc: Dict[float, float]  # threshold -> accuracy
    pose_acc: Dict[Tuple[float, float], float]  # (deg, cm) -> accuracy
    iou_auc: Dict[float, float]  # range start -> normalized AUC
    pose_auc: Dict[Tuple[float, float], float]  # (deg, cm) -> VUS
    per_class: Dict[int, "PoseMetrics"]

    def to_dict(self):
        d = dataclasses.asdict(self)
        d["iou_acc"] = {str(k): v for k, v in self.iou_acc.items()}
        d["pose_acc"] = {str(k): v for k, v in self.pose_acc.items()}
        d["iou_auc"] = {str(k): v for k, v in self.iou_auc.items()}
        d["pose_auc"] = {str(k): v for k, v in self.pose_auc.items()}
        d["per_class"] = {str(k): v.to_dict() for k, v in self.per_class.items()}
        return d


_IOU_AUC_RANGES = [(0.25, 1.0, 0.075), (0.5, 1.0, 0.005), (0.75, 1.0, 0.0025)]
_POSE_AUC_RANGES = [
    ((0.0, 5.0, 0.05), (0.0, 2.0, 0.02)),
    ((0.0, 5.0, 0.05), (0.0, 5.0, 0.05)),
    ((0.0, 10.0, 0.1), (0.0, 2.0, 0.02)),
    ((0.0, 10.0, 0.1), (0.0, 5.0, 0.05)),
]


def _metrics_for(iou, deg, sht) -> dict:
    iou_acc = {thr: float(np.mean(iou > thr)) for thr in (0.25, 0.5, 0.75)}
    pose_acc = {
        (d, s): float(np.mean((deg < d) & (sht < s)))
        for d, s in ((5, 2), (5, 5), (10, 2), (10, 5))
    }
    iou_auc = {}
    for lo, hi, step in _IOU_AUC_RANGES:
        ts = np.arange(lo, hi, step)
        iou_auc[lo] = float(np.mean([np.mean(iou > t) for t in ts]))
    pose_auc = {}
    for (dlo, dhi, dstep), (slo, shi, sstep) in _POSE_AUC_RANGES:
        ds = np.arange(dlo, dhi, dstep) + dstep
        ss = np.arange(slo, shi, sstep) + sstep
        grid = (deg[None, None, :] < ds[:, None, None]) & (
            sht[None, None, :] < ss[None, :, None]
        )
        pose_auc[(dhi, shi)] = float(np.mean(grid))
    return dict(
        iou_mean=float(np.mean(iou)),
        deg_mean=float(np.mean(deg)),
        sht_mean=float(np.mean(sht)),
        iou_acc=iou_acc,
        pose_acc=pose_acc,
        iou_auc=iou_auc,
        pose_auc=pose_auc,
    )


def compute_metrics(
    iou, deg, sht, class_labels: Optional[np.ndarray] = None
) -> PoseMetrics:
    """Aggregate per-instance criteria into the reference's metric family
    (reference: evaluation_single.py:335-368). When ``class_labels`` is given,
    top-level numbers are CLASS MEANS (cutoop's Metrics.class_means)."""
    iou = np.asarray(iou)
    deg = np.asarray(deg)
    sht = np.asarray(sht)
    per_class = {}
    if class_labels is not None:
        class_labels = np.asarray(class_labels)
        for c in np.unique(class_labels):
            m = class_labels == c
            per_class[int(c)] = PoseMetrics(**_metrics_for(iou[m], deg[m], sht[m]), per_class={})
    if per_class:
        # class means: average each metric over classes
        def mean_over(key):
            vals = [getattr(pm, key) for pm in per_class.values()]
            if isinstance(vals[0], dict):
                return {k: float(np.mean([v[k] for v in vals])) for k in vals[0]}
            return float(np.mean(vals))

        return PoseMetrics(
            iou_mean=mean_over("iou_mean"),
            deg_mean=mean_over("deg_mean"),
            sht_mean=mean_over("sht_mean"),
            iou_acc=mean_over("iou_acc"),
            pose_acc=mean_over("pose_acc"),
            iou_auc=mean_over("iou_auc"),
            pose_auc=mean_over("pose_auc"),
            per_class=per_class,
        )
    return PoseMetrics(**_metrics_for(iou, deg, sht), per_class={})
