"""Rotation math in pure jnp, batched over leading dimensions.

Semantics match the reference's vendored PyTorch3D conversions
(reference: utils/transforms/rotation_conversions.py) and the pose-representation
conventions of utils/misc.py:121-197:

- quaternions are (w, x, y, z) unless stated otherwise;
- the 9D "rot_matrix" pose representation is ``[col0(3), col1(3), trans(3)]``,
  i.e. the first two COLUMNS of the rotation matrix followed by translation
  (reference: utils/misc.py:148,191 applies a transpose around the row-major
  pytorch3d 6D conversion, which makes the stored axes matrix columns).

All functions are jit/vmap-friendly (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def get_pose_dim(pose_mode: str) -> int:
    """reference: utils/genpose_utils.py:21-38"""
    return {"quat_wxyz": 7, "quat_xyzw": 7, "euler_xyz": 6, "euler_xyz_sx_cx": 9, "rot_matrix": 9}[
        pose_mode
    ]


def _normalize(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), _EPS)


# ---------------------------------------------------------------- quaternions
def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz unit quaternion -> (..., 3, 3).

    reference: utils/transforms/rotation_conversions.py (quaternion_to_matrix).
    """
    q = _normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    two_s = 2.0
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz, numerically stable branch-free variant.

    Uses the 4-candidate construction (one candidate per largest diagonal term)
    and selects the best by weight, as in pytorch3d's implementation
    (reference: utils/transforms/rotation_conversions.py matrix_to_quaternion).
    """
    batch = R.shape[:-2]
    m = R.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs2, 0.0))

    # candidate quaternions (unscaled), rows: w,x,y,z candidates
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    quat_candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)

    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1 * _EPS)
    quat_candidates = quat_candidates / denom

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=R.dtype)
    q = jnp.einsum(
        "...c,...cd->...d", onehot, quat_candidates, precision=jax.lax.Precision.HIGHEST
    )
    return _normalize(q)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions, (..., 4) x (..., 4) -> (..., 4)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def axis_angle_to_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues. axis (..., 3) unit, angle (...) radians -> (..., 3, 3)."""
    axis = _normalize(axis)
    x, y, z = jnp.moveaxis(axis, -1, 0)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1 - c
    m = jnp.stack(
        [
            c + x * x * C, x * y * C - z * s, x * z * C + y * s,
            y * x * C + z * s, c + y * y * C, y * z * C - x * s,
            z * x * C - y * s, z * y * C + x * s, c + z * z * C,
        ],
        axis=-1,
    )
    return m.reshape(angle.shape + (3, 3))


# ------------------------------------------------------------------ 6D (cols)
def rot6d_cols_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) = [col0, col1] -> (..., 3, 3) via Gram-Schmidt.

    Matches ``rotation_6d_to_matrix(d6).permute(0, 2, 1)`` of the reference
    (reference: utils/misc.py:148): b1 = norm(a1); b2 = norm(a2 - (b1.a2) b1);
    b3 = b1 x b2; columns of R are (b1, b2, b3).
    """
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = _normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)  # columns


def matrix_to_rot6d_cols(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6) = [col0, col1] (reference: utils/misc.py:191)."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


# --------------------------------------------------------------------- euler
def euler_zyx_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) ZYX intrinsic angles -> (..., 3, 3).

    Matches ``euler_angles_to_matrix(angles, "ZYX")`` of pytorch3d: R = Rz @ Ry @ Rx
    with angles given in the order (z, y, x) (reference: utils/misc.py:154-156).
    """
    az, ay, ax = euler[..., 0], euler[..., 1], euler[..., 2]

    def _rx(a):
        c, s = jnp.cos(a), jnp.sin(a)
        o, l = jnp.zeros_like(a), jnp.ones_like(a)
        return jnp.stack([l, o, o, o, c, -s, o, s, c], -1).reshape(a.shape + (3, 3))

    def _ry(a):
        c, s = jnp.cos(a), jnp.sin(a)
        o, l = jnp.zeros_like(a), jnp.ones_like(a)
        return jnp.stack([c, o, s, o, l, o, -s, o, c], -1).reshape(a.shape + (3, 3))

    def _rz(a):
        c, s = jnp.cos(a), jnp.sin(a)
        o, l = jnp.zeros_like(a), jnp.ones_like(a)
        return jnp.stack([c, -s, o, s, c, o, o, o, l], -1).reshape(a.shape + (3, 3))

    return jnp.matmul(jnp.matmul(_rz(az), _ry(ay), precision=jax.lax.Precision.HIGHEST), _rx(ax), precision=jax.lax.Precision.HIGHEST)


def matrix_to_euler_zyx(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) angles (z, y, x) with R = Rz @ Ry @ Rx."""
    ay = jnp.arcsin(-jnp.clip(R[..., 2, 0], -1.0, 1.0))
    az = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    ax = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([az, ay, ax], axis=-1)


# ----------------------------------------------------- pose-mode dispatching
def get_rot_matrix(batch_rot: jnp.ndarray, pose_mode: str) -> jnp.ndarray:
    """Rotation part of a pose representation -> (..., 3, 3).

    reference: utils/misc.py:121-160.
    """
    if pose_mode == "quat_wxyz":
        return quaternion_to_matrix(batch_rot)
    if pose_mode == "quat_xyzw":
        return quaternion_to_matrix(batch_rot[..., [3, 0, 1, 2]])
    if pose_mode == "rot_matrix":
        return rot6d_cols_to_matrix(batch_rot)
    if pose_mode == "euler_xyz":
        return euler_zyx_to_matrix(batch_rot)
    if pose_mode == "euler_xyz_sx_cx":
        theta = jnp.arctan2(batch_rot[..., :3], batch_rot[..., 3:6])
        return euler_zyx_to_matrix(theta)
    raise NotImplementedError(pose_mode)


def get_pose_representation(R: jnp.ndarray, pose_mode: str) -> jnp.ndarray:
    """(..., 3, 3) -> rotation part of the pose representation.

    reference: utils/misc.py:163-197.
    """
    if pose_mode == "quat_xyzw":
        q = matrix_to_quaternion(R)
        return q[..., [1, 2, 3, 0]]
    if pose_mode == "quat_wxyz":
        return matrix_to_quaternion(R)
    if pose_mode == "rot_matrix":
        return matrix_to_rot6d_cols(R)
    if pose_mode == "euler_xyz":
        return matrix_to_euler_zyx(R)
    if pose_mode == "euler_xyz_sx_cx":
        e = matrix_to_euler_zyx(R)
        return jnp.concatenate([jnp.sin(e), jnp.cos(e)], axis=-1)
    raise NotImplementedError(pose_mode)


def normalize_rotation(rotation: jnp.ndarray, pose_mode: str) -> jnp.ndarray:
    """Project the rotation part of a pose representation back to the manifold.

    reference: utils/misc.py:327-344.
    """
    if pose_mode in ("quat_wxyz", "quat_xyzw"):
        return _normalize(rotation)
    if pose_mode == "rot_matrix":
        R = rot6d_cols_to_matrix(rotation)
        return matrix_to_rot6d_cols(R)
    if pose_mode == "euler_xyz_sx_cx":
        theta = jnp.arctan2(rotation[..., :3], rotation[..., 3:6])
        return jnp.concatenate([jnp.sin(theta), jnp.cos(theta)], axis=-1)
    if pose_mode == "euler_xyz":
        return rotation
    raise NotImplementedError(pose_mode)


def normalize_pose(pose: jnp.ndarray, pose_mode: str) -> jnp.ndarray:
    """normalize_rotation applied to pose[..., :-3], translation untouched."""
    rot = normalize_rotation(pose[..., :-3], pose_mode)
    return jnp.concatenate([rot, pose[..., -3:]], axis=-1)


# ------------------------------------------------------------ SE(3) utilities
def inverse_RT(R: jnp.ndarray, t: jnp.ndarray):
    """Invert (R (...,3,3), t (...,3)). reference: utils/misc.py:258-270."""
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t, precision=jax.lax.Precision.HIGHEST)
    return Rinv, tinv


def transform_batch_pts(
    pts: jnp.ndarray, pose: jnp.ndarray, pose_mode: str = "rot_matrix", inverse_pose: bool = False
) -> jnp.ndarray:
    """Apply pose [rot_repr, trans] to the xyz channels of (B, N, C>=3) points.

    reference: utils/misc.py:207-255.
    """
    rot_dim = get_pose_dim(pose_mode) - 3
    R = get_rot_matrix(pose[..., :rot_dim], pose_mode)
    t = pose[..., rot_dim:]
    if inverse_pose:
        R, t = inverse_RT(R, t)
    xyz = jnp.einsum("...ij,...nj->...ni", R, pts[..., :3], precision=jax.lax.Precision.HIGHEST) + t[..., None, :]
    return jnp.concatenate([xyz, pts[..., 3:]], axis=-1)


# ------------------------------------------------------- quaternion averaging
def average_quaternion_batch(Q: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted chordal-L2 mean of quaternions via the top eigenvector of the
    weighted outer-product matrix. Q: (B, K, 4) wxyz -> (B, 4).

    reference: utils/misc.py:295-317 (sign-aligns to w>0, eigh, re-orients).
    """
    B, K, _ = Q.shape
    if weights is None:
        weights = jnp.full((B, K), 1.0 / K, dtype=Q.dtype)
    weight_sum = jnp.sum(weights, axis=-1)
    oriented = jnp.where(Q[..., 0:1] > 0, Q, -Q)
    A = jnp.einsum("bki,bkj,bk->bij", oriented, oriented, weights, precision=jax.lax.Precision.HIGHEST)
    A = A / weight_sum[:, None, None]
    _, vecs = jnp.linalg.eigh(A)
    q_avg = vecs[..., -1]  # eigenvector of the largest eigenvalue
    return jnp.where(q_avg[..., 0:1] > 0, q_avg, -q_avg)


def average_quaternion_batch_fast(
    Q: jnp.ndarray, weights: jnp.ndarray | None = None, num_iters: int = 40
) -> jnp.ndarray:
    """Power-iteration variant of :func:`average_quaternion_batch` for the
    eval hot path: the top eigenvector of the 4x4 weighted outer-product
    matrix via ``num_iters`` normalized matvecs instead of a batched eigh
    (XLA lowers small batched eigh to a host-unfriendly QR loop on TPU).

    Init = the sign-aligned weighted mean quaternion, which has positive
    overlap with the principal eigenvector whenever the cluster is tighter
    than a hemisphere (the pipeline's retained candidates are); convergence is
    geometric in lambda2/lambda1. Agreement with the exact eigh is asserted in
    tests/test_so3.py for unimodal AND imbalanced-bimodal sets.

    Convergence analysis for the pipeline's regimes: for two well-separated
    modes with weight fractions w1 > w2, lambda2/lambda1 ~ w2/w1, so a 60/40
    split converges to <1e-6 in ~35 iterations. The only slow case is a near
    50/50 bimodal split, where lambda1 ~ lambda2 and the chordal mean itself
    is ill-defined — ANY unit vector in the top eigenspace is an equally
    (in)valid answer, including the one eigh happens to pick. The default
    pipeline additionally clusters (DBSCAN) and re-averages the winning mode,
    so this value only survives when no cluster exists at all.
    """
    B, K, _ = Q.shape
    if weights is None:
        weights = jnp.full((B, K), 1.0 / K, dtype=Q.dtype)
    weight_sum = jnp.sum(weights, axis=-1)
    oriented = jnp.where(Q[..., 0:1] > 0, Q, -Q)
    A = jnp.einsum(
        "bki,bkj,bk->bij", oriented, oriented, weights, precision=jax.lax.Precision.HIGHEST
    )
    A = A / jnp.maximum(weight_sum, 1e-12)[:, None, None]

    v0 = jnp.einsum("bk,bki->bi", weights, oriented)
    # degenerate all-cancelling init -> fall back to e_w
    small = jnp.linalg.norm(v0, axis=-1, keepdims=True) < 1e-6
    v0 = jnp.where(small, jnp.array([1.0, 0.0, 0.0, 0.0], Q.dtype), v0)

    def body(v, _):
        v = jnp.einsum("bij,bj->bi", A, v, precision=jax.lax.Precision.HIGHEST)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return v, None

    v, _ = jax.lax.scan(body, v0 / jnp.maximum(jnp.linalg.norm(v0, axis=-1, keepdims=True), 1e-12), None, length=num_iters)
    return jnp.where(v[..., 0:1] > 0, v, -v)


# ----------------------------------------------------------------- embeddings
def encode_axes(axes: jnp.ndarray, dim: int) -> jnp.ndarray:
    """sin/cos positional encoding of a flattened axes tensor.

    axes (B, ...) -> (B, 2 * numel * dim). reference: utils/genpose_utils.py:8-18.
    """
    bs = axes.shape[0]
    flat = axes.reshape(bs, -1, 1)
    exponent = (2.0 ** jnp.arange(dim, dtype=flat.dtype)).reshape(1, 1, -1)
    sin = jnp.sin(exponent * flat).reshape(bs, -1)
    cos = jnp.cos(exponent * flat).reshape(bs, -1)
    return jnp.concatenate([sin, cos], axis=-1)


def rotation_angle_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between rotation matrices, in degrees."""
    Rd = jnp.einsum("...ij,...kj->...ik", R1, R2, precision=jax.lax.Precision.HIGHEST)
    tr = Rd[..., 0, 0] + Rd[..., 1, 1] + Rd[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))
