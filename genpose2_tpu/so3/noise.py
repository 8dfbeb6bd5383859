"""Pose jitter used for tracking init and scale-agent axis augmentation.

reference: utils/tracking_utils.py:10-75 (from CAPTRA): rotation noise is a
random-axis rotation with a truncated-normal angle, translation noise is
elementwise truncated normal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genpose2_tpu.so3.rotations import axis_angle_to_matrix


def _truncated_normal(key, shape, std, trunc_sigmas=2.0, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -trunc_sigmas, trunc_sigmas, shape, dtype)


def add_noise_to_R(key: jax.Array, R: jnp.ndarray, r_deg: float = 5.0) -> jnp.ndarray:
    """Perturb rotations (..., 3, 3) by a random-axis rotation of ~N(0, r_deg°)
    (truncated at 2 sigma). reference: utils/tracking_utils.py:10-43."""
    kaxis, kangle = jax.random.split(key)
    batch = R.shape[:-2]
    axis = jax.random.normal(kaxis, batch + (3,), R.dtype)
    angle = jnp.radians(_truncated_normal(kangle, batch, r_deg, dtype=R.dtype))
    dR = axis_angle_to_matrix(axis, angle)
    return jnp.einsum("...ij,...jk->...ik", dR, R)


def add_noise_to_RT(
    key: jax.Array, R: jnp.ndarray, t: jnp.ndarray, r_deg: float = 5.0, t_std: float = 0.03
):
    """Perturb (R, t): rotation as add_noise_to_R, translation += truncnorm(t_std).

    reference: utils/tracking_utils.py:59-75 (used for tracking first-frame init,
    evaluation_tracking.py:297).
    """
    kr, kt = jax.random.split(key)
    R_noisy = add_noise_to_R(kr, R, r_deg)
    t_noisy = t + _truncated_normal(kt, t.shape, t_std, dtype=t.dtype)
    return R_noisy, t_noisy
