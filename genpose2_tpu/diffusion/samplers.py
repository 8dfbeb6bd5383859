"""On-device samplers for the reverse-time generative process.

The reference integrates the probability-flow ODE with scipy RK45 **on the
host**, round-tripping pose tensors and re-launching the score network every
step (reference: networks/gf_algorithms/samplers.py:204-234 — a D2H/H2D
boundary per function evaluation). Here the entire integration runs inside one
XLA program:

- ``ode_sampler(method='rk45')`` — adaptive Dormand–Prince 5(4) in a
  ``lax.while_loop`` with scipy-compatible error control (RMS norm, same
  safety/min/max factors, same initial-step heuristic), for metric parity runs;
- ``ode_sampler(method='fixed')`` — fixed-grid RK4 via ``lax.scan``, the fast
  path (static step count -> fully unrolled pipeline, no host sync);
- ``pc_sampler`` — Predictor-Corrector (Langevin + Euler-Maruyama), scan;
- ``edm_sampler`` — EDM Heun 2nd order;
- ``ode_likelihood`` — Skilling-Hutchinson log-likelihood via ``jax.jvp``.

``score_fn(x, t)`` takes x (B, D) and t (B, 1) and returns the score (B, D);
conditioning features are closed over by the caller (they are computed once
per object and broadcast across the candidate axis, instead of the reference's
repeat-and-flatten, reference: networks/posenet_agent.py:510-527).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from genpose2_tpu.diffusion.sde import SDE
from genpose2_tpu.so3.rotations import normalize_rotation

# ---------------------------------------------------------------------------
# Dormand-Prince RK45 tableau (matches scipy.integrate.RK45)
# ---------------------------------------------------------------------------
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
]
_B = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84])
# error weights including the FSAL stage k7
_E = jnp.array([71 / 57600, 0.0, -71 / 16695, 71 / 1920, -17253 / 339200, 22 / 525, -1 / 40])

_SAFETY = 0.9
_MIN_FACTOR = 0.2
_MAX_FACTOR = 10.0


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(x**2))


class _RK45State(NamedTuple):
    t: jnp.ndarray
    y: jnp.ndarray
    f: jnp.ndarray  # f(t, y), FSAL carry
    h_abs: jnp.ndarray
    rejected: jnp.ndarray
    nsteps: jnp.ndarray
    done: jnp.ndarray


def rk45_integrate(
    f: Callable,
    t0: float,
    t1: float,
    y0: jnp.ndarray,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 2000,
):
    """Integrate dy/dt = f(t, y) from t0 to t1 (either direction) with adaptive
    Dormand-Prince 5(4), matching scipy.integrate.RK45 semantics: RMS error
    norm over the whole state (the reference flattens all candidates into one
    system, so step-size control is batch-global — same here), safety 0.9,
    factor clamps [0.2, 10]. Returns (y1, nsteps)."""
    direction = jnp.sign(jnp.asarray(t1 - t0))
    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    f0 = f(t0, y0)

    # --- scipy's _select_initial_step ---
    scale0 = atol + jnp.abs(y0) * rtol
    d0 = _rms_norm(y0 / scale0)
    d1 = _rms_norm(f0 / scale0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / jnp.maximum(d1, 1e-30))
    y1_probe = y0 + h0 * direction * f0
    f1_probe = f(t0 + h0 * direction, y1_probe)
    d2 = _rms_norm((f1_probe - f0) / scale0) / h0
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / 6.0),
    )
    h_init = jnp.minimum(jnp.minimum(100 * h0, h1), jnp.abs(jnp.asarray(t1 - t0)))

    interval = jnp.abs(jnp.asarray(t1 - t0))

    def step(state: _RK45State) -> _RK45State:
        t, y, fy, h_abs, rejected, nsteps, done = state
        h_abs = jnp.minimum(h_abs, jnp.abs(t1 - t))  # don't overshoot
        h = h_abs * direction

        k1 = fy
        k2 = f(t + _C[1] * h, y + h * (_A[1][0] * k1))
        k3 = f(t + _C[2] * h, y + h * (_A[2][0] * k1 + _A[2][1] * k2))
        k4 = f(t + _C[3] * h, y + h * (_A[3][0] * k1 + _A[3][1] * k2 + _A[3][2] * k3))
        k5 = f(
            t + _C[4] * h,
            y + h * (_A[4][0] * k1 + _A[4][1] * k2 + _A[4][2] * k3 + _A[4][3] * k4),
        )
        k6 = f(
            t + h,
            y
            + h
            * (_A[5][0] * k1 + _A[5][1] * k2 + _A[5][2] * k3 + _A[5][3] * k4 + _A[5][4] * k5),
        )
        y_new = y + h * (
            _B[0] * k1 + _B[2] * k3 + _B[3] * k4 + _B[4] * k5 + _B[5] * k6
        )
        t_new = t + h
        k7 = f(t_new, y_new)  # FSAL
        err = h * (
            _E[0] * k1
            + _E[2] * k3
            + _E[3] * k4
            + _E[4] * k5
            + _E[5] * k6
            + _E[6] * k7
        )
        scale = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
        err_norm = _rms_norm(err / scale)

        accept = err_norm < 1.0
        factor_acc = jnp.where(
            err_norm == 0.0,
            _MAX_FACTOR,
            jnp.minimum(_MAX_FACTOR, _SAFETY * err_norm ** (-0.2)),
        )
        factor_acc = jnp.where(rejected, jnp.minimum(1.0, factor_acc), factor_acc)
        factor_rej = jnp.maximum(_MIN_FACTOR, _SAFETY * err_norm ** (-0.2))

        min_step = 10.0 * jnp.finfo(dtype).eps * jnp.maximum(jnp.abs(t), 1e-3)
        # force-accept when the step can't shrink further (scipy would error out)
        accept = accept | (h_abs <= min_step)

        h_next = jnp.where(accept, h_abs * factor_acc, h_abs * factor_rej)
        h_next = jnp.maximum(h_next, min_step)
        t_out = jnp.where(accept, t_new, t)
        y_out = jnp.where(accept, y_new, y)
        f_out = jnp.where(accept, k7, fy)
        reached = jnp.abs(t_out - t0) >= interval - 1e-12
        return _RK45State(
            t_out, y_out, f_out, h_next, ~accept, nsteps + 1, done | reached
        )

    def cond(state: _RK45State):
        return (~state.done) & (state.nsteps < max_steps)

    init = _RK45State(
        jnp.asarray(t0, dtype),
        y0,
        f0,
        jnp.asarray(h_init, dtype),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, step, init)
    return out.y, out.nsteps


# ---------------------------------------------------------------------------
# Probability-flow ODE sampler
# ---------------------------------------------------------------------------
def _pf_ode_rhs(score_fn, sde: SDE, t, x):
    """dx/dt = f(x,t) - 0.5 g(t)^2 * score(x, t) (reference: samplers.py:210-219)."""
    B = x.shape[0]
    t_vec = jnp.full((B, 1), t, x.dtype)
    g = sde.diffusion_coeff(t)
    return sde.drift(x, t) - 0.5 * (g**2) * score_fn(x, t_vec)


def ode_sampler(
    key: jax.Array,
    score_fn: Callable,
    sde: SDE,
    batch_size: int,
    pose_dim: int,
    *,
    T0: Optional[float] = None,
    init_x: Optional[jnp.ndarray] = None,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    num_steps: Optional[int] = 500,
    denoise: bool = True,
    pose_mode: str = "rot_matrix",
    pts_center: Optional[jnp.ndarray] = None,
    method: str = "rk45",
    max_steps: int = 2000,
    return_trajectory: bool = False,
    fused_weights: Optional[dict] = None,
    compute_dtype: str = "float32",
):
    """Sample poses by integrating the reverse probability-flow ODE from T0 to
    sde.eps, entirely on device.

    With ``return_trajectory`` (method='fixed' only), additionally returns the
    (num_steps, B, D) in-process poses, rotation-normalized and re-centered —
    the reference's in_process_sample used for denoising videos
    (reference: samplers.py:235-255).

    Init semantics match the reference (samplers.py:195-201): with no
    ``init_x`` start from the prior at T0; a provided ``init_x`` (tracking
    warm start) has prior noise at level T0 *added* to it.

    Post-processing matches samplers.py:240-258: optional single denoise
    predictor step at eps, Gram-Schmidt rotation renormalization, and
    re-adding the point-cloud center to the translation.
    """
    T0 = sde.T if T0 is None else T0
    eps = sde.eps
    prior = sde.prior_sample(key, (batch_size, pose_dim), T=T0)
    x0 = prior if init_x is None else init_x + prior

    rhs = functools.partial(_pf_ode_rhs, score_fn, sde)

    if method == "rk45":
        x, nsteps = rk45_integrate(
            lambda t, y: rhs(t, y), T0, eps, x0, rtol=rtol, atol=atol, max_steps=max_steps
        )
    elif method == "fixed" and fused_weights is not None and not return_trajectory:
        # the whole integration as ONE Pallas program (ops/ode_rk4.py):
        # same butcher tableau and score math as the scan below, with the
        # pose tile and folded weights VMEM-resident for all steps
        from genpose2_tpu.ops.ode_rk4 import fused_rk4_integrate

        n = num_steps if num_steps is not None else 500
        x = fused_rk4_integrate(
            x0, fused_weights, sde, T0, n, compute_dtype=compute_dtype
        )
        traj = None
        nsteps = jnp.asarray(n)
    elif method == "fixed":
        n = num_steps if num_steps is not None else 500
        ts = jnp.linspace(T0, eps, n + 1)

        def rk4_step(x, i):
            t, t_next = ts[i], ts[i + 1]
            h = t_next - t
            k1 = rhs(t, x)
            k2 = rhs(t + h / 2, x + h / 2 * k1)
            k3 = rhs(t + h / 2, x + h / 2 * k2)
            k4 = rhs(t_next, x + h * k3)
            x_new = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            return x_new, (x_new if return_trajectory else None)

        x, traj = jax.lax.scan(rk4_step, x0, jnp.arange(n))
        nsteps = jnp.asarray(n)
    elif method == "euler":
        n = num_steps if num_steps is not None else 500
        ts = jnp.linspace(T0, eps, n + 1)

        def euler_step(x, i):
            h = ts[i + 1] - ts[i]
            return x + h * rhs(ts[i], x), None

        x, _ = jax.lax.scan(euler_step, x0, jnp.arange(n))
        nsteps = jnp.asarray(n)
    else:
        raise NotImplementedError(method)

    if denoise:
        # reverse-diffusion predictor step at eps (reference: samplers.py:240-249)
        t_vec = jnp.full((batch_size, 1), eps, x.dtype)
        g = sde.diffusion_coeff(jnp.asarray(eps))
        grad = score_fn(x, t_vec)
        drift = sde.drift(x, jnp.asarray(eps)) - (g**2) * grad
        x = x + drift * ((1.0 - eps) / (1000 if num_steps is None else num_steps))

    rot = normalize_rotation(x[..., :-3], pose_mode)
    trans = x[..., -3:]
    if pts_center is not None:
        trans = trans + pts_center
    final = jnp.concatenate([rot, trans], axis=-1)
    if return_trajectory and method == "fixed":
        t_rot = normalize_rotation(traj[..., :-3], pose_mode)
        t_trans = traj[..., -3:]
        if pts_center is not None:
            t_trans = t_trans + pts_center[None]
        return final, jnp.concatenate([t_rot, t_trans], axis=-1)
    return final, nsteps


# ---------------------------------------------------------------------------
# Predictor-Corrector sampler
# ---------------------------------------------------------------------------
def pc_sampler(
    key: jax.Array,
    score_fn: Callable,
    sde: SDE,
    batch_size: int,
    pose_dim: int,
    *,
    num_steps: int = 500,
    snr: float = 0.16,
    init_x: Optional[jnp.ndarray] = None,
    pose_mode: str = "rot_matrix",
    pts_center: Optional[jnp.ndarray] = None,
):
    """Langevin corrector + Euler-Maruyama predictor with per-step rotation
    renormalization (reference: samplers.py:113-177)."""
    kp, kloop = jax.random.split(key)
    x0 = sde.prior_sample(kp, (batch_size, pose_dim)) if init_x is None else init_x
    ts = jnp.linspace(1.0, sde.eps, num_steps)
    step_size = ts[0] - ts[1]
    noise_norm = jnp.sqrt(jnp.asarray(pose_dim, x0.dtype))

    def mid_normalize(x):
        if pose_mode in ("quat_wxyz", "quat_xyzw"):
            q = x[:, :4] / jnp.linalg.norm(x[:, :4], axis=-1, keepdims=True)
            return jnp.concatenate([q, x[:, 4:]], axis=-1)
        if pose_mode == "euler_xyz":
            return x
        a1 = x[:, :3] / jnp.linalg.norm(x[:, :3], axis=-1, keepdims=True)
        a2 = x[:, 3:6] / jnp.linalg.norm(x[:, 3:6], axis=-1, keepdims=True)
        return jnp.concatenate([a1, a2, x[:, 6:]], axis=-1)

    def step(carry, inp):
        x, _prev_mean = carry
        t, k = inp
        k1, k2 = jax.random.split(k)
        t_vec = jnp.full((batch_size, 1), t, x.dtype)
        # corrector (Langevin MCMC)
        grad = score_fn(x, t_vec)
        grad_norm = jnp.mean(jnp.linalg.norm(grad, axis=-1))
        langevin_eps = 2 * (snr * noise_norm / jnp.maximum(grad_norm, 1e-12)) ** 2
        x = x + langevin_eps * grad + jnp.sqrt(2 * langevin_eps) * jax.random.normal(
            k1, x.shape, x.dtype
        )
        x = mid_normalize(x)
        # predictor (Euler-Maruyama on the reverse SDE). Note: the reference
        # applies the reverse drift with a flipped sign for its positive step
        # (reference: samplers.py:163-165, `x + (f - g^2 s) * dt` with dt > 0
        # while time decreases), which diverges for VE; its scripts only ever
        # use the ODE sampler so the bug is latent. Here the step follows
        # Song et al.'s reverse-SDE discretization: x + (g^2 s - f) * dt.
        g = sde.diffusion_coeff(t)
        drift = (g**2) * grad - sde.drift(x, t)
        mean_x = x + drift * step_size
        x = mean_x + g * jnp.sqrt(step_size) * jax.random.normal(k2, x.shape, x.dtype)
        rot = normalize_rotation(x[..., :-3], pose_mode)
        x = jnp.concatenate([rot, x[..., -3:]], axis=-1)
        return (x, mean_x), None

    keys = jax.random.split(kloop, num_steps)
    (x, mean_x), _ = jax.lax.scan(step, (x0, x0), (ts, keys))

    rot = normalize_rotation(mean_x[..., :-3], pose_mode)
    trans = mean_x[..., -3:]
    if pts_center is not None:
        trans = trans + pts_center
    return jnp.concatenate([rot, trans], axis=-1)


# ---------------------------------------------------------------------------
# EDM Heun sampler
# ---------------------------------------------------------------------------
def edm_sampler(
    key: jax.Array,
    denoiser_fn: Callable,
    batch_size: int,
    pose_dim: int,
    *,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    s_churn: float = 0.0,
    s_noise: float = 1.0,
    pose_mode: str = "rot_matrix",
    pts_center: Optional[jnp.ndarray] = None,
):
    """Karras et al. Heun 2nd-order sampler (reference: samplers.py:261-340).

    denoiser_fn(x, sigma(B,1)) -> denoised x."""
    kl, kn = jax.random.split(key)
    latents = jax.random.normal(kl, (batch_size, pose_dim))
    i = jnp.arange(num_steps)
    t_steps = (
        sigma_max ** (1 / rho)
        + i / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    t_steps = jnp.concatenate([t_steps, jnp.zeros((1,))])

    gamma = min(s_churn / num_steps, jnp.sqrt(2.0) - 1) if s_churn > 0 else 0.0

    def denoise(x, sigma):
        return denoiser_fn(x, jnp.full((batch_size, 1), sigma, x.dtype))

    def step(x, inp):
        t_cur, t_next, k = inp
        t_hat = t_cur + gamma * t_cur
        x_hat = x + jnp.sqrt(jnp.maximum(t_hat**2 - t_cur**2, 0.0)) * s_noise * (
            jax.random.normal(k, x.shape, x.dtype)
        )
        d_cur = (x_hat - denoise(x_hat, t_hat)) / t_hat
        x_next = x_hat + (t_next - t_hat) * d_cur
        # 2nd-order correction (skipped on the final step where t_next == 0)
        def correct(x_next):
            d_prime = (x_next - denoise(x_next, t_next)) / t_next
            return x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)

        x_next = jax.lax.cond(t_next > 0, correct, lambda v: v, x_next)
        return x_next, None

    keys = jax.random.split(kn, num_steps)
    x0 = latents * t_steps[0]
    x, _ = jax.lax.scan(step, x0, (t_steps[:-1], t_steps[1:], keys))

    rot = normalize_rotation(x[..., :-3], pose_mode)
    trans = x[..., -3:]
    if pts_center is not None:
        trans = trans + pts_center
    return jnp.concatenate([rot, trans], axis=-1)


# ---------------------------------------------------------------------------
# Exact log-likelihood via the instantaneous change-of-variables formula
# ---------------------------------------------------------------------------
def ode_likelihood(
    key: jax.Array,
    score_fn: Callable,
    sde: SDE,
    x0: jnp.ndarray,
    *,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    max_steps: int = 2000,
):
    """Skilling-Hutchinson divergence estimate along the forward PF-ODE
    (reference: samplers.py:25-110). The reference computes the divergence with
    an explicit autograd.grad; here it is a single jvp in the epsilon
    direction. Returns (z_T, log_likelihood_bits)."""
    B, D = x0.shape
    epsilon = jax.random.normal(key, (B, D), x0.dtype)

    def rhs(t, state):
        x = state[:, :D]
        t_vec = jnp.full((B, 1), t, x.dtype)
        g = sde.diffusion_coeff(t)

        def vf(xx):
            return sde.drift(xx, t) - 0.5 * (g**2) * score_fn(xx, t_vec)

        dx, jvp_eps = jax.jvp(vf, (x,), (epsilon,))
        div = jnp.sum(jvp_eps * epsilon, axis=-1, keepdims=True)
        return jnp.concatenate([dx, div], axis=-1)

    state0 = jnp.concatenate([x0, jnp.zeros((B, 1), x0.dtype)], axis=-1)
    state1, _ = rk45_integrate(rhs, sde.eps, 1.0, state0, rtol=rtol, atol=atol, max_steps=max_steps)
    z = state1[:, :D]
    delta_logp = state1[:, -1]
    prior_logp = sde.prior_logp(z)
    return z, (prior_logp + delta_logp) / jnp.log(2.0)
