"""Property and parity tests for the SDE / sampler library.

- marginal/diffusion formulas golden-checked against the reference formulas
  (reference: networks/gf_algorithms/sde.py:13-93), recomputed in numpy;
- the on-device RK45 is parity-checked against scipy.integrate.solve_ivp RK45
  with identical tolerances (the reference's actual solver, samplers.py:226);
- samplers are checked on analytic Gaussian scores (known reverse map).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import integrate

from genpose2_tpu.diffusion import (
    SDE,
    dsm_loss,
    edm_sampler,
    init_sde,
    ode_likelihood,
    ode_sampler,
    pc_sampler,
)
from genpose2_tpu.diffusion.samplers import rk45_integrate


class TestSDEFormulas:
    def test_ve_marginal(self):
        sde = init_sde("ve")
        t = np.linspace(0.01, 1.0, 7)
        _, std = sde.marginal_prob(None, jnp.asarray(t))
        expected = 0.01 * (50.0 / 0.01) ** t  # reference: sde.py:15-18
        np.testing.assert_allclose(np.asarray(std), expected, rtol=1e-5)
        g = sde.diffusion_coeff(jnp.asarray(t))
        expected_g = expected * np.sqrt(2 * (np.log(50.0) - np.log(0.01)))
        np.testing.assert_allclose(np.asarray(g), expected_g, rtol=1e-5)

    def test_vp_marginal(self):
        sde = init_sde("vp")
        t = np.linspace(0.05, 1.0, 7)
        x = np.ones((7,))
        mean, std = sde.marginal_prob(jnp.asarray(x), jnp.asarray(t))
        lmc = -0.25 * t**2 * (20 - 0.1) - 0.5 * t * 0.1  # reference: sde.py:39-43
        np.testing.assert_allclose(np.asarray(mean), np.exp(lmc) * x, rtol=1e-5)
        # f32 cancellation dominates near t=0, so compare with a small atol too
        np.testing.assert_allclose(
            np.asarray(std), np.sqrt(1 - np.exp(2 * lmc)), rtol=1e-4, atol=1e-5
        )

    def test_subvp_and_edm(self):
        subvp = init_sde("subvp")
        t = jnp.asarray([0.5])
        _, std = subvp.marginal_prob(None, t)
        lmc = -0.25 * 0.25 * 19.9 - 0.5 * 0.5 * 0.1
        np.testing.assert_allclose(float(std[0]), 1 - np.exp(2 * lmc), rtol=1e-5)
        edm = init_sde("edm")
        _, std = edm.marginal_prob(None, jnp.asarray([3.0]))
        assert float(std[0]) == 3.0
        assert edm.T == 80.0 and edm.eps == 0.002

    def test_prior_scaling(self):
        sde = init_sde("ve")
        key = jax.random.PRNGKey(0)
        z = sde.prior_sample(key, (20000, 4))
        assert abs(float(jnp.std(z)) - 50.0) < 1.0
        # T0 override scales the prior down (tracking warm start)
        z2 = sde.prior_sample(key, (20000, 4), T=0.25)
        expected = 0.01 * (5000.0) ** 0.25
        assert abs(float(jnp.std(z2)) - expected) < 0.05 * expected


class TestRK45Parity:
    def test_linear_ode_vs_scipy(self):
        # dy/dt = A y with a stiff-ish random A, backward integration like sampling
        rng = np.random.default_rng(0)
        A = rng.normal(size=(6, 6)).astype(np.float32) * 0.8
        y0 = rng.normal(size=(2, 6)).astype(np.float32)

        def f_jax(t, y):
            return y @ A.T

        y1, nsteps = rk45_integrate(f_jax, 1.0, 1e-5, jnp.asarray(y0), rtol=1e-5, atol=1e-5)
        res = integrate.solve_ivp(
            lambda t, y: (y.reshape(2, 6) @ A.T).reshape(-1),
            (1.0, 1e-5),
            y0.reshape(-1),
            rtol=1e-5,
            atol=1e-5,
            method="RK45",
        )
        y_scipy = res.y[:, -1].reshape(2, 6)
        np.testing.assert_allclose(np.asarray(y1), y_scipy, rtol=2e-4, atol=2e-4)
        assert int(nsteps) < 200

    def test_nonlinear_time_dependent(self):
        def f_jax(t, y):
            return -jnp.sin(y) * (1.0 + t)

        y0 = np.linspace(-1.0, 1.5, 8).astype(np.float32).reshape(2, 4)
        y1, _ = rk45_integrate(f_jax, 0.0, 3.0, jnp.asarray(y0), rtol=1e-6, atol=1e-6)
        res = integrate.solve_ivp(
            lambda t, y: -np.sin(y) * (1.0 + t),
            (0.0, 3.0),
            y0.reshape(-1),
            rtol=1e-6,
            atol=1e-6,
            method="RK45",
        )
        np.testing.assert_allclose(np.asarray(y1).reshape(-1), res.y[:, -1], atol=1e-4)


def _delta_score(mu, sde):
    """Analytic score of p_t for data = delta(mu): N(mu, sigma_t^2)."""

    def score_fn(x, t):
        _, std = sde.marginal_prob(None, t)
        return -(x - mu) / (std**2)

    return score_fn


class TestODESampler:
    @pytest.mark.parametrize("method", ["rk45", "fixed"])
    def test_recovers_delta_target(self, method):
        sde = init_sde("ve")
        mu = jnp.asarray(np.array([0.3, -0.5, 0.8, 0.1, 0.2, -0.7], np.float32))
        score_fn = _delta_score(mu, sde)
        key = jax.random.PRNGKey(1)
        out, nsteps = ode_sampler(
            key,
            score_fn,
            sde,
            batch_size=64,
            pose_dim=6,
            pose_mode="euler_xyz",
            method=method,
            num_steps=200,
        )
        err = np.abs(np.asarray(out) - np.asarray(mu)).max()
        # final marginal std is sigma_min = 0.01
        assert err < 0.05, f"{method}: max err {err}"

    def test_warm_start_matches_prior_plus_init(self):
        # init_x + prior(T0) start (reference: samplers.py:197-201)
        sde = init_sde("ve")
        mu = jnp.zeros((9,), jnp.float32)
        score_fn = _delta_score(mu, sde)
        key = jax.random.PRNGKey(2)
        init = jnp.tile(jnp.asarray([[0.0, 0, 0, 0, 0, 0, 0.2, 0.2, 0.2]]), (16, 1))
        out, _ = ode_sampler(
            key,
            score_fn,
            sde,
            batch_size=16,
            pose_dim=9,
            pose_mode="euler_xyz_sx_cx",
            T0=0.25,
            init_x=init,
            method="rk45",
        )
        assert np.isfinite(np.asarray(out)).all()
        # translation converges back to mu=0 despite warm start
        assert np.abs(np.asarray(out)[:, -3:]).max() < 0.25

    def test_pts_center_readded(self):
        sde = init_sde("ve")
        mu = jnp.zeros((6,), jnp.float32)
        center = jnp.tile(jnp.asarray([[1.0, 2.0, 3.0]]), (8, 1))
        out, _ = ode_sampler(
            jax.random.PRNGKey(3),
            _delta_score(mu, sde),
            sde,
            batch_size=8,
            pose_dim=6,
            pose_mode="euler_xyz",
            pts_center=center,
            method="fixed",
            num_steps=100,
        )
        np.testing.assert_allclose(
            np.asarray(out)[:, -3:], np.asarray(center), atol=0.06
        )

    def test_rot_matrix_output_is_orthonormal(self):
        sde = init_sde("ve")
        mu_rot = jnp.asarray([1.0, 0, 0, 0, 1.0, 0, 0.1, 0.1, 0.1], jnp.float32)
        out, _ = ode_sampler(
            jax.random.PRNGKey(4),
            _delta_score(mu_rot, sde),
            sde,
            batch_size=8,
            pose_dim=9,
            pose_mode="rot_matrix",
            method="fixed",
            num_steps=100,
        )
        a1 = np.asarray(out)[:, :3]
        a2 = np.asarray(out)[:, 3:6]
        np.testing.assert_allclose(np.linalg.norm(a1, axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(a2, axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.sum(a1 * a2, axis=-1), 0.0, atol=1e-5)


class TestPCSampler:
    def test_runs_and_recovers(self):
        sde = init_sde("ve")
        mu = jnp.asarray([0.5, -0.2, 0.1, 0.0, 0.3, -0.1], jnp.float32)
        out = pc_sampler(
            jax.random.PRNGKey(5),
            _delta_score(mu, sde),
            sde,
            batch_size=32,
            pose_dim=6,
            num_steps=200,
            pose_mode="euler_xyz",
        )
        assert np.isfinite(np.asarray(out)).all()
        err = np.abs(np.asarray(out).mean(0) - np.asarray(mu)).max()
        assert err < 0.1, err


class TestEDMSampler:
    def test_perfect_denoiser_recovers_target(self):
        mu = jnp.asarray([0.4, -0.3, 0.2, 0.1, 0.0, 0.6], jnp.float32)

        def denoiser(x, sigma):
            return jnp.broadcast_to(mu, x.shape)

        out = edm_sampler(
            jax.random.PRNGKey(6),
            denoiser,
            batch_size=16,
            pose_dim=6,
            num_steps=18,
            pose_mode="euler_xyz",
        )
        np.testing.assert_allclose(
            np.asarray(out), np.tile(np.asarray(mu), (16, 1)), atol=1e-3
        )


class TestLikelihood:
    def test_gaussian_ranking(self):
        # data = delta(mu): likelihood should rank points near mu above far ones
        sde = init_sde("ve")
        mu = jnp.zeros((4,), jnp.float32)
        score_fn = _delta_score(mu, sde)
        x_near = jnp.full((4, 4), 0.01)
        x_far = jnp.full((4, 4), 3.0)
        _, ll_near = ode_likelihood(jax.random.PRNGKey(7), score_fn, sde, x_near)
        _, ll_far = ode_likelihood(jax.random.PRNGKey(7), score_fn, sde, x_far)
        assert np.isfinite(np.asarray(ll_near)).all()
        assert (np.asarray(ll_near) > np.asarray(ll_far)).all()


class TestDSMLoss:
    def test_true_score_beats_zero_score(self):
        sde = init_sde("ve")
        key = jax.random.PRNGKey(8)
        # data ~ N(0, s^2): marginal score = -x / (s^2 + sigma_t^2)
        s = 0.5
        gt = jax.random.normal(key, (256, 9)) * s

        def true_score(x, t):
            _, std = sde.marginal_prob(None, t)
            return -x / (s**2 + std**2)

        def zero_score(x, t):
            return jnp.zeros_like(x)

        l_true = float(dsm_loss(jax.random.PRNGKey(9), true_score, gt, sde, repeat=8))
        l_zero = float(dsm_loss(jax.random.PRNGKey(9), zero_score, gt, sde, repeat=8))
        assert np.isfinite(l_true) and np.isfinite(l_zero)
        assert l_true < l_zero

    def test_repeat_reduces_variance(self):
        sde = init_sde("ve")
        gt = jnp.zeros((64, 9))

        def zero_score(x, t):
            return jnp.zeros_like(x)

        vals_r1 = [
            float(dsm_loss(jax.random.PRNGKey(i), zero_score, gt, sde, repeat=1))
            for i in range(8)
        ]
        vals_r16 = [
            float(dsm_loss(jax.random.PRNGKey(i), zero_score, gt, sde, repeat=16))
            for i in range(8)
        ]
        assert np.std(vals_r16) < np.std(vals_r1)


class TestEDMHeunDiscretizationParity:
    def test_matches_reference_heun_loop(self):
        """Step-exact parity of edm_sampler's Karras-Heun discretization with
        a numpy transcription of the reference's update equations
        (reference: samplers.py:261-340 cond_edm_sampler: rho-spaced t grid
        with appended 0, Euler step, 2nd-order correction skipped on the
        final step, S_churn=0). Same latents, same (deterministic) denoiser."""
        B, D = 8, 9
        num_steps, sigma_min, sigma_max, rho = 12, 0.002, 2.0, 7.0
        key = jax.random.PRNGKey(11)

        mu = np.linspace(-0.5, 0.5, D).astype(np.float32)

        def denoiser_np(x, sigma):
            # arbitrary smooth sigma-dependent map (not a real model)
            return np.tanh(x) / (1.0 + sigma) + mu * (sigma / (1.0 + sigma))

        def denoiser_jnp(x, sigma):
            return jnp.tanh(x) / (1.0 + sigma) + jnp.asarray(mu) * (
                sigma / (1.0 + sigma)
            )

        got = edm_sampler(
            key, denoiser_jnp, B, D, num_steps=num_steps,
            sigma_min=sigma_min, sigma_max=sigma_max, rho=rho,
            pose_mode="rot_matrix",
        )

        # mirror the sampler's internal latent draw, then run the reference
        # update equations in numpy
        kl, _ = jax.random.split(key)
        latents = np.asarray(jax.random.normal(kl, (B, D)))
        i = np.arange(num_steps)
        t = (
            sigma_max ** (1 / rho)
            + i / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
        ) ** rho
        # f32 like the on-device sampler (the reference upcasts to f64;
        # the discretization is identical — only accumulation precision
        # differs, covered by the tolerance)
        t = np.concatenate([t, [0.0]]).astype(np.float32)
        x = latents.astype(np.float32) * t[0]
        for n in range(num_steps):
            tc, tn = np.float32(t[n]), np.float32(t[n + 1])
            d = (x - denoiser_np(x, tc)) / tc
            xn = x + (tn - tc) * d
            if n < num_steps - 1:
                dp = (xn - denoiser_np(xn, tn)) / tn
                xn = x + (tn - tc) * (0.5 * d + 0.5 * dp)
            x = xn.astype(np.float32)

        from genpose2_tpu.so3.rotations import normalize_rotation

        want_rot = np.asarray(
            normalize_rotation(jnp.asarray(x[:, :-3], jnp.float32), "rot_matrix")
        )
        # f32 device math vs the numpy mirror: late steps divide by
        # sigma ~ 2e-3, amplifying f32 rounding to ~1e-4 absolute; a wrong
        # discretization (grid, step order, missing correction) errs at
        # O(0.1)
        np.testing.assert_allclose(
            np.asarray(got)[:, :-3], want_rot, rtol=0, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(got)[:, -3:], x[:, -3:], rtol=0, atol=2e-3
        )
