"""Parity tests for the fused whole-integration RK4 kernel (ops/ode_rk4.py)
against the XLA lax.scan fixed-grid path (diffusion/samplers.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpose2_tpu.config import tiny_test_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.diffusion import init_sde
from genpose2_tpu.models.scorenet import fast_score_weights, make_fast_score_fn
from genpose2_tpu.ops.ode_rk4 import fused_rk4_integrate
from genpose2_tpu.training import PoseAgent

CFG = tiny_test_config()


def _agent_and_state(sde_mode="ve"):
    cfg = CFG.replace(sde=dataclasses.replace(CFG.sde, mode=sde_mode))
    agent = PoseAgent(cfg, "score", steps_per_epoch=4)
    data = SyntheticPoseData(num_points=cfg.model.num_points)
    batch = data.batch(jax.random.PRNGKey(0), 3)
    batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
    state = agent.init_state(jax.random.PRNGKey(1), batch)
    return cfg, agent, state, batch


def _weights_and_fn(cfg, agent, state, batch, K):
    pts_feat, rgb_feat = agent.extract_features(state, batch)
    feat_rep = jnp.repeat(pts_feat, K, axis=0)
    v = {
        "params": state.ema_params,
        "constants": state.constants,
    }
    w = fast_score_weights(
        v["params"]["pose_net"],
        v["constants"]["pose_net"],
        feat_rep,
        None,
        pose_dim=cfg.model.pose_dim,
        regression_head=cfg.model.regression_head,
    )
    sfn = make_fast_score_fn(
        v["params"]["pose_net"],
        v["constants"]["pose_net"],
        agent.model.marginal_std_fn,
        feat_rep,
        None,
        pose_dim=cfg.model.pose_dim,
        regression_head=cfg.model.regression_head,
    )
    return w, sfn


@pytest.mark.parametrize("sde_mode", ["ve", "vp", "subvp"])
def test_fused_integration_matches_scan(sde_mode):
    cfg, agent, state, batch = _agent_and_state(sde_mode)
    K = 4
    B = 3
    R = B * K
    D = cfg.model.pose_dim
    w, sfn = _weights_and_fn(cfg, agent, state, batch, K)
    sde = init_sde(cfg.sde)

    x0 = jax.random.normal(jax.random.PRNGKey(2), (R, D)) * 0.7
    n = 6
    T0 = 0.8

    # hand-rolled scan identical to ode_sampler's fixed branch
    ts = jnp.linspace(T0, sde.eps, n + 1)

    def rhs(t, x):
        t_vec = jnp.full((R, 1), t, x.dtype)
        g = sde.diffusion_coeff(t)
        return sde.drift(x, t) - 0.5 * (g**2) * sfn(x, t_vec)

    def rk4_step(x, i):
        t, t_next = ts[i], ts[i + 1]
        h = t_next - t
        k1 = rhs(t, x)
        k2 = rhs(t + h / 2, x + h / 2 * k1)
        k3 = rhs(t + h / 2, x + h / 2 * k2)
        k4 = rhs(t_next, x + h * k3)
        return x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4), None

    ref, _ = jax.lax.scan(rk4_step, x0, jnp.arange(n))
    out = fused_rk4_integrate(x0, w, sde, T0, n, compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_sample_candidates_fused_matches_xla_path():
    """End-to-end: sample_candidates(method='fixed') with the fused kernel on
    vs off produces the same candidates (incl. denoise + normalization +
    center re-add)."""
    cfg, agent, state, batch = _agent_and_state()
    key = jax.random.PRNGKey(7)
    poses_fused = agent.sample_candidates(
        state, batch, key, repeat_num=4, T0=0.7, method="fixed", num_steps=6
    )

    cfg_off = cfg.replace(
        sampler=dataclasses.replace(cfg.sampler, fused_fixed=False)
    )
    agent_off = PoseAgent(cfg_off, "score", steps_per_epoch=4)
    poses_xla = agent_off.sample_candidates(
        state, batch, key, repeat_num=4, T0=0.7, method="fixed", num_steps=6
    )
    np.testing.assert_allclose(
        np.asarray(poses_fused), np.asarray(poses_xla), atol=5e-4, rtol=1e-4
    )


def test_sample_candidates_fused_warm_start():
    """Tracking-style warm start rides through the fused path."""
    cfg, agent, state, batch = _agent_and_state()
    key = jax.random.PRNGKey(9)
    init = jnp.tile(
        jnp.asarray([1, 0, 0, 0, 1, 0, 0.02, -0.01, 0.5], jnp.float32), (3, 1)
    )
    p1 = agent.sample_candidates(
        state, batch, key, repeat_num=2, T0=0.2, init_x=init,
        method="fixed", num_steps=5,
    )
    cfg_off = cfg.replace(
        sampler=dataclasses.replace(cfg.sampler, fused_fixed=False)
    )
    agent_off = PoseAgent(cfg_off, "score", steps_per_epoch=4)
    p2 = agent_off.sample_candidates(
        state, batch, key, repeat_num=2, T0=0.2, init_x=init,
        method="fixed", num_steps=5,
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-4, rtol=1e-4)


def test_row_padding_exact():
    """R not a multiple of the row tile: padded rows must not perturb real
    ones (zero weight rows keep padding zero)."""
    cfg, agent, state, batch = _agent_and_state()
    K = 3  # R = 9, heavily padded
    w, sfn = _weights_and_fn(cfg, agent, state, batch, K)
    sde = init_sde(cfg.sde)
    R, D = 9, cfg.model.pose_dim
    x0 = jax.random.normal(jax.random.PRNGKey(3), (R, D))
    out = fused_rk4_integrate(x0, w, sde, 0.9, 4, compute_dtype="float32")
    assert out.shape == (R, D)
    assert np.isfinite(np.asarray(out)).all()
