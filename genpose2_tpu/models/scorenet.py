"""Conditional pose score network s_theta(pose, t | features).

reference: networks/gf_algorithms/scorenet.py:109-275. Heads:
- 'RT'          one fused MLP -> pose_dim
- 'R_and_T'     separate rotation / translation MLPs
- 'Rx_Ry_and_T' (default) three MLPs for rot-x axis, rot-y axis, translation
All output layers are zero-initialized (reference: scorenet.py:15-21) so the
untrained score is exactly 0 and the initial reverse process is the prior.
The raw head output is divided by the marginal std (reference: :250-264).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from genpose2_tpu.models.layers import GaussianFourierProjection, MLP


class PoseScoreNet(nn.Module):
    marginal_std_fn: Callable  # t -> std (the SDE's marginal std)
    pose_dim: int = 9
    regression_head: str = "Rx_Ry_and_T"
    dino_dim: int = 0  # >0 only for dino='global' (dim 384 + embedding 60)

    @nn.compact
    def __call__(self, pts_feat, rgb_feat, sampled_pose, t):
        """pts_feat (B, 1024), rgb_feat (B, dino_dim) | None,
        sampled_pose (B, pose_dim), t (B, 1) -> score (B, pose_dim)."""
        t_feat = GaussianFourierProjection(128)(t[:, 0])
        t_feat = nn.relu(nn.Dense(128)(t_feat))
        pose_feat = MLP((256, 256), final_act=True)(sampled_pose)

        total = [pts_feat, t_feat, pose_feat]
        if self.dino_dim:
            total.append(rgb_feat)
        total_feat = jnp.concatenate(total, axis=-1)

        std = self.marginal_std_fn(t)  # (B, 1), broadcasts over pose_dim

        if self.regression_head == "RT":
            out = MLP((512, self.pose_dim), zero_final=True)(total_feat)
        elif self.regression_head == "R_and_T":
            rot = MLP((256, self.pose_dim - 3), zero_final=True)(total_feat)
            trans = MLP((256, 3), zero_final=True)(total_feat)
            out = jnp.concatenate([rot, trans], axis=-1)
        elif self.regression_head == "Rx_Ry_and_T":
            rot_x = MLP((256, 3), zero_final=True, name="fusion_tail_rot_x")(total_feat)
            rot_y = MLP((256, 3), zero_final=True, name="fusion_tail_rot_y")(total_feat)
            trans = MLP((256, 3), zero_final=True, name="fusion_tail_trans")(total_feat)
            out = jnp.concatenate([rot_x, rot_y, trans], axis=-1)
        else:
            raise NotImplementedError(self.regression_head)
        return out / (std + 1e-7)


def fast_score_weights(
    scorenet_params,
    scorenet_constants,
    pts_feat,
    rgb_feat=None,
    pose_dim: int = 9,
    regression_head: str = "Rx_Ry_and_T",
):
    """Fold a PoseScoreNet's parameters into the fast-path layout shared by
    ``make_fast_score_fn`` (XLA closure) and the fused RK4 ODE kernel
    (ops/ode_rk4.py): heads' first layers concatenated, second layers
    block-diagonal, and the loop-invariant pts/rgb first-layer contribution
    precomputed into ``static``."""
    p = scorenet_params
    fourier_W = scorenet_constants["GaussianFourierProjection_0"]["W"]  # (64,)
    t_dense = p["Dense_0"]
    pose_mlp = p["MLP_0"]

    if regression_head == "RT":
        head_names = ["MLP_1"]
    elif regression_head == "R_and_T":
        head_names = ["MLP_1", "MLP_2"]
    elif regression_head == "Rx_Ry_and_T":
        head_names = ["fusion_tail_rot_x", "fusion_tail_rot_y", "fusion_tail_trans"]
    else:
        raise NotImplementedError(regression_head)

    W1 = jnp.concatenate([p[h]["Dense_0"]["kernel"] for h in head_names], axis=1)
    b1 = jnp.concatenate([p[h]["Dense_0"]["bias"] for h in head_names], axis=0)
    # second layer as ONE block-diagonal matmul: each head's (w_i, d_i) kernel
    # occupies its own row/column block. 3x the (tiny) FLOPs of per-head
    # matmuls, but one op instead of three matmuls + a concat per score
    # evaluation — the ODE loop calls this 4x per RK4 step.
    W2bd = jax.scipy.linalg.block_diag(
        *[p[h]["Dense_1"]["kernel"] for h in head_names]
    )
    b2cat = jnp.concatenate([p[h]["Dense_1"]["bias"] for h in head_names])

    F = pts_feat.shape[-1]
    dyn_dim = 128 + 256  # t_feat + pose_feat widths
    # kernel row layout follows the concat order [pts, t, pose, rgb]
    static = pts_feat @ W1[:F]
    if rgb_feat is not None:
        static = static + rgb_feat @ W1[F + dyn_dim :]
    static = static + b1  # (B, sum widths)

    W1_dyn = W1[F : F + dyn_dim]
    return {
        "fourier_W": fourier_W,
        "t_dense": t_dense,
        "pose_mlp": pose_mlp,
        "static": static,
        "W1_dyn": W1_dyn,
        "W1_t": W1_dyn[:128],
        "W1_pose": W1_dyn[128:],
        "W2bd": W2bd,
        "b2cat": b2cat,
    }


def make_fast_score_fn(
    scorenet_params,
    scorenet_constants,
    marginal_std_fn: Callable,
    pts_feat,
    rgb_feat=None,
    pose_dim: int = 9,
    regression_head: str = "Rx_Ry_and_T",
    uniform_t: bool = False,
    compute_dtype: str = "float32",
):
    """Sampler fast path: an (x, t) -> score closure algebraically equal to
    ``PoseScoreNet.__call__`` but restructured for the ODE loop.

    The first Dense of every head consumes ``concat([pts_feat, t_feat,
    pose_feat, rgb_feat])``; the pts/rgb rows of its kernel act on
    loop-invariant features, i.e. ~75% of the per-evaluation FLOPs
    (1024+dino of 1408+dino rows) do not depend on (x, t). This closure
    precomputes that contribution ONCE and, per evaluation, runs only the
    dynamic rows — with all heads' first-layer kernels fused into a single
    matmul for MXU utilization. A fixed-grid RK4 sampler calls the score
    4 x num_steps times, so this is the eval pipeline's hot function.

    ``uniform_t=True`` (set by the agent's sampler path: every sampler
    evaluates the whole batch at ONE diffusion time per call) additionally
    computes the t-embedding and its first-layer contribution on a single row
    and broadcasts — the per-row dynamic matmul then runs only the pose rows.

    Parity with the module (same params) is asserted in
    tests/test_models.py::test_fast_score_fn_parity.
    """
    w = fast_score_weights(
        scorenet_params,
        scorenet_constants,
        pts_feat,
        rgb_feat,
        pose_dim=pose_dim,
        regression_head=regression_head,
    )
    fourier_W = w["fourier_W"]
    t_dense = w["t_dense"]
    pose_mlp = w["pose_mlp"]
    static = w["static"]
    W1_dyn = w["W1_dyn"]
    W1_t = w["W1_t"]
    W1_pose = w["W1_pose"]
    W2bd = w["W2bd"]
    b2cat = w["b2cat"]

    # per-evaluation matmul compute dtype: bf16 halves the ODE loop's MXU
    # time; the hoisted static part, the t embedding, biases, activations and
    # the final 1/std stay f32 (f32 accumulation via preferred_element_type)
    dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if dt == jnp.bfloat16:
        W1_pose = W1_pose.astype(dt)
        W1_dyn = W1_dyn.astype(dt)
        W2bd = W2bd.astype(dt)
        pose_mlp = jax.tree.map(lambda a: a.astype(dt) if a.ndim == 2 else a, pose_mlp)

    def _mm(a, w):
        return jnp.dot(a.astype(w.dtype), w, preferred_element_type=jnp.float32)

    def _t_embed(t):
        proj = t[:, 0:1] * fourier_W[None, :] * 2.0 * jnp.pi
        t_feat = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        return jax.nn.relu(t_feat @ t_dense["kernel"] + t_dense["bias"])

    def _heads(hidden, t):
        return (_mm(hidden, W2bd) + b2cat) / (marginal_std_fn(t) + 1e-7)

    def _pose_feat(x):
        h = x
        for layer in ("Dense_0", "Dense_1"):
            h = jax.nn.relu(_mm(h, pose_mlp[layer]["kernel"]) + pose_mlp[layer]["bias"])
        return h

    if uniform_t:

        def score(x, t):
            t_contrib = _t_embed(t[:1]) @ W1_t.astype(jnp.float32)  # one row
            hidden = jax.nn.relu(_mm(_pose_feat(x), W1_pose) + (static + t_contrib))
            return _heads(hidden, t)

    else:

        def score(x, t):
            dyn = jnp.concatenate([_t_embed(t), _pose_feat(x)], axis=-1)
            hidden = jax.nn.relu(_mm(dyn, W1_dyn) + static)
            return _heads(hidden, t)

    return score


class PoseDecoderNet(nn.Module):
    """EDM-preconditioned denoiser head (reference: scorenet.py:278-424, VE
    branch of the preconditioning: c_skip=1, c_out=sigma, c_in=1,
    c_noise=log(sigma/2)). Unused by the default 've' pipeline but kept for
    the 'edm' sde mode."""

    marginal_std_fn: Callable
    pose_dim: int = 9
    regression_head: str = "Rx_Ry_and_T"

    @nn.compact
    def __call__(self, pts_feat, rgb_feat, sampled_pose, t):
        sigma_t = self.marginal_std_fn(t)
        c_skip, c_out, c_in = 1.0, sigma_t, 1.0
        c_noise = jnp.log(sigma_t / 2.0)

        pose_feat = MLP((256, 256), final_act=True)(sampled_pose * c_in)
        # positional embedding of c_noise (reference: scorenet.py:91-106)
        num_ch = 128
        freqs = jnp.arange(num_ch // 2, dtype=jnp.float32) / (num_ch // 2)
        freqs = (1.0 / 10000.0) ** freqs
        emb = c_noise[:, 0:1] * freqs[None, :]
        sig_feat = jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)
        sig_feat = nn.relu(nn.Dense(128)(sig_feat))

        total_feat = jnp.concatenate([pts_feat, sig_feat, pose_feat], axis=-1)
        if self.regression_head == "RT":
            out = MLP((512, self.pose_dim), zero_final=True)(total_feat)
        elif self.regression_head == "Rx_Ry_and_T":
            rot_x = MLP((256, 3), zero_final=True)(total_feat)
            rot_y = MLP((256, 3), zero_final=True)(total_feat)
            trans = MLP((256, 3), zero_final=True)(total_feat)
            out = jnp.concatenate([rot_x, rot_y, trans], axis=-1)
        else:
            raise NotImplementedError(self.regression_head)
        return c_skip * sampled_pose + c_out * out
