"""Forward SDE definitions (VE / VP / sub-VP / EDM) as pure functions.

Hyperparameters and formulas match the reference
(reference: networks/gf_algorithms/sde.py:13-142, themselves from
score_sde_pytorch). One deliberate correction: the drift is returned as a
*vector field* ``f(x, t)`` rather than a scalar coefficient — the reference
adds the scalar VP drift coefficient directly to the state
(reference: networks/gf_algorithms/samplers.py:163-165), which is only correct
for VE (drift = 0), the sole mode it ships with. Here VP/sub-VP drifts are
``-0.5 * beta_t * x`` as in Song et al.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from genpose2_tpu.config import SDEConfig


@dataclass(frozen=True)
class SDE:
    """A forward diffusion SDE dx = f(x,t) dt + g(t) dw on t in [0, T]."""

    mode: str
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    beta_0: float = 0.1
    beta_1: float = 20.0
    eps: float = 1e-5
    T: float = 1.0

    # ------------------------------------------------------------- marginals
    def marginal_prob(self, x, t):
        """Mean and std of p_t(x_t | x_0). t broadcastable against x.

        reference: sde.py:15-18 (ve), :39-43 (vp), :59-63 (subvp), :80-83 (edm).
        """
        t = jnp.asarray(t)
        if self.mode == "ve":
            std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
            mean = x
        elif self.mode == "vp":
            log_mean_coeff = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
            mean = None if x is None else jnp.exp(log_mean_coeff) * x
            std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        elif self.mode == "subvp":
            log_mean_coeff = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
            mean = None if x is None else jnp.exp(log_mean_coeff) * x
            std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
        elif self.mode == "edm":
            std = t
            mean = x
        else:
            raise NotImplementedError(self.mode)
        return mean, std

    def marginal_std(self, t):
        return self.marginal_prob(None, t)[1]

    # ----------------------------------------------------------- drift/diff
    def diffusion_coeff(self, t):
        """g(t). reference: sde.py:21-27, :46-50, :66-71, :86-89."""
        t = jnp.asarray(t)
        if self.mode == "ve":
            sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
            return sigma * jnp.sqrt(2.0 * (jnp.log(self.sigma_max) - jnp.log(self.sigma_min)))
        if self.mode == "vp":
            beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
            return jnp.sqrt(beta_t)
        if self.mode == "subvp":
            beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
            discount = 1.0 - jnp.exp(-2.0 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t**2)
            return jnp.sqrt(beta_t * discount)
        if self.mode == "edm":
            return jnp.sqrt(2.0 * t)
        raise NotImplementedError(self.mode)

    def drift(self, x, t):
        """f(x, t)."""
        t = jnp.asarray(t)
        if self.mode in ("ve", "edm"):
            return jnp.zeros_like(x)
        if self.mode in ("vp", "subvp"):
            beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
            return -0.5 * beta_t * x
        raise NotImplementedError(self.mode)

    # ---------------------------------------------------------------- prior
    def prior_sample(self, key, shape, T=None, dtype=jnp.float32):
        """Sample from the prior p_T. For VE, T may be overridden to start the
        reverse process early (warm-started tracking; reference: sde.py:30-34
        takes T as an argument)."""
        T = self.T if T is None else T
        z = jax.random.normal(key, shape, dtype)
        if self.mode == "ve":
            _, std = self.marginal_prob(None, jnp.asarray(T, dtype))
            return z * std
        if self.mode in ("vp", "subvp"):
            return z
        if self.mode == "edm":
            return z * self.sigma_max
        raise NotImplementedError(self.mode)

    def prior_logp(self, z):
        """log N(z; 0, sigma_T^2 I) summed over the last axis (VE/EDM), or
        standard normal (VP). reference: samplers.py:14-22."""
        N = z.shape[-1]
        if self.mode in ("ve", "edm"):
            sigma = self.sigma_max if self.mode == "ve" else self.edm_like_sigma()
            return -N / 2.0 * jnp.log(2 * jnp.pi * sigma**2) - jnp.sum(z**2, axis=-1) / (
                2 * sigma**2
            )
        return -N / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(z**2, axis=-1) / 2.0

    def edm_like_sigma(self):
        return self.sigma_max


def init_sde(mode_or_cfg) -> SDE:
    """Build an SDE with the reference's hyperparameters
    (reference: sde.py:96-142)."""
    if isinstance(mode_or_cfg, SDEConfig):
        cfg = mode_or_cfg
        mode = cfg.mode
    else:
        cfg = SDEConfig(mode=mode_or_cfg)
        mode = mode_or_cfg
    if mode == "ve":
        return SDE("ve", sigma_min=cfg.sigma_min, sigma_max=cfg.sigma_max, eps=1e-5, T=1.0)
    if mode == "vp":
        return SDE("vp", beta_0=cfg.beta_0, beta_1=cfg.beta_1, eps=1e-3, T=1.0)
    if mode == "subvp":
        return SDE("subvp", beta_0=cfg.beta_0, beta_1=cfg.beta_1, eps=1e-3, T=1.0)
    if mode == "edm":
        return SDE(
            "edm",
            sigma_min=cfg.edm_sigma_min,
            sigma_max=cfg.edm_sigma_max,
            eps=cfg.edm_sigma_min,
            T=cfg.edm_sigma_max,
        )
    raise NotImplementedError(mode)
