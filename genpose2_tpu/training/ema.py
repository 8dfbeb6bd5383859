"""Exponential moving average of parameters as a pure pytree transform.

reference: networks/gf_algorithms/score_utils.py:4-96 — shadow params with a
warmup-capped decay min(decay, (1 + n) / (10 + n)); the reference's
store/copy_to/restore juggling (posenet_agent.py:402-438) is unnecessary in a
functional setting: the EMA tree is just another field of the train state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(jnp.asarray, params)


def ema_update(ema_params, new_params, num_updates, decay: float = 0.999):
    """One EMA step; returns (new_ema_params, num_updates + 1)."""
    d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
    new_ema = jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p), ema_params, new_params)
    return new_ema, num_updates + 1
