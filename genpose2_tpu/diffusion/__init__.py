from genpose2_tpu.diffusion.sde import SDE, init_sde
from genpose2_tpu.diffusion.losses import dsm_loss, edm_loss
from genpose2_tpu.diffusion.samplers import (
    ode_sampler,
    pc_sampler,
    edm_sampler,
    ode_likelihood,
)

__all__ = [
    "SDE",
    "init_sde",
    "dsm_loss",
    "edm_loss",
    "ode_sampler",
    "pc_sampler",
    "edm_sampler",
    "ode_likelihood",
]
