"""Experiment: vmapped dual-encoder forward (score + energy weights stacked)
vs two sequential fast_fus_forward calls at the flagship shapes.

At the honest r5 bench basis the pipeline runs TWO structurally identical
Fus-encoder forwards per iteration (score agent in program A, energy agent
in program B) on the SAME point clouds with different weights. Stacking the
two param trees on a leading axis and vmapping fast_fus_forward runs both
in one program: every XLA matmul doubles its batch (better MXU utilization
at the small stages) and each Pallas kernel launches once with a 2x grid
instead of twice.

Usage (TPU):  PYTHONPATH=/root/repo:/root/.axon_site \
              python scripts/exp_dual_encoder.py
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

import numpy as np

from genpose2_tpu.config import PointNet2Config
from genpose2_tpu.models.fast_encoder import fast_fus_forward
from genpose2_tpu.models.pointnet2 import PointNet2ClsMSGFus

REPS = 40
B, N, C_IN = 64, 1024, 384  # flagship: 1024 pts + 384-d dino features


def steady(fn, *args):
    @jax.jit
    def loop(seed, *a):
        def body(carry, _):
            out = fn(*jax.tree.map(
                lambda t: t + (0.0 * carry).astype(t.dtype)
                if isinstance(t, jax.Array) and t.dtype != jnp.int32 else t,
                list(a)))
            bump = jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)) * 1e-9
            return carry + bump, None

        c, _ = jax.lax.scan(body, jnp.float32(seed), jnp.arange(REPS))
        return c

    _ = float(loop(0.0, *args))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(loop(float(i + 1), *args))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e3


def main():
    cfg = PointNet2Config(compute_dtype="bfloat16")
    model = PointNet2ClsMSGFus(cfg)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, N, 3 + C_IN)), jnp.float32)

    def mk_vars(seed):
        v = model.init(
            {"params": jax.random.PRNGKey(seed), "aug": jax.random.PRNGKey(1)},
            pc[:2],
        )
        return {"params": v["params"], "batch_stats": v["batch_stats"]}

    v_score = mk_vars(0)
    v_energy = mk_vars(2)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), v_score, v_energy)

    def seq(pc_in):
        return (fast_fus_forward(v_score, pc_in, cfg),
                fast_fus_forward(v_energy, pc_in, cfg))

    def dual(pc_in):
        return jax.vmap(lambda v: fast_fus_forward(v, pc_in, cfg))(stacked)

    # parity first
    a0, a1 = seq(pc)
    d = dual(pc)
    err = max(float(jnp.max(jnp.abs(d[0] - a0))), float(jnp.max(jnp.abs(d[1] - a1))))
    print(f"parity maxerr = {err:.3e}", flush=True)

    t_seq = steady(seq, pc)
    print(f"sequential 2x forward: {t_seq:.3f} ms/iter", flush=True)
    t_dual = steady(dual, pc)
    print(f"vmapped dual forward:  {t_dual:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
