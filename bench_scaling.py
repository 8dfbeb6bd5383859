"""Data/candidate-parallel scaling harness.

Measures the eval pipeline (sample -> aggregate) at 1, 2, 4, 8 devices on
whatever mesh is available (run with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
for the virtual-mesh check, or on a real multi-chip slice). Prints one JSON
line per device count with throughput and parallel efficiency.
"""

import json
import time

import jax
import jax.numpy as jnp

from genpose2_tpu.config import ModelConfig, default_config, tiny_test_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates
from genpose2_tpu.parallel import make_mesh, replicate, shard_batch
from genpose2_tpu.training import PoseAgent


def main(tiny: bool = None):
    n_dev = len(jax.devices())
    tiny = (jax.default_backend() == "cpu") if tiny is None else tiny
    cfg = tiny_test_config() if tiny else default_config().replace(model=ModelConfig(dino="none"))
    B_per_dev = 4 if tiny else 16
    K = 8 if tiny else 50
    steps = 10 if tiny else 50

    agent = PoseAgent(cfg, "score")
    data = SyntheticPoseData(num_points=cfg.model.num_points)
    key = jax.random.PRNGKey(0)

    base_tput = None
    counts = [d for d in (1, 2, 4, 8) if d <= n_dev]
    for nd in counts:
        mesh = make_mesh(data=nd, cand=1, devices=jax.devices()[:nd])
        B = B_per_dev * nd
        batch = data.batch(key, B)
        batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
        state = agent.init_state(key, batch)
        state = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)

        f = jax.jit(
            lambda st, b, k: aggregate_candidates(
                agent.sample_candidates(
                    st, b, k, repeat_num=K, T0=0.55, method="fixed", num_steps=steps
                ),
                None,
            )["translation"]
        )
        out = f(state, sharded, jax.random.PRNGKey(99))
        _ = float(out[0, 0])
        reps = 3
        s = time.perf_counter()
        for i in range(reps):
            out = f(state, sharded, jax.random.PRNGKey(i))
            _ = float(out[0, 0])
        dt = (time.perf_counter() - s) / reps
        tput = B * K / dt
        if base_tput is None:
            base_tput = tput
        print(
            json.dumps(
                {
                    "metric": "scaling_candidates_per_s",
                    "devices": nd,
                    "value": round(tput, 1),
                    "unit": f"candidates/s (B={B}, K={K})",
                    "efficiency": round(tput / (base_tput * nd), 3),
                }
            )
        )


if __name__ == "__main__":
    main()
