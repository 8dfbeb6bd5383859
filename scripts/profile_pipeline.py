"""Stage-level timing of the eval pipeline on the real chip.

Splits bench.py's jitted program into encoder / ODE / aggregation to target
kernel work (ROADMAP item 2). Not a CI artifact — a profiling utility.
"""

import time

import jax
import jax.numpy as jnp

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates
from genpose2_tpu.training import PoseAgent


def _materialize(out):
    # on remote backends block_until_ready can resolve before execution
    # completes; a scalar D2H read is the reliable fence (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, reps=10):
    out = fn(*args)
    _materialize(out)
    start = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _materialize(out)
    return (time.perf_counter() - start) / reps, out


def main():
    cfg = default_config().replace(
        model=ModelConfig(dino="none", pointnet2=PointNet2Config(compute_dtype="bfloat16"))
    )
    B, K, N = 128, 50, 1024
    agent = PoseAgent(cfg, "score", steps_per_epoch=1000)
    data = SyntheticPoseData(num_points=N)
    key = jax.random.PRNGKey(0)
    batch = data.batch(key, B)
    batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
    state = agent.init_state(key, batch)

    enc = jax.jit(lambda s, b: agent.extract_features(s, b))
    t_enc, feats = timed(enc, state, batch)
    print(f"encoder:      {t_enc*1e3:8.2f} ms  ({B} objs)")

    sample = jax.jit(
        lambda s, b, k: agent.sample_candidates(
            s, b, k, repeat_num=K, T0=0.55, method="fixed", num_steps=50
        )
    )
    t_all, poses = timed(sample, state, batch, key)
    print(f"enc+ODE:      {t_all*1e3:8.2f} ms  -> ODE ~{(t_all-t_enc)*1e3:.2f} ms")

    agg = jax.jit(
        lambda p: aggregate_candidates(
            p, None, retain_ratio=cfg.eval.retain_ratio,
            clustering=cfg.eval.clustering, eps=cfg.eval.clustering_eps,
            minpts_ratio=cfg.eval.clustering_minpts_ratio,
        )
    )
    t_agg, _ = timed(agg, poses)
    print(f"aggregation:  {t_agg*1e3:8.2f} ms")
    total = t_all + t_agg
    print(f"total:        {total*1e3:8.2f} ms = {B*K/total:.0f} cand/s")


if __name__ == "__main__":
    main()
