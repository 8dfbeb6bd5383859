"""Stage-level steady-state timing of the eval pipeline on the real chip.

Splits bench.py's workload into encoder / ODE / aggregation stages, chaining
each stage ``reps`` times inside ONE jitted scan with a data dependency
between iterations (identical technique to bench.py: per-call dispatch on
this backend costs ~30-50 ms, so per-call timing is meaningless) and fencing
once with a scalar D2H read. Not a CI artifact — a profiling utility for
ROADMAP item 2.
"""

import time

import jax
import jax.numpy as jnp

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates
from genpose2_tpu.training import PoseAgent

REPS = 20


def steady(fn_once, *args):
    """Time REPS data-dependent iterations of fn_once inside one jit."""

    @jax.jit
    def loop(*a):
        def body(carry, k):
            out = fn_once(carry, k, *a)
            return out, None

        # init with a plain scalar (every fn_once returns a scalar f32):
        # evaluating fn_once for the init would execute REPS+1 iterations
        # inside the timed window while dividing by REPS
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
        return carry

    out = loop(*args)
    float(jnp.asarray(out).reshape(-1)[0])  # compile+fence
    start = time.perf_counter()
    out = loop(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    return (time.perf_counter() - start) / REPS


def main():
    import sys
    stages = set(sys.argv[1:]) or {"enc", "ode", "agg"}
    score_dt = "bfloat16" if "bf16score" in stages else "float32"
    cfg = default_config().replace(
        model=ModelConfig(
            dino="none",
            pointnet2=PointNet2Config(compute_dtype="bfloat16"),
            score_dtype=score_dt,
        )
    )
    B, K, N = 128, 50, 1024
    agent = PoseAgent(cfg, "score", steps_per_epoch=1000)
    data = SyntheticPoseData(num_points=N)
    key = jax.random.PRNGKey(0)
    batch = data.batch(key, B)
    batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
    state = agent.init_state(key, batch)

    # --- encoder: perturb the input by the previous output's first scalar
    def enc_once(carry, k, st, b):
        bb = dict(b)
        bb["pts"] = b["pts"] + 0.0 * carry
        pts_feat, _ = agent.extract_features(st, bb)
        return pts_feat[0, 0]

    t_enc = 0.0
    if "enc" in stages:
        t_enc = steady(enc_once, state, batch)
        print(f"encoder:      {t_enc*1e3:8.2f} ms  ({B} objs)", flush=True)

    # --- ODE sampling given fixed features
    pts_feat, rgb_feat = jax.jit(lambda s, b: agent.extract_features(s, b))(state, batch)

    def ode_once(carry, k, st, pf):
        pf = pf + 0.0 * carry
        sfn = agent.score_fn(st, jnp.repeat(pf, K, axis=0), None)
        from genpose2_tpu.diffusion import samplers

        x = samplers.ode_sampler(
            jax.random.fold_in(key, k), sfn, agent.sde, B * K, 9,
            T0=0.55, method="fixed", num_steps=50,
        )
        return jnp.asarray(x)[0, 0] if not isinstance(x, tuple) else jnp.asarray(x[0])[0, 0]

    t_ode = 0.0
    if "ode" in stages:
        t_ode = steady(ode_once, state, pts_feat)
        print(f"ODE (50-step RK4, {B*K} cands): {t_ode*1e3:8.2f} ms", flush=True)

    # --- aggregation
    if "agg" in stages:
        sample = jax.jit(
            lambda s, b, k: agent.sample_candidates(
                s, b, k, repeat_num=K, T0=0.55, method="fixed", num_steps=50
            )
        )
        poses = sample(state, batch, key)

        def agg_once(carry, k, p):
            p = p + 0.0 * carry
            out = aggregate_candidates(
                p, None, retain_ratio=cfg.eval.retain_ratio,
                clustering=cfg.eval.clustering, eps=cfg.eval.clustering_eps,
                minpts_ratio=cfg.eval.clustering_minpts_ratio,
            )
            return out["rotation"][0, 0, 0]

        t_agg = steady(agg_once, poses)
        print(f"aggregation:  {t_agg*1e3:8.2f} ms", flush=True)
    else:
        t_agg = 0.0

    total = t_enc + t_ode + t_agg
    if total > 0:
        print(f"total:        {total*1e3:8.2f} ms = {B*K/total:.0f} cand/s", flush=True)


if __name__ == "__main__":
    main()
