"""Successive-subtraction split of bench.py's program A (the score pipeline)
at the EXACT bench shapes: each variant truncates the per-iteration body after
one more stage, inside the same reps-chained scan harness bench.py uses, so
the scan/dispatch floor cancels in the differences:

    vit   = ViT patch features + ImgEncoder fuse
    feat  = vit + per-point gather + fused Fus encoder
    ode   = feat + candidate sampling (fused RK4, K=50 x 50 steps)
    full  = ode + aggregation          (equals bench.py program A)

Profiling utility (not a CI artifact); run one stage name or several:
    python scripts/profile_bench_split.py vit feat ode full
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates
from genpose2_tpu.training import PoseAgent

REPS = 40  # keeps the ~35 ms per-call dispatch under 1 ms/iter amortized


def main():
    stages = sys.argv[1:] or ["vit", "feat", "ode", "full"]
    cfg = default_config().replace(
        model=ModelConfig(
            dino="pointwise",
            pointnet2=PointNet2Config(compute_dtype="bfloat16"),
            backbone_dtype="bfloat16",
            score_dtype="bfloat16",
        )
    )
    B = 64
    K = cfg.eval.eval_repeat_num
    N = cfg.model.num_points
    S = cfg.model.img_size

    agent = PoseAgent(cfg, "score", steps_per_epoch=1000)
    data = SyntheticPoseData(num_points=N)
    key = jax.random.PRNGKey(0)
    batch = data.batch(key, B)
    batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
    ks = jax.random.split(key, 3)
    batch["roi_rgb"] = jax.random.normal(ks[0], (B, S, S, 3), jnp.float32)
    batch["roi_xs"] = jax.random.randint(ks[1], (B, N), 0, S)
    batch["roi_ys"] = jax.random.randint(ks[2], (B, N), 0, S)
    state = agent.init_state(key, batch)

    def make_loop(upto):
        @jax.jit
        def loop(state, batch, seed=0):
            key = jax.random.PRNGKey(seed)

            def body(carry, k):
                keyk = jax.random.fold_in(key, k)
                eps = 0.0 * carry
                b = dict(batch)
                b["pts"] = batch["pts"] + eps
                b["roi_rgb"] = batch["roi_rgb"] + eps
                b = agent.with_image_features(state, b)
                # every truncated variant reduces its FULL output with
                # jnp.sum: consuming a scalar element lets XLA slice the tail
                # of the stage away (e.g. dino_layers[0][0,0,0] kept only
                # blocks 0-2 of the ViT — measured 3.97 "ms/iter" vs the real
                # ~9.8; see profile_feat_split.py and the axon notes)
                if upto == "vit":
                    return sum(
                        jnp.sum(o.astype(jnp.float32)) for o in b["dino_layers"]
                    ) * 1e-9, None
                feats = agent.extract_features(state, b)
                if upto == "feat":
                    return jnp.sum(feats[0].astype(jnp.float32)) * 1e-9, None
                poses = agent.sample_candidates(
                    state, b, keyk, repeat_num=K, T0=0.55, method="fixed",
                    num_steps=50, features=feats,
                )
                if upto == "ode":
                    return jnp.sum(poses) * 1e-9, None
                agg = aggregate_candidates(
                    poses, None, retain_ratio=cfg.eval.retain_ratio,
                    clustering=cfg.eval.clustering, eps=cfg.eval.clustering_eps,
                    minpts_ratio=cfg.eval.clustering_minpts_ratio,
                )
                return jnp.sum(agg["translation"]), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
            return carry

        return loop

    prev = 0.0
    for name in stages:
        loop = make_loop(name)
        out = loop(state, batch)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            out = loop(state, batch, seed=i + 1)
            _ = float(jnp.asarray(out).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        dt = best / REPS
        print(f"{name:5s}: {dt*1e3:7.2f} ms/iter  (delta {1e3*(dt-prev):+7.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
