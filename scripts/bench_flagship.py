"""Flagship-path benchmark: the COMPLETE DINO-pointwise eval pipeline.

Workload = the reference's flagship configuration (dino='pointwise',
transformer-fused PointNet++, reference: scripts/eval_single.sh + posenet.py
:74-75): B objects x 256px RGB crops through the frozen ViT-S/16 -> ImgEncoder
layer fusion -> per-point feature gather -> PointNet2ClsMSGFus -> 50-step
probability-flow ODE over B x 50 candidates -> on-device aggregation.

Steady-state methodology as bench.py: `reps` iterations chained inside one
jit, single D2H fence. Prints one JSON line (objects/s and candidates/s).
"""

import json
import time

import jax
import jax.numpy as jnp

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates
from genpose2_tpu.models.vit import vit_s16
from genpose2_tpu.training import PoseAgent


def main():
    B, K, N = 64, 50, 1024
    img = 256
    cfg = default_config().replace(
        model=ModelConfig(
            dino="pointwise",
            img_size=img,
            pointnet2=PointNet2Config(compute_dtype="bfloat16"),
        )
    )
    grid = img // cfg.model.patch_size

    vit = vit_s16(dtype=jnp.bfloat16)  # frozen eval backbone: bf16 matmuls
    key = jax.random.PRNGKey(0)
    crops = jax.random.uniform(key, (B, img, img, 3), jnp.float32)
    vit_vars = vit.init(key, crops[:1])

    data = SyntheticPoseData(num_points=N)
    batch = data.batch(key, B)
    batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
    batch["roi_xs"] = jax.random.randint(key, (B, N), 0, img).astype(jnp.float32)
    batch["roi_ys"] = jax.random.randint(key, (B, N), 0, img).astype(jnp.float32)

    agent = PoseAgent(cfg, "score", steps_per_epoch=1000)

    def vit_layers(crops):
        return list(vit.apply(vit_vars, crops, intermediate=(2, 6, 11)))

    init_batch = dict(batch)
    init_batch["dino_layers"] = [jnp.zeros((B, grid * grid, cfg.model.dino_dim))] * 3
    state = agent.init_state(key, init_batch)

    reps = 10

    def pipeline_once(state, batch, crops, key):
        b = dict(batch)
        b["dino_layers"] = vit_layers(crops)
        poses = agent.sample_candidates(
            state, b, key, repeat_num=K, T0=0.55, method="fixed", num_steps=50
        )
        agg = aggregate_candidates(
            poses,
            None,
            retain_ratio=cfg.eval.retain_ratio,
            clustering=cfg.eval.clustering,
            eps=cfg.eval.clustering_eps,
            minpts_ratio=cfg.eval.clustering_minpts_ratio,
        )
        return agg["rotation"], agg["translation"]

    @jax.jit
    def pipeline_loop(state, batch, crops, key):
        def body(carry, k):
            rot_prev, _ = carry
            keyk = jax.random.fold_in(key, k)
            c = crops + 0.0 * rot_prev[0, 0, 0]
            rot, trans = pipeline_once(state, batch, c, keyk)
            return (rot, trans), None

        init = (jnp.zeros((B, 3, 3), jnp.float32), jnp.zeros((B, 3), jnp.float32))
        (rot, trans), _ = jax.lax.scan(body, init, jnp.arange(reps))
        return rot, trans

    R, t = pipeline_loop(state, batch, crops, jax.random.PRNGKey(10_000))
    _ = float(t[0, 0])

    best = float("inf")
    for i in range(3):
        start = time.perf_counter()
        R, t = pipeline_loop(state, batch, crops, jax.random.PRNGKey(i))
        _ = float(t[0, 0])
        best = min(best, time.perf_counter() - start)
    dt = best / reps

    print(
        json.dumps(
            {
                "metric": "flagship_objects_per_s_per_chip",
                "value": round(B / dt, 1),
                "unit": f"objects/s (ViT-S/16 on {img}px crops + ImgEncoder + "
                f"Fus encoder + {K}-cand ODE + aggregation, B={B})",
                "candidates_per_s": round(B * K / dt, 1),
                "ms_per_batch": round(dt * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
