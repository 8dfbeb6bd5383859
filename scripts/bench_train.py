"""Flagship train-step throughput (f32 + bf16), tracked per round.

The reference spends most of its life training (reference:
runners/trainer.py:39-103: epoch loop over 192-sample batches, 20-repeat DSM
loss per step, posenet_agent.py:205-226); this measures the equivalent
steady-state samples/s of OUR flagship pixels-to-features training step —
frozen DinoV3 ViT-S+/16 forward + fused PointNet++ encoder fwd/bwd + the
vmapped repeat-20 DSM loss + Adam/EMA update — on one chip, dispatch-
amortized via the scanned train loop (training/agent.py:train_steps).

Prints one JSON line per dtype; use --out-json to also write the artifact
file (TRAIN_BENCH_r{N}.json).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.data.synthetic import SyntheticPoseData

B = 64  # objects per step (the bench.py batch; reference trains at 192/gpu)
SCAN = 20  # steps per dispatch (amortizes the ~35 ms/call round trip)
ROUNDS = 3


def run(dtype: str):
    from genpose2_tpu.training import PoseAgent

    if dtype == "bfloat16":
        model = ModelConfig(
            dino="pointwise",
            pointnet2=PointNet2Config(compute_dtype="bfloat16"),
            backbone_dtype="bfloat16",
            score_dtype="bfloat16",
        )
    else:
        model = ModelConfig(dino="pointwise")
    cfg = default_config().replace(model=model)
    agent = PoseAgent(cfg, "score", steps_per_epoch=1000)
    data = SyntheticPoseData(num_points=cfg.model.num_points)
    key = jax.random.PRNGKey(0)
    batch = data.batch(key, B)
    batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
    S = cfg.model.img_size
    N = cfg.model.num_points
    ks = jax.random.split(key, 3)
    batch["roi_rgb"] = jax.random.normal(ks[0], (B, S, S, 3), jnp.float32)
    batch["roi_xs"] = jax.random.randint(ks[1], (B, N), 0, S)
    batch["roi_ys"] = jax.random.randint(ks[2], (B, N), 0, S)
    state = agent.init_state(key, batch)

    # stack the same batch SCAN times: per-step keys give independent DSM
    # noise draws, so every step does full distinct work (weights advance)
    batches = jax.tree.map(lambda x: jnp.stack([x] * SCAN), batch)

    state, metrics = agent.train_steps(state, batches, jax.random.PRNGKey(1))
    _ = float(metrics["loss"][-1])  # compile + fence
    best = float("inf")
    for i in range(ROUNDS):
        t0 = time.perf_counter()
        state, metrics = agent.train_steps(
            state, batches, jax.random.PRNGKey(2 + i)
        )
        _ = float(metrics["loss"][-1])  # D2H fence (block_until_ready lies here)
        best = min(best, (time.perf_counter() - t0) / SCAN)
    return {
        "metric": f"flagship_train_samples_per_s_{dtype}",
        "value": round(B / best, 1),
        "step_ms": round(best * 1e3, 2),
        "unit": (
            f"samples/s (B={B} pixels-to-pose train step: frozen ViT fwd + "
            "encoder fwd/bwd + repeat-20 DSM + Adam/EMA, scanned x"
            f"{SCAN}/dispatch)"
        ),
        "final_loss": round(float(metrics["loss"][-1]), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--dtypes", default="float32,bfloat16")
    a = ap.parse_args()
    rows = []
    for dt in a.dtypes.split(","):
        row = run(dt)
        print(json.dumps(row), flush=True)
        rows.append(row)
    if a.out_json:
        with open(a.out_json, "w") as f:
            json.dump({"rows": rows}, f, indent=2)


if __name__ == "__main__":
    main()
