"""End-to-end benchmark: pose-candidate throughput of the FLAGSHIP eval
pipeline, from pixels to poses.

Workload = the reference's FULL single-frame evaluation pipeline
(dino='pointwise', reference: scripts/eval_single.sh, networks/posenet.py:74-75,
runners/evaluation_single.py:78-288): a batch of 64 objects (the fork's eval
batch, scripts/eval_single_my.sh), each a 256px RGB crop + 1024-point cloud —
frozen DinoV3 ViT-S+/16 -> ImgEncoder layer fusion -> per-point feature
gather -> transformer-fused PointNet++ -> 50-step probability-flow ODE over
64 x 50 candidates -> EnergyNet ranking over all B x K candidates (its own
encoder forward + energy head, reference: evaluation_single.py:123-157) ->
energy-sorted retain-40% aggregation (sort/cluster/average, :160-219) ->
ScaleNet bbox regression from the score encoder's feature + predicted axes
(:222-288).

Measurement note: one jit holding BOTH full encoders (score + energy agents)
exceeds the remote TPU compiler's request-size limit on this backend
(HTTP 413), so the pipeline is timed as two steady-state scanned programs
whose per-iteration times ADD — split at the stage boundary the reference
itself persists to disk (pred_pose.pkl between inference_score and
inference_energy, evaluation_single.py:78-157):

  A: sampling       (ViT + score encoder + ODE) -> the per-iteration
                    candidate sets (reps, B, K, 9) + the shared features
  B: energy+scale   (energy encoder + EnergyNet over B x K + energy-sorted
                    aggregation + ScaleNet), CONSUMING program A's actual
                    per-iteration candidates and features

full = A + B is a consuming chain with no stage double-counted. Every
iteration models a NEW frame batch: program A re-runs the ViT + score
encoder per iteration, and program B re-runs the ENERGY agent's encoder
(its own ImgEncoder/pts-encoder weights) per iteration — only the frozen
ViT's patch features are shared A->B, exactly like the production
pipeline's one-backbone-run-per-batch reuse. (Rounds 2-4 and the first r5
number let XLA hoist the loop-invariant energy-encoder forward out of
program B's scan, amortizing ~15 ms/iter to ~0.3 — those headlines
overstate the full pipeline; the score-only metric was unaffected.) The
score-only configuration (the r01-r03 headline: sample -> energy-free
aggregation) is A + a third small aggregation program that also consumes A's
candidates. The tracking metric is T (warm-start sampling + aggregation loop,
where the aggregated pose is the next frame's prior) + B the same way.

Baseline: the reference implements the sampling loop as scipy RK45 on the
host calling the GPU score model per step (reference: samplers.py:204-234) on
one RTX 4090. The repo publishes no throughput number (BASELINE.md); we use
an optimistic estimate of 6,400 candidates/s for vs_baseline — i.e. one
~0.5 s host-looped solve_ivp per 64x50-candidate batch — so the reported
ratio is a floor, not a cherry-pick.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}. The
headline "value" is the energy-ranked full pipeline; the lighter score-only
pipeline is reported as "score_only_candidates_per_s".
"""

import json
import time

import jax
import jax.numpy as jnp

# Persist compiled executables across bench invocations: the jitted pipeline
# programs are large, and the remote TPU backend's compile latency (minutes
# when the host is loaded) otherwise dominates a fresh run. Cache misses
# still produce identical measurements — only startup time changes.
jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates
from genpose2_tpu.training import PoseAgent, ScaleAgent

BASELINE_CANDIDATES_PER_S = 6400.0  # optimistic reference estimate (see docstring)


def main():
    # the FLAGSHIP configuration: pointwise-DINO fusion encoder fed by the
    # frozen DinoV3 ViT-S+/16 provider, bf16 compute on the frozen/eval paths
    cfg = default_config().replace(
        model=ModelConfig(
            dino="pointwise",
            pointnet2=PointNet2Config(compute_dtype="bfloat16"),
            backbone_dtype="bfloat16",
            score_dtype="bfloat16",
        )
    )
    B = 64
    K = cfg.eval.eval_repeat_num  # 50
    N = cfg.model.num_points  # 1024
    S = cfg.model.img_size  # 256

    agent = PoseAgent(cfg, "score", steps_per_epoch=1000)
    energy_agent = PoseAgent(cfg, "energy", steps_per_epoch=1000)
    data = SyntheticPoseData(num_points=N)
    key = jax.random.PRNGKey(0)
    batch = data.batch(key, B)
    batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
    ks = jax.random.split(key, 3)
    batch["roi_rgb"] = jax.random.normal(ks[0], (B, S, S, 3), jnp.float32)
    batch["roi_xs"] = jax.random.randint(ks[1], (B, N), 0, S)
    batch["roi_ys"] = jax.random.randint(ks[2], (B, N), 0, S)
    state = agent.init_state(key, batch)
    estate = energy_agent.init_state(jax.random.PRNGKey(1), batch)
    scale_agent = ScaleAgent(cfg)
    pts_dim = int(agent.extract_features(state, batch)[0].shape[-1])
    sstate = scale_agent.init_state(jax.random.PRNGKey(2), pts_dim=pts_dim)

    # Steady-state serving throughput: the host->device dispatch round trip on
    # this backend is ~30-35 ms PER CALL (measured constant in the iteration
    # count), which would dominate a per-call measurement. A production server
    # keeps the device saturated, so we measure `reps` back-to-back pipeline
    # iterations chained inside ONE jit (each iteration consumes the previous
    # result, so nothing can be elided or overlapped away) and fence ONCE with
    # a D2H read at the end (block_until_ready can resolve before remote
    # execution completes on this backend; the scalar read is the reliable
    # fence). reps=50 keeps the amortized dispatch share under 0.7 ms/iter
    # (reps=10 inflated every iteration by ~3.5 ms of pure dispatch).
    reps = 50

    def timed(loop, *args):
        # warm with a TRACED seed: the timed calls pass seed=i as a traced
        # int, and a default-argument seed would compile a separate
        # constant-seed specialization, putting a retrace/compile inside the
        # first timed sample (minutes on a cold remote compile cache)
        out = loop(*args, seed=-1)
        _ = float(jnp.asarray(out[0]).reshape(-1)[0])  # compile + warm
        best = float("inf")
        for i in range(3):
            start = time.perf_counter()
            out = loop(*args, seed=i)
            _ = float(jnp.asarray(out[0]).reshape(-1)[0])
            best = min(best, time.perf_counter() - start)
        return best / reps, out

    # ---- program A: sampling (pixels -> per-iteration candidate sets) -----
    @jax.jit
    def sample_loop(state, batch, seed=0):
        key = jax.random.PRNGKey(seed)

        def body(poses_prev, k):
            keyk = jax.random.fold_in(key, k)
            b = dict(batch)
            eps = 0.0 * poses_prev[0, 0, 0]
            b["pts"] = batch["pts"] + eps
            b["roi_rgb"] = batch["roi_rgb"] + eps
            b = agent.with_image_features(state, b)
            feats = agent.extract_features(state, b)
            poses = agent.sample_candidates(
                state, b, keyk, repeat_num=K, T0=0.55, method="fixed",
                num_steps=50, features=feats,
            )
            return poses, poses

        init = jnp.zeros((B, K, 9), jnp.float32)
        _, all_poses = jax.lax.scan(body, init, jnp.arange(reps))
        return (all_poses,)

    dt_sample, (all_poses,) = timed(sample_loop, state, batch)

    # B consumes A's actual per-iteration candidates. The dino/pts features
    # are deterministic functions of the (fixed) pixels, identical in every A
    # iteration — computed once here, they ARE the features A produced (the
    # varying data, the candidates, flows through the chain).
    b_feat = agent.with_image_features(state, batch)
    pts_feat = agent.extract_features(state, b_feat)[0]

    # ---- program B: energy + energy-sorted aggregation + scale ------------
    # consumes program A's ACTUAL outputs: each scan iteration ranks the
    # candidate set A sampled in its corresponding iteration, with the dino
    # features A computed (shared frozen backbone) and the score encoder's
    # pts_feat feeding ScaleNet — the reference's stage chain
    # (evaluation_single.py:78-288, stage outputs feed the next stage)
    @jax.jit
    def energy_scale_loop(estate, sstate, batch, all_poses, pts_feat, seed=0):
        def body(carry, poses):
            poses = poses + 0.0 * carry[0, 0]
            # Each iteration is a NEW frame batch, so the ENERGY agent's
            # encoder (its own ImgEncoder fusion + rgb gather + pts encoder —
            # different weights from the score agent's) must run per
            # iteration: thread the carry dependency through pts/dino_layers
            # so XLA cannot hoist it out of the scan. (Before r5 the batch
            # was loop-invariant and the ~15 ms energy-encoder forward was
            # amortized /reps — overstating the full-pipeline headline.) The
            # FROZEN ViT's dino_layers stay loop-invariant on purpose: the
            # serving chain computes them once per frame in program A and the
            # energy stage reuses them (as the production eval pipeline and
            # inference API do — one backbone run per batch, r3).
            eps = 0.0 * poses[0, 0, 0]
            b = dict(batch)
            b["pts"] = batch["pts"] + eps
            b["dino_layers"] = jax.tree.map(
                lambda t: t + eps.astype(t.dtype), batch["dino_layers"]
            )
            energy = energy_agent.get_energy(estate, b, poses, fixed_t=1e-5)
            agg = aggregate_candidates(
                poses, energy, retain_ratio=cfg.eval.retain_ratio,
                clustering=cfg.eval.clustering, eps=cfg.eval.clustering_eps,
                minpts_ratio=cfg.eval.clustering_minpts_ratio,
            )
            lengths = scale_agent.predict(sstate, pts_feat, agg["rotation"])
            return lengths, None

        init = jnp.zeros((B, 3), jnp.float32) + jnp.float32(seed)  # seed may be traced
        lengths, _ = jax.lax.scan(body, init, all_poses)
        return (lengths,)

    dt_es, _ = timed(energy_scale_loop, estate, sstate, b_feat, all_poses, pts_feat)

    # ---- program C: energy-free aggregation (the score-only tail) ---------
    @jax.jit
    def agg_loop(all_poses, seed=0):
        def body(carry, poses):
            poses = poses + 0.0 * carry[0, 0]
            agg = aggregate_candidates(
                poses, None, retain_ratio=cfg.eval.retain_ratio,
                clustering=cfg.eval.clustering, eps=cfg.eval.clustering_eps,
                minpts_ratio=cfg.eval.clustering_minpts_ratio,
            )
            return agg["translation"], None

        init = jnp.zeros((B, 3), jnp.float32) + jnp.float32(seed)
        trans, _ = jax.lax.scan(body, init, all_poses)
        return (trans,)

    dt_agg, _ = timed(agg_loop, all_poses)

    dt_full = dt_sample + dt_es
    cand_per_s = B * K / dt_full
    cand_per_s_score = B * K / (dt_sample + dt_agg)

    # ---- tracking: warm-started sampling loop (+ the same B stage) --------
    # 16 video streams x 4 objects multiplexed into the same 64-object batch
    # (reference: evaluation_tracking.py:227-331 multiplexes <=30 videos);
    # per frame: warm-started ODE from T0=0.25 (reference:
    # scripts/eval_tracking.sh), EnergyNet ranking + ScaleNet (program B),
    # next-frame prior. Pixels change every frame, so the frozen ViT runs
    # once per frame — the faithful per-frame cost. The in-loop aggregation
    # here is NOT double-counted against B: the tracking loop needs its own
    # aggregate to propagate the prior (reference work_batch returns the
    # aggregated pose, evaluation_tracking.py:210-215).
    streams = 16
    from genpose2_tpu.so3.rotations import matrix_to_rot6d_cols

    @jax.jit
    def tracking_loop(state, batch, prev0, seed=0):
        key = jax.random.PRNGKey(seed)

        def body(prev, k):
            eps = 0.0 * prev[0, 0]
            b = dict(batch)
            b["roi_rgb"] = batch["roi_rgb"] + eps
            b = agent.with_image_features(state, b)
            feats = agent.extract_features(state, b)
            init_x = prev.at[..., -3:].add(-b["pts_center"])
            poses = agent.sample_candidates(
                state, b, k, repeat_num=K, T0=0.25, init_x=init_x,
                method="fixed", num_steps=50, features=feats,
            )
            agg = aggregate_candidates(
                poses, None, retain_ratio=cfg.eval.retain_ratio,
                clustering=cfg.eval.clustering, eps=cfg.eval.clustering_eps,
                minpts_ratio=cfg.eval.clustering_minpts_ratio,
            )
            nxt = jnp.concatenate(
                [matrix_to_rot6d_cols(agg["rotation"]), agg["translation"]],
                axis=-1,
            )
            return nxt, None

        prev, _ = jax.lax.scan(body, prev0, jax.random.split(key, reps))
        return (prev,)

    prev0 = jnp.zeros((B, 9), jnp.float32).at[:, 0].set(1.0).at[:, 4].set(1.0)
    dt_track, _ = timed(tracking_loop, state, batch, prev0)
    frames_per_s = streams / (dt_track + dt_es)

    print(
        json.dumps(
            {
                "metric": "flagship_pose_candidates_per_s_per_chip",
                "value": round(cand_per_s, 1),
                "unit": (
                    "candidates/s (FULL eval pipeline, pixels-to-pose: B=64 "
                    "objects, 256px crops, DinoV3 ViT-S+/16 + fused "
                    "PointNet++ + 50-step ODE x K=50 + EnergyNet ranking "
                    "over BxK + energy-sorted aggregation + ScaleNet; "
                    "timed as a consuming chain of programs A+B — B ranks "
                    "A's actual per-iteration candidates and re-runs the "
                    "energy agent's encoder per iteration (r5 basis change: "
                    "earlier rounds amortized that ~15 ms forward across "
                    "the scan); see bench.py docstring)"
                ),
                "vs_baseline": round(cand_per_s / BASELINE_CANDIDATES_PER_S, 2),
                "score_only_candidates_per_s": round(cand_per_s_score, 1),
                "score_only_unit": (
                    "candidates/s (score pipeline only: sampling + "
                    "energy-free aggregation — the r01-r03 headline "
                    "configuration)"
                ),
                "tracking_frames_per_s": round(frames_per_s, 1),
                "tracking_unit": (
                    "video frames/s (16 streams x 4 objects multiplexed, "
                    "warm-start T0=0.25, 50-step ODE x K=50 per object, "
                    "EnergyNet ranking + ScaleNet per frame, pixels-to-pose)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
