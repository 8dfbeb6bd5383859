"""Subprocess body for the multi-host tests (tests/test_parallel.py).

Runs ONE process of an ``MH_NPROC``-process jax.distributed group on the CPU
backend (4 global virtual devices total). MH_MODE selects the surface:

- ``train`` (default): the REAL production path — cli.make_loader_fn per-host
  shards -> Trainer mesh dispatch -> global_batch_from_host_local — printing
  the final loss and an EMA-parameter checksum (SURVEY §2.8; the reference's
  gloo counterpart is dead code, utils/misc.py:14-27).
- ``eval``: the eval pipeline + a short tracking loop partitioned across
  hosts — each process evaluates its shard of the batches and tracks its
  shard of the video streams, then global metrics are assembled with
  multihost_utils.process_allgather (the reference's global DetectMatch
  concat, runners/evaluation_tracking.py:334-384; SURVEY §2.8 "partition
  video streams across hosts").

Prints one JSON line so the parent test can assert agreement with the
single-process run.
"""

import dataclasses
import json
import os
import sys


def main():
    nproc = int(os.environ.get("MH_NPROC", "1"))
    pid = int(os.environ.get("MH_PID", "0"))
    mode = os.environ.get("MH_MODE", "train")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={4 // nproc}"
    )

    import jax

    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ["MH_COORD"],
            num_processes=nproc,
            process_id=pid,
        )

    if mode == "eval":
        return main_eval(nproc, pid)

    import numpy as np

    from genpose2_tpu.cli import make_loader_fn
    from genpose2_tpu.config import tiny_test_config
    from genpose2_tpu.parallel.mesh import make_mesh
    from genpose2_tpu.training.trainer import Trainer

    cfg = tiny_test_config()
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, batch_size=8, scan_chunk=2, warmup=1, repeat_num=2
        ),
        data=dataclasses.replace(
            cfg.data, source="synthetic", num_points=cfg.model.num_points
        ),
    )
    assert jax.device_count() == 4, jax.device_count()
    mesh = make_mesh(data=0, cand=1)
    trainer = Trainer(
        cfg,
        "score",
        steps_per_epoch=4,
        log_dir=os.path.join(os.environ["MH_LOGDIR"], f"p{pid}"),
        mesh=mesh,
    )
    loader_fn = make_loader_fn(cfg, "train")
    batch0 = next(iter(loader_fn(0, 4)))
    trainer.init(jax.random.PRNGKey(cfg.train.seed), batch0)

    last = {}
    for epoch in (1, 2):
        last = trainer.train_epoch(
            loader_fn(epoch, 4), epoch, jax.random.PRNGKey(epoch)
        )

    checksum = float(
        sum(
            float(jnp_abs_sum(x))
            for x in jax.tree_util.tree_leaves(trainer.state.ema_params)
        )
    )
    print(
        json.dumps(
            {
                "pid": pid,
                "nproc": nproc,
                "step": int(trainer.state.step),
                "loss": float(last["loss"]),
                "checksum": checksum,
            }
        ),
        flush=True,
    )


def main_eval(nproc, pid):
    """Eval-pipeline + tracking-loop shard for this process.

    Batches/videos are enumerated GLOBALLY and deterministically; this process
    computes only its ``[pid::nproc]`` shard on its local devices (per-host
    batch shards), then the per-object criterion arrays are all-gathered and
    reduced into one global metric set — matching what the single-process run
    computes over everything."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from genpose2_tpu.config import tiny_test_config
    from genpose2_tpu.data.synthetic import SyntheticPoseData
    from genpose2_tpu.eval.metrics import compute_metrics
    from genpose2_tpu.eval.pipeline import SingleFrameEvaluator
    from genpose2_tpu.eval.tracking import PoseTracker, track_video
    from genpose2_tpu.training import PoseAgent

    cfg = tiny_test_config()
    agent = PoseAgent(cfg, "score", steps_per_epoch=10)
    energy_agent = PoseAgent(cfg, "energy", steps_per_epoch=10)
    data = SyntheticPoseData(num_points=cfg.model.num_points)
    B = 4
    init_batch = data.batch(jax.random.PRNGKey(0), B)
    # same key + same config on every process -> identical replicated weights
    state = agent.init_state(jax.random.PRNGKey(1), init_batch)
    estate = energy_agent.init_state(jax.random.PRNGKey(2), init_batch)

    # ---- single-frame eval over 4 globally-enumerated batches -------------
    n_batches = 4
    ev = SingleFrameEvaluator(cfg, agent, state, energy_agent, estate)
    local = []
    for i in range(pid, n_batches, nproc):
        batch = data.batch(jax.random.PRNGKey(100 + i), B)
        local.append(ev._run_one(batch, jax.random.PRNGKey(200 + i)))
    mine = {
        k: np.concatenate([o[k] for o in local])
        for k in ("iou", "deg", "sht", "class_label")
    }
    # global metric assembly: all-gather the per-object criterion arrays
    # (equal shard sizes by construction) and reduce once
    gathered = {
        k: np.asarray(
            multihost_utils.process_allgather(jnp.asarray(v))
        ).reshape(-1)
        for k, v in mine.items()
    }
    metrics = compute_metrics(
        gathered["iou"], gathered["deg"], gathered["sht"],
        class_labels=gathered["class_label"],
    )

    # ---- tracking: 2 video streams partitioned across hosts ---------------
    n_videos, n_frames = 2, 2
    tracker = PoseTracker(cfg, agent, state, energy_agent, estate,
                          T0=0.4, num_steps=5)
    track_sum = np.zeros((), np.float64)
    for v in range(pid, n_videos, nproc):
        frames = [
            data.batch(jax.random.PRNGKey(300 + 10 * v + f), B)
            for f in range(n_frames)
        ]
        results = track_video(tracker, frames, jax.random.PRNGKey(400 + v))
        for r in results:
            track_sum += np.abs(r["rotation"]).sum() + np.abs(r["translation"]).sum()
    # per-stream state never crosses hosts; only the scalar metric reduces
    track_total = float(
        np.asarray(
            multihost_utils.process_allgather(jnp.asarray(track_sum))
        ).sum()
    )

    print(
        json.dumps(
            {
                "pid": pid,
                "nproc": nproc,
                "deg_mean": float(metrics.deg_mean),
                "sht_mean": float(metrics.sht_mean),
                "iou_mean": float(np.mean(gathered["iou"])),
                "track_checksum": track_total,
            }
        ),
        flush=True,
    )


def jnp_abs_sum(x):
    import jax.numpy as jnp
    import numpy as np

    # replicated global arrays are readable on every host
    return np.abs(np.asarray(x)).sum()


if __name__ == "__main__":
    main()
