"""Subprocess body for the multi-host training test (tests/test_parallel.py).

Runs ONE training process of an ``MH_NPROC``-process jax.distributed group on
the CPU backend (4 global virtual devices total), drives the REAL production
path — cli.make_loader_fn per-host shards -> Trainer mesh dispatch ->
global_batch_from_host_local — and prints one JSON line with the final loss
and an EMA-parameter checksum so the parent test can assert bitwise-level
agreement with the single-process run (SURVEY §2.8; the reference's gloo
counterpart is dead code, utils/misc.py:14-27).
"""

import dataclasses
import json
import os
import sys


def main():
    nproc = int(os.environ.get("MH_NPROC", "1"))
    pid = int(os.environ.get("MH_PID", "0"))
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


def jnp_abs_sum(x):
    import jax.numpy as jnp
    import numpy as np

    # replicated global arrays are readable on every host
    return np.abs(np.asarray(x)).sum()


if __name__ == "__main__":
    main()
