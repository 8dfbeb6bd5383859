"""Command-line entry points: train / eval / track.

Mirrors the reference's shell-script surface (reference: scripts/train_score.sh,
eval_single.sh, eval_tracking.sh + configs/config.py flags) over the immutable
dataclass config. Flags are parsed ONCE here and materialize a Config — never
at import time (the reference parses argparse during module import,
pointnet2.py:28).

Usage:
    python -m genpose2_tpu.cli train --agent_type score --data_path ... --source synthetic
    python -m genpose2_tpu.cli eval  --data_path ... --score_ckpt ...
    python -m genpose2_tpu.cli track --data_path ... --score_ckpt ... --T0 0.25
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import numpy as np

from genpose2_tpu.config import (
    Config,
    DataConfig,
    EvalConfig,
    ModelConfig,
    SamplerConfig,
    SDEConfig,
    TrainConfig,
    default_config,
)


def build_config(args) -> Config:
    if getattr(args, "sampler_mode", None) == "edm" and args.sde_mode != "edm":
        raise SystemExit("--sampler_mode edm requires --sde_mode edm")
    cfg = default_config()
    model = ModelConfig(
        pose_mode=args.pose_mode,
        regression_head=args.regression_head,
        pts_encoder=args.pts_encoder,
        dino=args.dino,
        num_points=args.num_points,
        img_size=args.img_size,
        energy_mode=args.energy_mode,
        s_theta_mode=args.s_theta_mode,
        norm_energy=args.norm_energy,
    )
    train = TrainConfig(
        agent_type=args.agent_type,
        batch_size=args.batch_size,
        n_epochs=args.n_epochs,
        lr=args.lr,
        warmup=args.warmup,
        lr_decay=args.lr_decay,
        grad_clip=args.grad_clip,
        ema_rate=args.ema_rate,
        repeat_num=args.repeat_num,
        eval_freq=args.eval_freq,
        seed=args.seed,
        optimizer=args.optimizer,
        scan_chunk=args.scan_chunk,
    )
    ev = EvalConfig(
        eval_repeat_num=args.eval_repeat_num,
        retain_ratio=args.retain_ratio,
        clustering=bool(args.clustering),
        clustering_eps=args.clustering_eps,
        clustering_minpts_ratio=args.clustering_minpts,
        T0=args.T0,
        batch_size=args.batch_size,
    )
    data = DataConfig(
        data_path=args.data_path,
        source=args.source,
        num_points=args.num_points,
        img_size=args.img_size,
        per_obj=args.per_obj,
        percentage_data=args.percentage_data,
        seed=args.seed,
        dzi_type="none" if args.eval_mode else "uniform",
        roi_mask_pro=0.0 if args.eval_mode else 0.5,
        bop_cameras=tuple(
            c for c in getattr(args, "bop_cameras", "").split(",") if c
        ),
        trans_stats_dir=getattr(args, "trans_stats_dir", ""),
    )
    sampler = SamplerConfig(
        mode=args.sampler_mode, sampling_steps=args.sampling_steps
    )
    return Config(
        sde=SDEConfig(mode=args.sde_mode),
        sampler=sampler,
        model=model,
        train=train,
        eval=ev,
        data=data,
        log_dir=args.log_dir,
    )


def add_common_flags(p: argparse.ArgumentParser):
    p.add_argument("--data_path", type=str, default="")
    p.add_argument("--source", type=str, default="Omni6DPose",
                   choices=["Omni6DPose", "xyzibd", "synthetic"])
    p.add_argument("--batch_size", type=int, default=192)
    p.add_argument("--pose_mode", type=str, default="rot_matrix")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--per_obj", type=str, default="")
    p.add_argument("--percentage_data", type=float, default=1.0)
    # BOP multi-camera val/test enumeration, comma-separated
    # (reference: xyzibd cam_ids 'xyz,realsense,photoneo')
    p.add_argument("--bop_cameras", type=str, default="")
    # dir with {xyzibd}_trans_{mean,std}.npy (reference: configs/)
    p.add_argument("--trans_stats_dir", type=str, default="")
    # 'edm' = Karras-Heun over the EDM denoiser; requires --sde_mode edm
    # (reference: configs/config.py:28-31, samplers.py:261-340)
    p.add_argument("--sampler_mode", type=str, default="fixed",
                   choices=["fixed", "rk45", "pc", "euler", "edm"])
    p.add_argument("--sampling_steps", type=int, default=100)
    p.add_argument("--sde_mode", type=str, default="ve")
    p.add_argument("--regression_head", type=str, default="Rx_Ry_and_T")
    p.add_argument("--pts_encoder", type=str, default="pointnet2")
    p.add_argument("--energy_mode", type=str, default="IP")
    p.add_argument("--s_theta_mode", type=str, default="score")
    p.add_argument("--norm_energy", type=str, default="identical")
    p.add_argument("--dino", type=str, default="none", choices=["none", "global", "pointwise"])
    p.add_argument("--agent_type", type=str, default="score",
                   choices=["score", "energy", "energy_with_ranking", "scale"])
    p.add_argument("--n_epochs", type=int, default=1000)
    p.add_argument("--log_dir", type=str, default="results")
    p.add_argument("--optimizer", type=str, default="adam")
    p.add_argument("--eval_freq", type=int, default=100)
    p.add_argument("--repeat_num", type=int, default=20)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ema_rate", type=float, default=0.999)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--lr_decay", type=float, default=0.98)
    p.add_argument("--eval_repeat_num", type=int, default=50)
    p.add_argument("--T0", type=float, default=0.55)
    p.add_argument("--clustering", type=int, default=1)
    p.add_argument("--clustering_eps", type=float, default=0.05)
    p.add_argument("--clustering_minpts", type=float, default=0.1667)
    p.add_argument("--retain_ratio", type=float, default=0.4)
    p.add_argument("--score_ckpt", type=str, default=None)
    p.add_argument("--energy_ckpt", type=str, default=None)
    p.add_argument("--scale_ckpt", type=str, default=None)
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    # resume training from a full-state checkpoint
    # (reference: runners/trainer.py:332-345 use_pretrain)
    p.add_argument("--use_pretrain", action="store_true")
    p.add_argument("--pretrain_path", type=str, default=None)
    # device mesh: shard the batch across N devices (0 = all local devices,
    # 1 = single device); batches lax.scan-stacked per dispatch
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--scan_chunk", type=int, default=8)
    # multi-host: jax.distributed.initialize per host (SURVEY §2.8)
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_hosts", type=int, default=None)
    p.add_argument("--host_id", type=int, default=None)


def make_loader_fn(cfg: Config, mode: str, agent_type: str = "score"):
    """Build an epoch -> batch-iterable factory. Multi-host
    (jax.process_count() > 1): cfg.train.batch_size is the GLOBAL batch size;
    every host loads only its 1/process_count shard, and the Trainer
    assembles the global sharded array (SURVEY §2.8 per-host data loading)."""
    from genpose2_tpu.data.loader import DataLoader

    n_proc = jax.process_count()
    if cfg.train.batch_size % n_proc != 0:
        raise ValueError(
            f"batch_size={cfg.train.batch_size} is the GLOBAL batch size and "
            f"must be divisible by process_count={n_proc}; a remainder would "
            "silently shrink the effective global batch"
        )
    if cfg.data.source == "synthetic":
        import jax.numpy as jnp

        from genpose2_tpu.data.synthetic import SyntheticPoseData
        from genpose2_tpu.so3.noise import add_noise_to_R

        data = SyntheticPoseData(num_points=cfg.data.num_points)

        def loader_fn(epoch, steps_per_epoch=50):
            for i in range(steps_per_epoch):
                key = jax.random.PRNGKey(epoch * 1000 + i)
                # the GLOBAL batch is generated from the shared seed on every
                # host, then sliced locally — hosts stay bit-identical to the
                # single-process run
                b = data.batch(key, cfg.train.batch_size)
                if agent_type == "scale":
                    # noised GT axes for scale training (reference:
                    # datasets_omni6dpose.py:399-415, 10-deg jitter x S)
                    S = cfg.train.scale_batch_size
                    B = b["gt_rotation"].shape[0]
                    rep = jnp.repeat(b["gt_rotation"], S, axis=0)
                    noised = add_noise_to_R(
                        jax.random.fold_in(key, 7), rep, r_deg=10.0
                    )
                    b = dict(b)
                    b["axes_training"] = noised.reshape(B, S, 3, 3)
                if n_proc > 1:
                    from genpose2_tpu.parallel.distributed import host_local_slice

                    sl = host_local_slice(cfg.train.batch_size)
                    b = jax.tree.map(lambda x: np.asarray(x)[sl], dict(b))
                yield b

        return loader_fn
    if cfg.data.source == "xyzibd":
        from genpose2_tpu.data.xyzibd import XyzibdDataset, load_translation_stats

        tm = ts = None
        if cfg.data.trans_stats_dir:
            tm, ts = load_translation_stats(cfg.data.trans_stats_dir)
        # multi-camera enumeration applies to val/test splits only
        # (reference: get_val_dataset/get_test_dataset pass cam_ids,
        # get_train_dataset does not — xyzibd_dataset.py:805-848)
        cams = list(cfg.data.bop_cameras) if mode != "train" else None
        ds = XyzibdDataset(
            cfg.data, cfg.data.data_path, mode=mode,
            cameras=cams or None, trans_mean=tm, trans_std=ts,
        )
    else:
        from genpose2_tpu.data.omni6dpose import Omni6DPoseDataset

        ds = Omni6DPoseDataset(cfg.data, mode=mode, agent_type=agent_type)

    def loader_fn(epoch):
        return DataLoader(
            ds,
            cfg.train.batch_size // n_proc,
            shuffle=(mode == "train"),
            seed=cfg.train.seed + epoch,
            shard_index=jax.process_index(),
            num_shards=n_proc,
        )

    return loader_fn


def cmd_train(args):
    cfg = build_config(args)
    from genpose2_tpu.training.trainer import Trainer
    from genpose2_tpu.data.loader import process_batch

    if args.multihost:
        from genpose2_tpu.parallel.distributed import initialize_multihost

        initialize_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )
    mesh = None
    if args.data_parallel != 1 or jax.process_count() > 1:
        from genpose2_tpu.parallel.mesh import make_mesh

        # multi-host: the mesh must span ALL processes' devices (data=0 =
        # every device) so per-host shards assemble into one global batch
        data_axis = args.data_parallel if args.data_parallel > 1 else 0
        mesh = make_mesh(data=data_axis, cand=1)

    frozen = None
    if args.agent_type in ("energy_with_ranking", "scale") and args.score_ckpt:
        from genpose2_tpu.training.agent import PoseAgent
        from genpose2_tpu.training.checkpoint import load_params_only

        sa = PoseAgent(cfg, "score", args.steps_per_epoch)
        loader_fn0 = make_loader_fn(cfg, "train", args.agent_type)
        first = next(iter(loader_fn0(0)))
        batch0 = first if "zero_mean_gt_pose" in first else process_batch(first, cfg.model.pose_mode)
        ss = sa.init_state(jax.random.PRNGKey(0), batch0)
        ss = load_params_only(args.score_ckpt, ss, use_ema_as_params=True, cfg=cfg, provider=sa.provider)
        frozen = (sa, ss)

    trainer = Trainer(
        cfg,
        args.agent_type,
        args.steps_per_epoch,
        log_dir=args.log_dir,
        score_ckpt=args.score_ckpt,
        frozen_score=frozen,
        mesh=mesh,
        resume_from=args.pretrain_path if args.use_pretrain else None,
    )
    base_loader = make_loader_fn(cfg, "train", args.agent_type)
    if cfg.data.source == "synthetic":
        loader_fn = lambda e: base_loader(e, args.steps_per_epoch)  # noqa: E731
    else:
        loader_fn = base_loader
    first = next(iter(loader_fn(0)))
    batch0 = first if "zero_mean_gt_pose" in first else process_batch(first, cfg.model.pose_mode)
    trainer.init(jax.random.PRNGKey(cfg.train.seed), batch0)

    # periodic in-training sampling eval on a held-out batch, every
    # cfg.train.eval_freq epochs (reference: runners/trainer.py:87-103,
    # posenet_agent.py:400-488 eval_score_func)
    # multi-host: the hook would mix a globally-sharded trainer.state with
    # host-local eval batches (incompatible devices) — jitted
    # sample_candidates rejects that. Gate it to single-process runs until
    # the eval batch is assembled globally.
    eval_fn = None
    if args.agent_type != "scale" and jax.process_count() == 1:
        from genpose2_tpu.training.eval_hooks import make_sampling_eval_fn

        eval_loader_fn = make_loader_fn(cfg, "test", args.agent_type)

        def eval_batch_fn(epoch):
            raw = next(iter(eval_loader_fn(10_000 + epoch)))
            return (
                raw
                if "zero_mean_gt_pose" in raw
                else process_batch(raw, cfg.model.pose_mode)
            )

        eval_fn = make_sampling_eval_fn(
            trainer.agent, cfg, eval_batch_fn, log_dir=args.log_dir,
            repeat_num=min(10, cfg.eval.eval_repeat_num),
            num_steps=cfg.sampler.sampling_steps,
        )
    trainer.fit(loader_fn, eval_fn=eval_fn)


def _load_eval_agents(cfg, args, batch0):
    """score (required) + optional energy agent + optional ScaleNet predictor,
    the reference's three-agent eval/tracking wiring
    (reference: runners/evaluation_single.py:222-288,
    evaluation_tracking.py:87-107)."""
    from genpose2_tpu.training.agent import PoseAgent, ScaleAgent
    from genpose2_tpu.training.checkpoint import load_params_only

    sa = PoseAgent(cfg, "score")
    ss = sa.init_state(jax.random.PRNGKey(0), batch0)
    if args.score_ckpt:
        ss = load_params_only(args.score_ckpt, ss, use_ema_as_params=True, cfg=cfg, provider=sa.provider)
    ea = es = None
    if args.energy_ckpt:
        ea = PoseAgent(cfg, "energy")
        es = ea.init_state(jax.random.PRNGKey(0), batch0)
        es = load_params_only(args.energy_ckpt, es, use_ema_as_params=True, cfg=cfg, provider=ea.provider)
    scale_fn = None
    if args.scale_ckpt:
        sc = ScaleAgent(cfg)
        pts_dim = int(sa.extract_features(ss, batch0)[0].shape[-1])
        scs = sc.init_state(jax.random.PRNGKey(0), pts_dim=pts_dim)
        scs = load_params_only(args.scale_ckpt, scs, use_ema_as_params=True, cfg=cfg)

        def scale_fn(batch, R, t, pts_feat=None):
            # ScaleNet consumes the frozen score encoder's feature + the
            # predicted axes (reference: evaluation_single.py:222-288).
            # Callers that already ran the score encoder pass its pts_feat to
            # avoid a redundant backbone+encoder forward.
            if pts_feat is None:
                pts_feat, _ = sa.extract_features(ss, batch)
            return sc.predict(scs, pts_feat, R)

    return sa, ss, ea, es, scale_fn


def cmd_eval(args):
    cfg = build_config(args)
    from itertools import chain

    from genpose2_tpu.data.loader import process_batch
    from genpose2_tpu.eval.pipeline import SingleFrameEvaluator

    loader_fn = make_loader_fn(cfg, "test")
    it = iter(loader_fn(0))

    def proc(b):
        return b if "zero_mean_gt_pose" in b else process_batch(b, cfg.model.pose_mode)

    first_raw = next(it)
    batch0 = proc(first_raw)
    sa, ss, ea, es, scale_fn = _load_eval_agents(cfg, args, batch0)
    ev = SingleFrameEvaluator(
        cfg, sa, ss, ea, es, scale_fn=scale_fn,
        out_dir=os.path.join(args.log_dir, "eval"),
    )
    # streaming: one batch fully evaluated at a time, constant device memory
    metrics = ev.run_streaming(proc(b) for b in chain([first_raw], it))
    print("deg_mean:", metrics.deg_mean, "sht_mean:", metrics.sht_mean)
    print("iou_acc:", metrics.iou_acc)
    print("pose_acc:", metrics.pose_acc)
    print("VUS:", metrics.pose_auc)


def cmd_track(args):
    cfg = build_config(args)
    from genpose2_tpu.data.tracking import open_video_datasets
    from genpose2_tpu.eval.tracking import PoseTracker
    from genpose2_tpu.eval.tracking_multiplex import track_videos_multiplexed, tracking_metrics
    from genpose2_tpu.data.loader import process_batch

    videos = open_video_datasets(
        cfg.data, cfg.data.data_path, fail_log=os.path.join(args.log_dir, "tracking_fail.txt")
    )
    batch0 = process_batch(videos[0][0], cfg.model.pose_mode)
    sa, ss, ea, es, scale_fn = _load_eval_agents(cfg, args, batch0)
    tracker = PoseTracker(
        cfg, sa, ss, ea, es, scale_fn=scale_fn,
        T0=args.T0, num_steps=args.sampling_steps,
    )
    results = track_videos_multiplexed(
        tracker, videos, jax.random.PRNGKey(0), object_budget=cfg.eval.batch_size
    )
    metrics = tracking_metrics(results)
    print("tracking deg_mean:", metrics.deg_mean, "sht_mean:", metrics.sht_mean)
    print("pose_acc:", metrics.pose_acc)


def main():
    parser = argparse.ArgumentParser("genpose2_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name, fn in (("train", cmd_train), ("eval", cmd_eval), ("track", cmd_track)):
        p = sub.add_parser(name)
        add_common_flags(p)
        p.set_defaults(fn=fn, eval_mode=(name != "train"))
    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
