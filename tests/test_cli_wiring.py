"""CLI command wiring: train score -> train scale (frozen score) -> train
energy (warm start) -> three-agent streaming eval, all through cmd_train /
cmd_eval exactly as a user would drive them (reference shell surface:
scripts/train_*.sh + eval_single.sh; three-agent eval wiring:
runners/evaluation_single.py:222-288, evaluation_tracking.py:87-107).

build_config is monkeypatched to the tiny test config so the full chain runs
on CPU in seconds; the flag->command plumbing is exercised unchanged."""

import argparse
import dataclasses
import json
import os

import numpy as np
import pytest

from genpose2_tpu import cli
from genpose2_tpu.config import tiny_test_config


def _args(**kw):
    """A Namespace covering every flag the commands read."""
    base = dict(
        data_path="", source="synthetic", batch_size=4, pose_mode="rot_matrix",
        seed=0, num_points=128, img_size=64, per_obj="", percentage_data=1.0,
        sampler_mode="fixed", sampling_steps=5, sde_mode="ve",
        regression_head="Rx_Ry_and_T", pts_encoder="pointnet2",
        energy_mode="IP", s_theta_mode="score", norm_energy="identical",
        dino="none", agent_type="score", n_epochs=1, log_dir="",
        optimizer="adam", eval_freq=100, repeat_num=2, grad_clip=1.0,
        ema_rate=0.999, lr=1e-3, warmup=5, lr_decay=0.98, eval_repeat_num=4,
        T0=0.55, clustering=1, clustering_eps=0.05, clustering_minpts=0.1667,
        retain_ratio=0.5, score_ckpt=None, energy_ckpt=None, scale_ckpt=None,
        steps_per_epoch=3, use_pretrain=False, pretrain_path=None,
        data_parallel=1, scan_chunk=2, multihost=False, coordinator=None,
        num_hosts=None, host_id=None, eval_mode=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture()
def tiny_build_config(monkeypatch):
    def fake_build_config(args):
        cfg = tiny_test_config()
        train = dataclasses.replace(
            cfg.train,
            agent_type=args.agent_type,
            batch_size=args.batch_size,
            n_epochs=args.n_epochs,
            eval_freq=args.eval_freq,
            scan_chunk=args.scan_chunk,
            warmup=args.warmup,
        )
        ev = dataclasses.replace(
            cfg.eval, eval_repeat_num=args.eval_repeat_num, T0=args.T0,
            retain_ratio=args.retain_ratio, batch_size=args.batch_size,
        )
        sampler = dataclasses.replace(
            cfg.sampler, mode=args.sampler_mode, sampling_steps=args.sampling_steps
        )
        data = dataclasses.replace(
            cfg.data, source=args.source, data_path=args.data_path,
            num_points=cfg.model.num_points,
        )
        return cfg.replace(train=train, eval=ev, sampler=sampler, data=data,
                           log_dir=args.log_dir)

    monkeypatch.setattr(cli, "build_config", fake_build_config)
    return fake_build_config


class TestCliThreeAgentChain:
    def test_train_then_three_agent_eval(self, tiny_build_config, tmp_path):
        # 1. train the score agent (scanned epoch path)
        score_dir = str(tmp_path / "score")
        cli.cmd_train(_args(agent_type="score", log_dir=score_dir, n_epochs=1))
        score_ckpt = os.path.join(score_dir, "ckpt", "final")
        assert os.path.exists(score_ckpt)
        # the in-training sampling eval hook ran on the final epoch and its
        # metrics landed in the JSONL (reference: runners/trainer.py:87-103)
        with open(os.path.join(score_dir, "score_metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert any("eval_deg_mean" in r for r in recs), recs

        # 2. train ScaleNet on the frozen score encoder
        scale_dir = str(tmp_path / "scale")
        cli.cmd_train(
            _args(agent_type="scale", log_dir=scale_dir, n_epochs=1,
                  score_ckpt=score_ckpt)
        )
        scale_ckpt = os.path.join(scale_dir, "ckpt", "final")
        assert os.path.exists(scale_ckpt)

        # 3. train the energy agent warm-started from the score weights
        energy_dir = str(tmp_path / "energy")
        cli.cmd_train(
            _args(agent_type="energy_with_ranking", log_dir=energy_dir,
                  n_epochs=1, score_ckpt=score_ckpt)
        )
        energy_ckpt = os.path.join(energy_dir, "ckpt", "final")
        assert os.path.exists(energy_ckpt)

        # 4. three-agent streaming eval through the CLI
        eval_dir = str(tmp_path / "evalrun")
        cli.cmd_eval(
            _args(log_dir=eval_dir, score_ckpt=score_ckpt,
                  energy_ckpt=energy_ckpt, scale_ckpt=scale_ckpt,
                  eval_mode=True)
        )
        with open(os.path.join(eval_dir, "eval", "metrics.json")) as f:
            blob = json.load(f)
        assert np.isfinite(blob["deg_mean"])
        assert "pose_auc" in blob
        # streaming per-batch caches exist
        assert os.path.exists(os.path.join(eval_dir, "eval", "batch_000000.npz"))

    def test_resume_flag(self, tiny_build_config, tmp_path):
        d = str(tmp_path / "r")
        cli.cmd_train(_args(agent_type="score", log_dir=d, n_epochs=1))
        ckpt = os.path.join(d, "ckpt", "final")
        # resume for one more epoch from the saved state
        cli.cmd_train(
            _args(agent_type="score", log_dir=str(tmp_path / "r2"), n_epochs=2,
                  use_pretrain=True, pretrain_path=ckpt)
        )
        assert os.path.exists(os.path.join(str(tmp_path / "r2"), "ckpt", "final"))
