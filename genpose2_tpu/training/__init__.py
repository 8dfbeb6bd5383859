from genpose2_tpu.training.ema import ema_init, ema_update
from genpose2_tpu.training.ranking import ranking_loss, sort_poses_by_energy, sort_results
from genpose2_tpu.training.agent import PoseAgent, ScaleAgent, TrainState

__all__ = [
    "ema_init",
    "ema_update",
    "ranking_loss",
    "sort_poses_by_energy",
    "sort_results",
    "PoseAgent",
    "ScaleAgent",
    "TrainState",
]
