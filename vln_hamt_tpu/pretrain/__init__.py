from .model import HAMTPretrain, init_pretrain_params
from .trajectory_data import TrajectoryDataset, make_synthetic_trajectories
from .tasks import PretrainBatcher, TASK_NAMES
from .trainer import PretrainTrainer, TaskScheduler

__all__ = [
    "HAMTPretrain",
    "init_pretrain_params",
    "TrajectoryDataset",
    "make_synthetic_trajectories",
    "PretrainBatcher",
    "TASK_NAMES",
    "PretrainTrainer",
    "TaskScheduler",
]
