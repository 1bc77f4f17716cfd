from .rollout import EpisodeOutputs, build_episode_forward, build_policy_step
from .losses import il_loss, a2c_loss, discounted_returns
from .agent import HAMTAgent, TrainState

__all__ = [
    "EpisodeOutputs",
    "build_episode_forward",
    "build_policy_step",
    "il_loss",
    "a2c_loss",
    "discounted_returns",
    "HAMTAgent",
    "TrainState",
]
