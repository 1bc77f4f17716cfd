from .rollout import EpisodeOutputs, build_episode_forward, build_policy_step
from .losses import il_loss, a2c_loss, discounted_returns
from .agent import HAMTAgent, TrainState
from .variants import R2RBackAgent, CVDNAgent
from .reverie import ReverieAgent

__all__ = [
    "R2RBackAgent",
    "CVDNAgent",
    "EpisodeOutputs",
    "build_episode_forward",
    "build_policy_step",
    "il_loss",
    "a2c_loss",
    "discounted_returns",
    "HAMTAgent",
    "TrainState",
]
