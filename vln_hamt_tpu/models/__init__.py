from .hamt import HAMT, Critic, init_hamt_params
from .layers import erf_gelu

__all__ = ["HAMT", "Critic", "init_hamt_params", "erf_gelu"]
