from .dtw import dtw_ndtw_device
from .attention import fused_attention, pallas_available

__all__ = ["dtw_ndtw_device", "fused_attention", "pallas_available"]
