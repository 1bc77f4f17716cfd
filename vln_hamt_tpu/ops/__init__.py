from .attention import fused_attention, pallas_available

__all__ = ["fused_attention", "pallas_available"]
