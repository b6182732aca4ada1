from .convlstm_fused import fused_gate_update

__all__ = ["fused_gate_update"]
