from .temporal_unet import (
    TemporalUNetConfig,
    temporal_unet_init,
    temporal_unet_apply,
    temporal_unet_init_state,
)
from .registry import build_model, MODEL_REGISTRY

__all__ = [
    "TemporalUNetConfig",
    "temporal_unet_init",
    "temporal_unet_apply",
    "temporal_unet_init_state",
    "build_model",
    "MODEL_REGISTRY",
]
