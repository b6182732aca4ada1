from .temporal_unet import (
    TemporalUNetConfig,
    temporal_unet_init,
    temporal_unet_apply,
    temporal_unet_init_state,
)
from .resnet_unet import (
    ResNetUNetConfig,
    resnet_unet_init,
    resnet_unet_apply,
    resnet_unet_init_state,
)
from .registry import build_model, MODEL_REGISTRY

__all__ = [
    "TemporalUNetConfig",
    "temporal_unet_init",
    "temporal_unet_apply",
    "temporal_unet_init_state",
    "ResNetUNetConfig",
    "resnet_unet_init",
    "resnet_unet_apply",
    "resnet_unet_init_state",
    "build_model",
    "MODEL_REGISTRY",
]
