"""Model registry — type-dispatch from checkpoint-embedded configs.

Mirrors the reference's load-time dispatch on ``checkpoint['config']['type']``
(train/get_metrics.py:67-90, test.py:72-95): a saved config dict fully
determines which model to rebuild.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax

from .temporal_unet import (
    TemporalUNetConfig, temporal_unet_init, temporal_unet_apply,
    temporal_unet_init_state,
)


def _build_custom(cfg_dict: Dict[str, Any]):
    cfg = TemporalUNetConfig(
        in_channels_per_sat=cfg_dict.get("in_channels_per_sat", 1),
        out_channels=cfg_dict.get("out_channels", 1),
        base_ch=cfg_dict.get("base_ch", 64),
        lstm_layers=cfg_dict.get("lstm_layers", 1),
        use_skip_lstm=cfg_dict.get("use_skip_lstm", True),
        use_attention=cfg_dict.get("use_attention", False),
    )

    def init(key):
        return temporal_unet_init(key, cfg)

    def apply(variables, x_seq, state=None, train=False, **kw):
        return temporal_unet_apply(variables, x_seq, cfg, state=state,
                                   train=train, **kw)

    def init_state(batch, height, width):
        return temporal_unet_init_state(cfg, batch, height, width)

    return cfg, init, apply, init_state


def _build_resnet18(cfg_dict: Dict[str, Any]):
    from .resnet_unet import (
        ResNetUNetConfig, resnet_unet_init, resnet_unet_apply,
        resnet_unet_init_state,
    )
    cfg = ResNetUNetConfig(
        out_channels=cfg_dict.get("out_channels", 1),
        lstm_layers=cfg_dict.get("lstm_layers", 2),
        freeze_encoder=cfg_dict.get("freeze_encoder", True),
        in_channels=cfg_dict.get("in_channels", 2),
        encoder_bn_train=cfg_dict.get("encoder_bn_train", False),
    )
    pretrained = None
    if cfg_dict.get("pretrained_path"):
        from ..utils.torch_weights import load_torch_resnet18
        pretrained = load_torch_resnet18(cfg_dict["pretrained_path"],
                                         cfg.in_channels)

    def init(key):
        return resnet_unet_init(key, cfg, pretrained_params=pretrained)

    def apply(variables, x_seq, state=None, train=False, **kw):
        return resnet_unet_apply(variables, x_seq, cfg, state=state,
                                 train=train, **kw)

    def init_state(batch, height, width):
        return resnet_unet_init_state(cfg, batch, height, width)

    return cfg, init, apply, init_state


MODEL_REGISTRY: Dict[str, Callable] = {
    "custom": _build_custom,
    "resnet18": _build_resnet18,
}


def build_model(cfg_dict: Dict[str, Any]) -> Tuple[Any, Callable, Callable, Callable]:
    """Returns (cfg, init_fn, apply_fn, init_state_fn) for a config dict with
    a 'type' key ('custom' by default, as in get_metrics.py:70)."""
    model_type = cfg_dict.get("type", "custom")
    if model_type not in MODEL_REGISTRY:
        raise ValueError(f"unknown model type {model_type!r}; "
                         f"known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[model_type](cfg_dict)
