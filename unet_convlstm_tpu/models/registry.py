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
    # Defaults here mirror the reference's PRODUCTION driver config
    # (main.py:227 CUSTOM_CFG: base_ch 64, skip-LSTMs on) — the
    # TemporalUNetConfig dataclass instead mirrors the CLASS defaults
    # (unet.py:132: base_ch 32, skip-LSTMs off). Checkpoints embed the
    # fully-resolved dict (asdict), so the divergence only matters for
    # hand-written partial dicts: build_model is the driver-level path.
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
    import warnings

    from .resnet_unet import (
        ResNetUNetConfig, resnet_unet_init, resnet_unet_apply,
        resnet_unet_init_state,
    )
    from ..utils.torch_weights import find_resnet18_weights, load_torch_resnet18

    # Pretrained-weights policy. The reference's resnet path is DEFINED by
    # frozen ImageNet features (train/resnet18.py:26-33,41-44); freezing a
    # randomly initialized encoder is a configuration it never runs. So:
    # an explicit pretrained_path is loaded (errors propagate loudly); with
    # none given, the standard torch hub cache is searched; if no weights
    # exist anywhere, freeze_encoder is forced off with a warning — random
    # features must never be silently frozen.
    pretrained = None
    if cfg_dict.get("pretrained_resolved"):
        # Config restored from a trained checkpoint (train/loop.py
        # _checkpoint_config): the saved weights already embody the
        # pretrained init, so do NOT re-load an external .pth (it may no
        # longer exist) and honor freeze_encoder as saved — the
        # never-freeze-random policy below is about FRESH inits.
        path = None
    else:
        path = cfg_dict.get("pretrained_path") or find_resnet18_weights()
    if path:
        pretrained = load_torch_resnet18(path, cfg_dict.get("in_channels", 2))
    freeze = cfg_dict.get("freeze_encoder", True)
    if cfg_dict.get("pretrained_resolved"):
        pass  # freeze decision was resolved at training time
    elif freeze and pretrained is None:
        warnings.warn(
            "resnet18 model: freeze_encoder=True but no ImageNet weights "
            "were given (pretrained_path) or found in the torch hub cache "
            "— falling back to freeze_encoder=False so a random encoder "
            "is trained, not frozen. Provide resnet18-*.pth to match the "
            "reference's frozen-ImageNet configuration.",
            stacklevel=2)
        freeze = False
    # record the RESOLVED decision in the caller's dict: the optimizer's
    # trainable-mask (train/loop.py) and the checkpoint-embedded config
    # must see what actually ran, not the pre-fallback request — otherwise
    # AdamW would freeze the RANDOM encoder this guard just refused to
    cfg_dict["freeze_encoder"] = freeze

    cfg = ResNetUNetConfig(
        out_channels=cfg_dict.get("out_channels", 1),
        lstm_layers=cfg_dict.get("lstm_layers", 2),
        freeze_encoder=freeze,
        in_channels=cfg_dict.get("in_channels", 2),
        encoder_bn_train=cfg_dict.get("encoder_bn_train", False),
    )

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
