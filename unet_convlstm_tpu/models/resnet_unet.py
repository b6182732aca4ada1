"""PretrainedTemporalUNet — ResNet18-UNet with ConvLSTM bottleneck + skips.

Capability parity with reference ``train/resnet18.py:19-139``
(PretrainedTemporalUNet built on segmentation-models-pytorch):

* Encoder: ResNet18, 5 stages → features at /2 (64ch), /4 (64), /8 (128),
  /16 (256), /32 (512); optionally frozen (resnet18.py:41-44) and optionally
  ImageNet-initialized via the torch→JAX weight converter
  (``utils/torch_weights.py`` — no network access assumed).
* UNet decoder: 5 blocks of [nearest-2x upsample, concat skip,
  (Conv3x3+BN+ReLU)×2] with decoder channels (256,128,64,32,16), then a 3x3
  head conv (the smp.Unet topology the reference instantiates,
  resnet18.py:26-33).
* ConvLSTM(512→512, ``lstm_layers`` deep) over the bottleneck sequence
  (resnet18.py:48-54) and one ConvLSTM per used skip level with channels
  [64, 64, 128, 256] (resnet18.py:64-74,120-128). Note: the reference also
  builds an LSTM over the stage-0 identity feature, whose output its decoder
  then discards (smp's UnetDecoder drops features[0]) — dead compute we do
  not replicate.
* forward [B,T,C,H,W]→([B,T,1,H,W], state): encoder/decoder run batched over
  B·T (the reference already does this, resnet18.py:83-87,131-137); the
  recurrences run as ``lax.scan`` and thread a streaming carry (the
  reference returns state=None and cannot stream, resnet18.py:139).

Frozen-encoder BatchNorm: the reference keeps frozen-encoder BN layers in
train mode (batch stats + running-stat updates) because freezing only stops
gradients. Here the frozen encoder defaults to inference-mode BN (running
stats, no updates) — the statistically sound version; set
``encoder_bn_train=True`` for the reference's exact behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, DEFAULT_POLICY
from ..ops.conv import conv2d_init, conv2d, batchnorm_init, batchnorm, max_pool2d
from ..ops.blocks import double_conv_init, double_conv, out_conv_init, out_conv
from ..ops.convlstm import convlstm_init, convlstm, convlstm_zero_state

ENCODER_CHANNELS = (64, 64, 128, 256, 512)   # stages 1..5
DECODER_CHANNELS = (256, 128, 64, 32, 16)


@dataclasses.dataclass(frozen=True)
class ResNetUNetConfig:
    out_channels: int = 1
    lstm_layers: int = 2          # reference main.py:255
    freeze_encoder: bool = True
    in_channels: int = 2
    encoder_bn_train: bool = False

    def to_dict(self):
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# ResNet18 encoder (NHWC)
# ---------------------------------------------------------------------------

def _basic_block_init(key, in_ch: int, out_ch: int, stride: int):
    k1, k2, k3 = jax.random.split(key, 3)
    params: Dict[str, Any] = {
        "conv1": conv2d_init(k1, in_ch, out_ch, 3, bias=False),
        "conv2": conv2d_init(k2, out_ch, out_ch, 3, bias=False),
    }
    bn1_p, bn1_s = batchnorm_init(out_ch)
    bn2_p, bn2_s = batchnorm_init(out_ch)
    params["bn1"], params["bn2"] = bn1_p, bn2_p
    stats = {"bn1": bn1_s, "bn2": bn2_s}
    if stride != 1 or in_ch != out_ch:
        params["down_conv"] = conv2d_init(k3, in_ch, out_ch, 1, bias=False)
        dbn_p, dbn_s = batchnorm_init(out_ch)
        params["down_bn"] = dbn_p
        stats["down_bn"] = dbn_s
    return params, stats


def _basic_block(params, stats, x, stride: int, train: bool,
                 policy: Policy) -> Tuple[jax.Array, dict]:
    ns: Dict[str, Any] = {}
    # explicit symmetric pad 1: XLA's "SAME" pads (0,1) under stride 2,
    # torch-semantics resnet pads (1,1)
    y = conv2d(params["conv1"], x, stride=stride,
               padding=[(1, 1), (1, 1)], policy=policy)
    y, ns["bn1"] = batchnorm(params["bn1"], stats["bn1"], y, train)
    y = jax.nn.relu(y)
    y = conv2d(params["conv2"], y, policy=policy)
    y, ns["bn2"] = batchnorm(params["bn2"], stats["bn2"], y, train)
    if "down_conv" in params:
        sc = conv2d(params["down_conv"], x, stride=stride, padding="VALID",
                    policy=policy)
        sc, ns["down_bn"] = batchnorm(params["down_bn"], stats["down_bn"],
                                      sc, train)
    else:
        sc = x
    return jax.nn.relu(y + sc.astype(y.dtype)), ns


def resnet18_encoder_init(key, in_channels: int = 2):
    keys = jax.random.split(key, 10)
    params: Dict[str, Any] = {
        "conv1": conv2d_init(keys[0], in_channels, 64, 7, bias=False)}
    bn_p, bn_s = batchnorm_init(64)
    params["bn1"] = bn_p
    stats: Dict[str, Any] = {"bn1": bn_s}
    plan = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
    ki = 1
    for li, (cin, cout, stride) in enumerate(plan, start=1):
        for bi in range(2):
            name = f"layer{li}_{bi}"
            bp, bs = _basic_block_init(keys[ki], cin if bi == 0 else cout,
                                       cout, stride if bi == 0 else 1)
            params[name], stats[name] = bp, bs
            ki += 1
    return params, stats


def resnet18_encoder_apply(params, stats, x, train: bool,
                           policy: Policy = DEFAULT_POLICY
                           ) -> Tuple[List[jax.Array], dict]:
    """x: [N,H,W,C] → 5 features at /2,/4,/8,/16,/32 + new stats."""
    ns: Dict[str, Any] = {}
    y = conv2d(params["conv1"], x, stride=2, padding=[(3, 3), (3, 3)],
               policy=policy)
    y, ns["bn1"] = batchnorm(params["bn1"], stats["bn1"], y, train)
    f1 = jax.nn.relu(y)                                   # /2, 64
    # torch maxpool(3, stride 2, padding 1)
    y = jnp.pad(f1, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    y = max_pool2d(y, window=3, stride=2)                  # /4
    feats = [f1]
    plan = [(1, 1), (2, 2), (3, 2), (4, 2)]
    for li, stride in plan:
        for bi in range(2):
            name = f"layer{li}_{bi}"
            y, ns[name] = _basic_block(params[name], stats[name], y,
                                       stride if bi == 0 else 1, train,
                                       policy)
        feats.append(y)
    return feats, ns


# ---------------------------------------------------------------------------
# UNet decoder (smp topology: upsample-nearest + concat + DoubleConv)
# ---------------------------------------------------------------------------

def _upsample2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def decoder_init(key, out_channels: int):
    head_ch = ENCODER_CHANNELS[-1]
    in_chs = (head_ch,) + DECODER_CHANNELS[:-1]
    skip_chs = tuple(reversed(ENCODER_CHANNELS[:-1])) + (0,)
    keys = jax.random.split(key, len(DECODER_CHANNELS) + 1)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, (cin, cskip, cout) in enumerate(zip(in_chs, skip_chs,
                                               DECODER_CHANNELS)):
        params[f"block{i}"], stats[f"block{i}"] = double_conv_init(
            keys[i], cin + cskip, cout)
    params["head"] = conv2d_init(keys[-1], DECODER_CHANNELS[-1],
                                 out_channels, 3)
    return params, stats


def decoder_apply(params, stats, features: List[jax.Array], train: bool,
                  policy: Policy = DEFAULT_POLICY):
    ns: Dict[str, Any] = {}
    skips = features[:-1][::-1]  # [/16, /8, /4, /2]
    y = features[-1]
    for i in range(len(DECODER_CHANNELS)):
        y = _upsample2x(y)
        if i < len(skips):
            y = jnp.concatenate([y, skips[i].astype(y.dtype)], axis=-1)
        y, ns[f"block{i}"] = double_conv(params[f"block{i}"],
                                         stats[f"block{i}"], y, train,
                                         policy)
    y = conv2d(params["head"], y, policy=policy)
    return y, ns


# ---------------------------------------------------------------------------
# Full temporal model
# ---------------------------------------------------------------------------

def resnet_unet_init(key, cfg: ResNetUNetConfig,
                     pretrained_params: Optional[Dict[str, Any]] = None):
    kenc, kdec, klstm, *kskips = jax.random.split(key, 7)
    enc_p, enc_s = resnet18_encoder_init(kenc, cfg.in_channels)
    if pretrained_params is not None:
        enc_p = pretrained_params["params"]
        enc_s = pretrained_params["stats"]
    dec_p, dec_s = decoder_init(kdec, cfg.out_channels)
    params: Dict[str, Any] = {"encoder": enc_p, "decoder": dec_p}
    stats: Dict[str, Any] = {"encoder": enc_s, "decoder": dec_s}
    params["temporal"] = convlstm_init(klstm, 512, 512, cfg.lstm_layers)
    for i, ch in enumerate(ENCODER_CHANNELS[:-1]):
        params[f"skip{i}"] = convlstm_init(kskips[i], ch, ch,
                                           cfg.lstm_layers)
    return {"params": params, "stats": stats}


def resnet_unet_init_state(cfg: ResNetUNetConfig, batch: int, height: int,
                           width: int, dtype=jnp.float32):
    state: Dict[str, Any] = {
        "temporal": [convlstm_zero_state(batch, height // 32, width // 32,
                                         512, dtype)
                     for _ in range(cfg.lstm_layers)]}
    divs = (2, 4, 8, 16)
    for i, (ch, d) in enumerate(zip(ENCODER_CHANNELS[:-1], divs)):
        state[f"skip{i}"] = [convlstm_zero_state(batch, height // d,
                                                 width // d, ch, dtype)
                             for _ in range(cfg.lstm_layers)]
    return state


from .layout import (flatten_seq as _flatten_seq,  # noqa: E402
                     unflatten_seq as _unflatten_seq,
                     to_time_major as _to_time_major,
                     to_batch_major as _to_batch_major)


def resnet_unet_apply(variables, x_seq: jax.Array, cfg: ResNetUNetConfig,
                      state: Optional[Dict[str, Any]] = None,
                      train: bool = False,
                      policy: Policy = DEFAULT_POLICY,
                      use_pallas: bool = False,
                      unroll: int = 1,
                      remat: bool = False,
                      flat_layout: str = "time"):
    """x_seq: [B,T,H,W,in_channels] → (y_seq [B,T,H,W,out], new_state,
    new_stats). H, W must be divisible by 32. ``flat_layout``: "time"
    (single-chip fastest) or "batch" (sharding-stable under a data
    mesh) — see models/layout.py."""
    params, stats = variables["params"], variables["stats"]
    B, T = x_seq.shape[0], x_seq.shape[1]
    # BN batch stats are order-invariant; both flatten layouts compute
    # the same function (models/layout.py)
    x_bt = _flatten_seq(x_seq, flat_layout)

    enc_train = train and (not cfg.freeze_encoder or cfg.encoder_bn_train)
    enc_apply = (jax.checkpoint(resnet18_encoder_apply,
                                static_argnums=(3, 4))
                 if remat else resnet18_encoder_apply)
    feats, enc_ns = enc_apply(params["encoder"], stats["encoder"], x_bt,
                              enc_train, policy)
    if cfg.freeze_encoder and not cfg.encoder_bn_train:
        enc_ns = stats["encoder"]  # frozen: running stats untouched
        feats = [jax.lax.stop_gradient(f) for f in feats]

    new_state: Dict[str, Any] = {}
    # bottleneck recurrence
    xb_tm = _to_time_major(feats[-1], B, T, flat_layout)
    s = None if state is None else state.get("temporal")
    xb_out, new_state["temporal"] = convlstm(params["temporal"], xb_tm,
                                             state=s, policy=policy,
                                             use_pallas=use_pallas,
                                             unroll=unroll,
                                             flat_layout=flat_layout)
    feats[-1] = _to_batch_major(xb_out, B, T,
                                flat_layout).astype(x_bt.dtype)
    # skip recurrences
    for i in range(len(ENCODER_CHANNELS) - 1):
        f_tm = _to_time_major(feats[i], B, T, flat_layout)
        s = None if state is None else state.get(f"skip{i}")
        f_out, new_state[f"skip{i}"] = convlstm(params[f"skip{i}"], f_tm,
                                                state=s, policy=policy,
                                                use_pallas=use_pallas,
                                                unroll=unroll,
                                                flat_layout=flat_layout)
        feats[i] = _to_batch_major(f_out, B, T,
                                   flat_layout).astype(x_bt.dtype)

    y_bt, dec_ns = decoder_apply(params["decoder"], stats["decoder"], feats,
                                 train, policy)
    y_seq = _unflatten_seq(y_bt, B, T, flat_layout)
    return y_seq, new_state, {"encoder": enc_ns, "decoder": dec_ns}
