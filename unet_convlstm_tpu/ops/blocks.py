"""UNet building blocks (NHWC, functional).

Capability parity (behavioral spec, re-designed for TPU):

* DoubleConv  — Conv3x3+BN+ReLU twice          (reference train/unet.py:66-75)
* Down        — MaxPool2 then DoubleConv        (reference train/unet.py:78-84)
* Up          — ConvTranspose(k2,s2) + center-pad-to-match + concat(skip, up)
                + DoubleConv                    (reference train/unet.py:87-98)
* OutConv     — 1x1 conv                        (reference train/unet.py:101-107)
* SpatialAttention — CBAM-style: [mean_c ‖ max_c] → 7x7 conv → sigmoid gate
                                                (reference train/unet.py:113-125)

Every block is a pair (init, apply); apply threads BatchNorm running stats.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, DEFAULT_POLICY
from .conv import (
    conv2d_init, conv2d,
    conv_transpose2d_init, conv_transpose2d,
    max_pool2d, batchnorm_init, batchnorm,
)


# ---------------------------------------------------------------------------
# DoubleConv
# ---------------------------------------------------------------------------

def double_conv_init(key, in_ch: int, out_ch: int):
    k1, k2 = jax.random.split(key)
    p1 = conv2d_init(k1, in_ch, out_ch, 3)
    p2 = conv2d_init(k2, out_ch, out_ch, 3)
    bn1_p, bn1_s = batchnorm_init(out_ch)
    bn2_p, bn2_s = batchnorm_init(out_ch)
    params = {"conv1": p1, "bn1": bn1_p, "conv2": p2, "bn2": bn2_p}
    stats = {"bn1": bn1_s, "bn2": bn2_s}
    return params, stats


def double_conv(params, stats, x, train: bool,
                policy: Policy = DEFAULT_POLICY) -> Tuple[jax.Array, dict]:
    y = conv2d(params["conv1"], x, policy=policy)
    y, s1 = batchnorm(params["bn1"], stats["bn1"], y, train)
    y = jax.nn.relu(y)
    y = conv2d(params["conv2"], y, policy=policy)
    y, s2 = batchnorm(params["bn2"], stats["bn2"], y, train)
    y = jax.nn.relu(y)
    return y, {"bn1": s1, "bn2": s2}


# ---------------------------------------------------------------------------
# Down: MaxPool2 + DoubleConv
# ---------------------------------------------------------------------------

def down_init(key, in_ch: int, out_ch: int):
    return double_conv_init(key, in_ch, out_ch)


def down(params, stats, x, train: bool,
         policy: Policy = DEFAULT_POLICY) -> Tuple[jax.Array, dict]:
    return double_conv(params, stats, max_pool2d(x, 2), train, policy)


# ---------------------------------------------------------------------------
# Up: ConvTranspose2d(in, in//2, 2, s2) + pad-to-skip + concat + DoubleConv
# ---------------------------------------------------------------------------

def up_init(key, in_ch: int, out_ch: int):
    k1, k2 = jax.random.split(key)
    up_p = conv_transpose2d_init(k1, in_ch, in_ch // 2, 2)
    dc_p, dc_s = double_conv_init(k2, in_ch, out_ch)
    return {"up": up_p, "conv": dc_p}, {"conv": dc_s}


def up(params, stats, x_deep, x_skip, train: bool,
       policy: Policy = DEFAULT_POLICY) -> Tuple[jax.Array, dict]:
    """x_deep: coarse feature to upsample; x_skip: encoder skip (NHWC)."""
    x1 = conv_transpose2d(params["up"], x_deep, stride=2, policy=policy)
    # Center-pad x1 spatially to match the skip (reference unet.py:95-97).
    dh = x_skip.shape[1] - x1.shape[1]
    dw = x_skip.shape[2] - x1.shape[2]
    if dh or dw:
        x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                          (dw // 2, dw - dw // 2), (0, 0)))
    x = jnp.concatenate([x_skip, x1.astype(x_skip.dtype)], axis=-1)
    y, s = double_conv(params["conv"], stats["conv"], x, train, policy)
    return y, {"conv": s}


# ---------------------------------------------------------------------------
# OutConv: 1x1
# ---------------------------------------------------------------------------

def out_conv_init(key, in_ch: int, out_ch: int):
    return conv2d_init(key, in_ch, out_ch, 1)


def out_conv(params, x, policy: Policy = DEFAULT_POLICY):
    return conv2d(params, x, policy=policy)


# ---------------------------------------------------------------------------
# SpatialAttention (CBAM-style)
# ---------------------------------------------------------------------------

def spatial_attention_init(key, kernel_size: int = 7):
    return conv2d_init(key, 2, 1, kernel_size, bias=False)


def spatial_attention(params, x, policy: Policy = DEFAULT_POLICY):
    avg = jnp.mean(x, axis=-1, keepdims=True)
    mx = jnp.max(x, axis=-1, keepdims=True)
    gate = jax.nn.sigmoid(conv2d(params, jnp.concatenate([avg, mx], -1),
                                 policy=policy))
    return x * gate.astype(x.dtype)
