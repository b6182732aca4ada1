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
    max_pool2d, batchnorm_init, batchnorm, batchnorm_from_sums,
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
                policy: Policy = DEFAULT_POLICY,
                fused: bool = False) -> Tuple[jax.Array, dict]:
    if fused and "w_q" in params["conv1"]:
        # int8-quantized checkpoint (ops/quant.py): the Pallas fused
        # kernel is a float kernel — fall through to the unfused path,
        # whose conv2d dispatches to the int8 MXU ops transparently
        fused = False
    if fused:
        from .pallas.doubleconv_fused import fits_fused_conv3x3
        x_c = policy.cast_input(x)
        itemsize = jnp.dtype(x_c.dtype).itemsize
        cin = x_c.shape[-1]
        c1, c2 = params["conv1"]["w"].shape[-1], params["conv2"]["w"].shape[-1]
        # conv2 (the expensive one: c1->c2 with the BN1 prologue) must fit
        # the kernel; channels below a quarter lane (32) pad catastrophically
        # in VMEM (a cin=2 input blows up 64x), so narrow convs stay on XLA.
        conv2_ok = (min(c1, c2) >= 16
                    and fits_fused_conv3x3(x_c.shape[:3] + (c1,), c2,
                                           itemsize))
        if conv2_ok:
            conv1_fused = (cin >= 16
                           and fits_fused_conv3x3(x_c.shape, c1, itemsize))
            return _double_conv_fused(params, stats, x_c, train, policy,
                                      conv1_fused=conv1_fused)
    y = conv2d(params["conv1"], x, policy=policy)
    y, s1 = batchnorm(params["bn1"], stats["bn1"], y, train)
    y = jax.nn.relu(y)
    y = conv2d(params["conv2"], y, policy=policy)
    y, s2 = batchnorm(params["bn2"], stats["bn2"], y, train)
    y = jax.nn.relu(y)
    return y, {"bn1": s1, "bn2": s2}


def _double_conv_fused(params, stats, x_c, train: bool, policy: Policy,
                       conv1_fused: bool = True):
    """DoubleConv via the Pallas fused conv kernel: conv1 fuses the BN1
    stats reduction into its epilogue, conv2 fuses BN1's normalize+ReLU
    into its prologue and BN2's stats into its epilogue; only the final
    normalize+ReLU stays in XLA (it fuses into the consumer). Same math as
    the unfused path — see tests/test_doubleconv_fused.py.

    ``conv1_fused=False``: conv1 runs on XLA (narrow input channels, e.g.
    the 2-channel network input) with the BN1 sums as plain jnp reductions
    (XLA fuses them into the conv epilogue); conv2 still takes the raw y1
    with the normalize+ReLU prologue — the pass that matters."""
    from .pallas.doubleconv_fused import fused_conv3x3

    n_pix1 = x_c.shape[0] * x_c.shape[1] * x_c.shape[2]
    if conv1_fused:
        y1, s1, q1 = fused_conv3x3(
            x_c, policy.cast_param(params["conv1"]["w"]),
            params["conv1"]["b"], want_stats=train)
    else:
        y1 = conv2d(params["conv1"], x_c, policy=policy)
        y1f = y1.astype(jnp.float32)
        s1 = jnp.sum(y1f, axis=(0, 1, 2))
        q1 = jnp.sum(y1f * y1f, axis=(0, 1, 2))
    inv1, shift1, new_s1 = batchnorm_from_sums(
        params["bn1"], stats["bn1"], s1, q1, n_pix1, train)
    y2, s2, q2 = fused_conv3x3(
        y1, policy.cast_param(params["conv2"]["w"]), params["conv2"]["b"],
        pre_inv=inv1, pre_shift=shift1, want_stats=train)
    inv2, shift2, new_s2 = batchnorm_from_sums(
        params["bn2"], stats["bn2"], s2, q2, n_pix1, train)
    y = jax.nn.relu(y2 * inv2.astype(y2.dtype) + shift2.astype(y2.dtype))
    return y, {"bn1": new_s1, "bn2": new_s2}


# ---------------------------------------------------------------------------
# Down: MaxPool2 + DoubleConv
# ---------------------------------------------------------------------------

def down_init(key, in_ch: int, out_ch: int):
    return double_conv_init(key, in_ch, out_ch)


def down(params, stats, x, train: bool,
         policy: Policy = DEFAULT_POLICY,
         fused: bool = False) -> Tuple[jax.Array, dict]:
    return double_conv(params, stats, max_pool2d(x, 2), train, policy,
                       fused=fused)


# ---------------------------------------------------------------------------
# Up: ConvTranspose2d(in, in//2, 2, s2) + pad-to-skip + concat + DoubleConv
# ---------------------------------------------------------------------------

def up_init(key, in_ch: int, out_ch: int):
    k1, k2 = jax.random.split(key)
    up_p = conv_transpose2d_init(k1, in_ch, in_ch // 2, 2)
    dc_p, dc_s = double_conv_init(k2, in_ch, out_ch)
    return {"up": up_p, "conv": dc_p}, {"conv": dc_s}


def up(params, stats, x_deep, x_skip, train: bool,
       policy: Policy = DEFAULT_POLICY,
       fused: bool = False) -> Tuple[jax.Array, dict]:
    """x_deep: coarse feature to upsample; x_skip: encoder skip (NHWC)."""
    x1 = conv_transpose2d(params["up"], x_deep, stride=2, policy=policy)
    # Center-pad x1 spatially to match the skip (reference unet.py:95-97).
    dh = x_skip.shape[1] - x1.shape[1]
    dw = x_skip.shape[2] - x1.shape[2]
    if dh or dw:
        x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                          (dw // 2, dw - dw // 2), (0, 0)))
    x = jnp.concatenate([x_skip, x1.astype(x_skip.dtype)], axis=-1)
    y, s = double_conv(params["conv"], stats["conv"], x, train, policy,
                       fused=fused)
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
