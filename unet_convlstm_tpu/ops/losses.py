"""Training losses — pure jittable functions.

Behavioral spec (reference main.py:28-72):

* Weighted L1 with weight ``1 + 4*|y|^3`` (penalizes high-velocity errors).
  Mask-normalized when a mask is supplied and ``use_mask`` is on; plain mean
  otherwise.
* Spatial gradient-difference L1 (finite differences along H and W, both
  cropped to the common (H-1, W-1) window), weighted 0.005.
* Overfit-gate loss: masked MSE ``sum(diff^2 * mask) / (sum(mask) + 1e-6)``
  (reference train/overfit_check.py:106-107).

Layout: predictions/targets are [B, T, H, W, C] (NHWC); masks broadcast.
All math in float32 regardless of model compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _spatial_gradients(t: jax.Array):
    # t: [..., H, W, C]
    dx = t[..., :, 1:, :] - t[..., :, :-1, :]
    dy = t[..., 1:, :, :] - t[..., :-1, :, :]
    return dx, dy


def compute_loss(y_pred: jax.Array, y: jax.Array,
                 mask: Optional[jax.Array] = None,
                 use_mask: bool = True,
                 grad_weight: float = 0.005,
                 sample_weight: Optional[jax.Array] = None) -> jax.Array:
    """``sample_weight``: optional [B] 0/1 vector excluding padded batch rows
    (static-shape tail batches for SPMD sharding); with all-ones or None the
    math reduces exactly to the reference formulas."""
    y_pred = y_pred.astype(jnp.float32)
    y = y.astype(jnp.float32)

    sw = None
    if sample_weight is not None:
        sw = sample_weight.astype(jnp.float32).reshape(
            (-1,) + (1,) * (y.ndim - 1))

    abs_diff = jnp.abs(y_pred - y)
    weight = 1.0 + 4.0 * jnp.abs(y) ** 3

    def _mean(t):
        if sw is None:
            return jnp.mean(t)
        n = jnp.sum(jnp.broadcast_to(sw, t.shape))
        return jnp.sum(t * sw) / (n + 1e-8)

    if use_mask and mask is not None:
        m = mask.astype(jnp.float32)
        if sw is not None:
            m = m * sw
        num = jnp.sum(abs_diff * m * weight)
        den = jnp.sum(m * weight) + 1e-8
        weighted_l1 = num / den
    else:
        weighted_l1 = _mean(abs_diff * weight)

    dx_p, dy_p = _spatial_gradients(y_pred)
    dx_g, dy_g = _spatial_gradients(y)
    # Crop both to the common (H-1, W-1) window.
    h_min = dy_p.shape[-3]
    w_min = dx_p.shape[-2]
    grad_diff = (jnp.abs(dx_p[..., :h_min, :w_min, :] - dx_g[..., :h_min, :w_min, :])
                 + jnp.abs(dy_p[..., :h_min, :w_min, :] - dy_g[..., :h_min, :w_min, :]))

    if use_mask and mask is not None:
        mask_c = mask[..., :h_min, :w_min, :].astype(jnp.float32)
        if sw is not None:
            mask_c = mask_c * sw
        grad_loss = jnp.sum(grad_diff * mask_c) / (jnp.sum(mask_c) + 1e-8)
    else:
        grad_loss = _mean(grad_diff)

    return weighted_l1 + grad_weight * grad_loss


def masked_mse(y_pred: jax.Array, y: jax.Array, mask: jax.Array) -> jax.Array:
    """Overfit-gate loss (reference overfit_check.py:106-107)."""
    y_pred = y_pred.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    diff = (y_pred - y) ** 2
    return jnp.sum(diff * mask) / (jnp.sum(mask) + 1e-6)
