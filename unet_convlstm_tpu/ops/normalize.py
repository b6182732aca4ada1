"""Dataset normalization / denormalization as pure jittable functions.

Behavioral spec (reference train/unet.py:210-327, NPZSequenceDataset):

* X: divide by the global max of X, floored at 1.0 (unet.py:218-220).
* Mask: ``raw_x[channel 0] > 1.1`` computed on RAW (pre-normalization) values
  (unet.py:277-279).
* Y: optional clip to [min_vel, max_vel] — explicit values or percentiles
  (1e-5 / 99.99999) of the raw Y (unet.py:223-231); then a non-linear
  transform ``asinh(y/scale)`` or ``sign(y)*log1p(|y|/scale)`` with scale =
  the 99th percentile of |Y| (unet.py:236-248); then affine to [-1, 1] using
  the transformed min/max (unet.py:299).
* denormalize inverts: affine → sinh/expm1 → raw units (unet.py:306-327).

The statistics are computed ONCE on host (np.percentile semantics) and frozen
in a ``NormStats`` dataclass; the per-sample transforms are pure jnp functions
so they fuse into the input pipeline on device — the reference recomputes them
per __getitem__ on host numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NormStats:
    norm_const: float          # X divisor: max(max(X), 1.0)
    min_vel: float             # raw-space clip lower bound
    max_vel: float             # raw-space clip upper bound
    y_scale: float             # transform scale (99th pct of |Y|)
    trans_min: float           # transformed-space min (for [-1,1] affine)
    trans_max: float           # transformed-space max
    y_transform: str = "asinh"    # 'asinh' | 'signed_log' | 'none'
    clip_outliers: bool = True
    mask_threshold: float = 1.1

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        return cls(**d)


def _transform_np(arr, transform: str, scale: float):
    if transform == "asinh":
        return np.arcsinh(arr / scale)
    if transform == "signed_log":
        return np.sign(arr) * np.log1p(np.abs(arr) / scale)
    return arr


def compute_norm_stats(X: np.ndarray, Y: np.ndarray,
                       min_y: Optional[float] = None,
                       max_y: Optional[float] = None,
                       lower_percentile: float = 0.00001,
                       upper_percentile: float = 99.99999,
                       clip_outliers: bool = True,
                       y_transform: str = "asinh",
                       y_transform_scale: Optional[float] = None,
                       y_transform_percentile: Optional[float] = 99,
                       mask_threshold: float = 1.1) -> NormStats:
    """One-shot host-side statistics pass (manifest material)."""
    x_max = float(np.max(X))
    norm_const = max(x_max, 1.0)

    if (min_y is not None) and (max_y is not None):
        min_vel, max_vel = float(min_y), float(max_y)
        explicit = True
    else:
        min_vel = float(np.percentile(Y, lower_percentile))
        max_vel = float(np.percentile(Y, upper_percentile))
        explicit = False

    if y_transform_scale is None:
        if y_transform_percentile is not None:
            y_scale = float(np.percentile(np.abs(Y), y_transform_percentile))
        else:
            y_scale = 1.0
    else:
        y_scale = float(y_transform_scale)
    if y_scale <= 0.0:
        # >99%-zero targets (sparse velocity maps) give percentile 0:
        # asinh(y/0) would make every normalized target inf/NaN and
        # training would silently NaN — fall back to a unit scale
        y_scale = 1.0

    if explicit:
        trans_min = float(_transform_np(np.float64(min_vel), y_transform, y_scale))
        trans_max = float(_transform_np(np.float64(max_vel), y_transform, y_scale))
    else:
        y_trans = _transform_np(Y, y_transform, y_scale)
        trans_min = float(np.percentile(y_trans, lower_percentile))
        trans_max = float(np.percentile(y_trans, upper_percentile))

    if trans_max == trans_min:  # zero-division guard (unet.py:263-265)
        trans_max = trans_min + 1.0

    return NormStats(norm_const=norm_const, min_vel=min_vel, max_vel=max_vel,
                     y_scale=y_scale, trans_min=trans_min, trans_max=trans_max,
                     y_transform=y_transform, clip_outliers=clip_outliers,
                     mask_threshold=mask_threshold)


# ---------------------------------------------------------------------------
# Pure per-sample transforms (jit-friendly; stats baked in as Python floats)
# ---------------------------------------------------------------------------

def compute_mask(x_raw: jax.Array, stats: NormStats) -> jax.Array:
    """Mask from RAW x, channel 0. x_raw: [..., H, W, C] (NHWC) — keeps a
    singleton channel, mirroring reference unet.py:279."""
    return (x_raw[..., 0:1] > stats.mask_threshold).astype(jnp.float32)


def normalize_x(x_raw: jax.Array, stats: NormStats) -> jax.Array:
    return x_raw / stats.norm_const


def normalize_y(y_raw: jax.Array, stats: NormStats) -> jax.Array:
    y = y_raw
    if stats.clip_outliers:
        y = jnp.clip(y, stats.min_vel, stats.max_vel)
    if stats.y_transform == "asinh":
        y_t = jnp.arcsinh(y / stats.y_scale)
    elif stats.y_transform == "signed_log":
        y_t = jnp.sign(y) * jnp.log1p(jnp.abs(y) / stats.y_scale)
    else:
        y_t = y
    return (2.0 * (y_t - stats.trans_min)
            / (stats.trans_max - stats.trans_min) - 1.0).astype(jnp.float32)


def denormalize_y(y_norm: jax.Array, stats: NormStats) -> jax.Array:
    y_t = (y_norm + 1.0) / 2.0 * (stats.trans_max - stats.trans_min) + stats.trans_min
    if stats.y_transform == "asinh":
        return jnp.sinh(y_t) * stats.y_scale
    if stats.y_transform == "signed_log":
        return jnp.sign(y_t) * (jnp.expm1(jnp.abs(y_t)) * stats.y_scale)
    return y_t
