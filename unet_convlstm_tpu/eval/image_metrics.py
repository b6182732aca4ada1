"""Image quality metrics: PSNR and SSIM (pure jnp, jit-friendly).

The driver's rollout-parity criterion is PSNR/SSIM on Moving-MNIST
(BASELINE.json "north_star"); the reference itself reports only MAE/RMSE/ME,
so these extend the evaluation surface. SSIM follows the standard
Wang et al. formulation: 7x7 uniform window, C1=(0.01·L)², C2=(0.03·L)².
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def psnr(pred: jax.Array, target: jax.Array,
         data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio in dB over the full array."""
    mse = jnp.mean((pred.astype(jnp.float32)
                    - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jax.Array, size: int) -> jax.Array:
    """Mean filter over H, W of an NHWC array (VALID)."""
    n = x.shape[-1]
    # depthwise: feature_group_count = channels
    k = jnp.broadcast_to(
        jnp.ones((size, size, 1, 1), x.dtype) / (size * size),
        (size, size, 1, n))
    return lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n)


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
         window: int = 7) -> jax.Array:
    """Mean SSIM. pred/target: [..., H, W] or NHWC; computed in f32."""
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    if x.ndim == 2:
        x = x[None, :, :, None]
        y = y[None, :, :, None]
    elif x.ndim == 3:  # [N, H, W]
        x = x[..., None]
        y = y[..., None]
    elif x.ndim > 4:   # flatten leading dims into batch
        x = x.reshape((-1,) + x.shape[-3:])
        y = y.reshape((-1,) + y.shape[-3:])

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_x = _uniform_filter(x, window)
    mu_y = _uniform_filter(y, window)
    mu_xx = _uniform_filter(x * x, window)
    mu_yy = _uniform_filter(y * y, window)
    mu_xy = _uniform_filter(x * y, window)
    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * cov + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)
    return jnp.mean(num / den)
