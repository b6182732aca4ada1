"""On-device metric reduction.

The reference accumulates every valid pixel's denormalized error into Python
lists on host, every batch (main.py:113-133 — a device→host sync per step and
O(pixels) host memory). Here the per-batch reduction runs on device inside
the jitted step and only four scalars per batch cross to host at epoch end:

    count, |err| sum, err² sum, err sum  →  MAE, RMSE, ME (bias), err std

in denormalized physical units (m/s), identical math to the reference's
np.mean/np.sqrt aggregation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class MetricSums(NamedTuple):
    count: jax.Array     # f32 scalar
    abs_sum: jax.Array
    sq_sum: jax.Array
    err_sum: jax.Array


def metric_sums_init() -> MetricSums:
    z = jnp.zeros((), jnp.float32)
    return MetricSums(z, z, z, z)


def metric_sums_update(acc: MetricSums, pred_denorm: jax.Array,
                       y_denorm: jax.Array,
                       mask: Optional[jax.Array] = None,
                       use_mask: bool = True) -> MetricSums:
    """Accumulate denormalized errors (masked to valid pixels when masking
    is on — reference main.py:119-133)."""
    diff = (pred_denorm - y_denorm).astype(jnp.float32)
    if use_mask and mask is not None:
        m = jnp.broadcast_to(mask.astype(jnp.float32), diff.shape)
        count = jnp.sum(m)
        abs_sum = jnp.sum(jnp.abs(diff) * m)
        sq_sum = jnp.sum(diff * diff * m)
        err_sum = jnp.sum(diff * m)
    else:
        count = jnp.float32(diff.size)
        abs_sum = jnp.sum(jnp.abs(diff))
        sq_sum = jnp.sum(diff * diff)
        err_sum = jnp.sum(diff)
    return MetricSums(acc.count + count, acc.abs_sum + abs_sum,
                      acc.sq_sum + sq_sum, acc.err_sum + err_sum)


def metric_sums_finalize(acc: MetricSums) -> dict:
    """→ {'mae', 'rmse', 'me', 'err_std'} floats (0.0 when count==0, matching
    reference main.py:139-143)."""
    count = float(acc.count)
    if count == 0:
        return {"mae": 0.0, "rmse": 0.0, "me": 0.0, "err_std": 0.0}
    mae = float(acc.abs_sum) / count
    mse = float(acc.sq_sum) / count
    me = float(acc.err_sum) / count
    var = max(mse - me * me, 0.0)
    return {"mae": mae, "rmse": mse ** 0.5, "me": me, "err_std": var ** 0.5}
