"""Measure int8 PTQ inference throughput vs bf16 at production geometry.

Workload: the reference's production forward pass (TemporalUNetDualView
base_ch 64, 128^2, T=12 — main.py:215 shapes), inference mode, steady
state. The training-side roofline says this config is FLOP-bound at 65%
MXU (docs/PERF.md), so the v5e's 2x int8 MXU rate bounds the ideal
quantized speedup at <2x (the bandwidth-bound BN/elementwise share does
not shrink).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/bench_int8.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from unet_convlstm_tpu.models.temporal_unet import (TemporalUNetConfig,
                                                    temporal_unet_apply,
                                                    temporal_unet_init)
from unet_convlstm_tpu.ops.quant import quantize_tree

B, T, HW = 8, 12, 128
STEPS = 20


def measure(variables, cfg, label):
    @jax.jit
    def fwd(v, x):
        y, _, _ = temporal_unet_apply(v, x, cfg, train=False)
        return y

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (B, T, HW, HW, 2)).astype(np.float32))
    # warm + compile (value fetch syncs the axon queue)
    float(fwd(variables, x).sum())
    t0 = time.time()
    for _ in range(STEPS):
        y = fwd(variables, x)
    float(y.sum())
    dt = (time.time() - t0) / STEPS
    fps = B * T / dt
    print(f"{label:>6}: {dt * 1e3:7.1f} ms/fwd  {fps:8.1f} frames/s")
    return fps


def main():
    cfg = TemporalUNetConfig(base_ch=64, use_skip_lstm=True)
    variables = temporal_unet_init(jax.random.PRNGKey(0), cfg)
    f_bf16 = measure(variables, cfg, "bf16")
    f_int8 = measure(quantize_tree(variables), cfg, "int8")
    print(f"int8 / bf16 = {f_int8 / f_bf16:.2f}x")


if __name__ == "__main__":
    main()
