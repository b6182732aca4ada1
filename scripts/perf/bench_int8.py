"""Measure int8 PTQ inference throughput vs bf16 at production geometry.

Workload: production forward passes at the reference's cloud shapes
(128^2, T=12 — main.py:215) for BOTH model families:

* custom (TemporalUNetDualView base_ch 64) — FLOP-bound at 65% MXU
  (docs/PERF.md), so the v5e's 2x int8 MXU rate bounds the ideal
  quantized speedup at <2x (the bandwidth-bound BN/elementwise share does
  not shrink). Measured r2: 1.31x.
* resnet18 (PretrainedTemporalUNet — the reference driver's default,
  main.py:213) — HBM-bound at ~95% of the bandwidth roofline
  (docs/PERF.md), the regime where int8's byte halving on weights should
  pay MORE than the MXU-rate bound suggests. This is the family's named
  perf lever (VERDICT r3 #3).

Run (serialize with other TPU work):
    python scripts/perf/bench_int8.py [custom|resnet18|both]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from unet_convlstm_tpu.models.registry import build_model
from unet_convlstm_tpu.ops.quant import calibrate_tree, quantize_tree

B, T, HW = 8, 12, 128
STEPS = 20

FAMILIES = {
    "custom": {"type": "custom", "base_ch": 64, "use_skip_lstm": True,
               "lstm_layers": 1},
    "resnet18": {"type": "resnet18", "freeze_encoder": False},
}


def measure(apply_fn, variables, label):
    @jax.jit
    def fwd(v, x):
        y, _, _ = apply_fn(v, x, train=False)
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
    print(f"{label:>16}: {dt * 1e3:7.1f} ms/fwd  {fps:8.1f} frames/s",
          flush=True)
    return fps


def run_family(name):
    cfg = FAMILIES[name]
    _, init_fn, apply_fn, _ = build_model(dict(cfg))
    variables = init_fn(jax.random.PRNGKey(0))
    f_bf16 = measure(apply_fn, variables, f"{name} bf16")
    qvars = quantize_tree(variables)
    f_int8 = measure(apply_fn, qvars, f"{name} int8")
    # calibrated static activation scales (VERDICT r4 #2): the dynamic
    # amax passes disappear; conv inputs hit HBM at int8 width.
    # Calibration runs on the CPU backend (axon lacks io_callback), so
    # use a reduced geometry — per-site amax depends on the input
    # DISTRIBUTION (same uniform[0,1] raw range), not the spatial size
    t_c = time.time()
    rng = np.random.default_rng(1)
    calib = [rng.uniform(0, 1, (2, 4, 64, 64, 2)).astype(np.float32)
             for _ in range(2)]
    qcal = calibrate_tree(apply_fn, qvars, calib)
    print(f"{name}: calibrated in {time.time() - t_c:.1f}s", flush=True)
    f_cal = measure(apply_fn, qcal, f"{name} int8-calib")
    print(f"{name}: int8 / bf16 = {f_int8 / f_bf16:.2f}x   "
          f"int8-calib / bf16 = {f_cal / f_bf16:.2f}x", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    for name in (FAMILIES if which == "both" else [which]):
        run_family(name)


if __name__ == "__main__":
    main()
