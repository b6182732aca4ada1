"""XLA cost analysis + knob sweep for the PRODUCTION cloud config
(base_ch 64, 128^2, T=12) — determines whether the step is FLOP- or
HBM-bound at this width and measures the available knobs (batch size,
unroll, remat). v5e roofline: ~197 TFLOPS bf16, ~819 GB/s HBM."""
import functools
import sys
import time

import numpy as np
import jax

from unet_convlstm_tpu.models.registry import build_model
from unet_convlstm_tpu.ops.normalize import NormStats
from unet_convlstm_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding)
from unet_convlstm_tpu.train import make_optimizer, make_train_step

mesh = make_mesh(data=1)
stats = NormStats(norm_const=43.45, min_vel=-8.0, max_vel=8.0, y_scale=2.0,
                  trans_min=-2.0, trans_max=2.0)
H, T = 128, 12
CFG = {"type": "custom", "base_ch": 64, "use_skip_lstm": True,
       "lstm_layers": 1}


def build(B, unroll, remat=False, cost_only=False, base_ch=64,
          model_cfg=None, accum_steps=1):
    rng = np.random.default_rng(0)
    x_raw = rng.random((B, T, H, H, 2), np.float32) * 3
    y_raw = rng.standard_normal((B, T, H, H, 1)).astype(np.float32)
    _, init_fn, apply_fn, _ = build_model(
        model_cfg if model_cfg is not None else dict(CFG, base_ch=base_ch))
    af = functools.partial(apply_fn, unroll=unroll, remat=remat)
    variables = init_fn(jax.random.PRNGKey(0))
    variables = jax.device_put(variables, replicated_sharding(mesh))
    tx = make_optimizer(1e-3)
    state = {"params": variables["params"], "stats": variables["stats"],
             "opt_state": jax.device_put(tx.init(variables["params"]),
                                         replicated_sharding(mesh))}
    step = make_train_step(af, tx, stats, use_mask=False, mesh=mesh,
                           donate=not cost_only, accum_steps=accum_steps)
    xd = jax.device_put(x_raw, batch_sharding(mesh))
    yd = jax.device_put(y_raw, batch_sharding(mesh))
    return step, state, xd, yd


def cost(B=32, unroll=10):
    step, state, xd, yd = build(B, unroll, cost_only=True)
    compiled = step.lower(state, xd, yd).compile()
    ca = compiled.cost_analysis()
    fl = ca.get("flops", 0.0)
    by = ca.get("bytes accessed", 0.0)
    print(f"B={B}: {fl/1e12:.2f} TFLOP/step, {by/1e9:.1f} GB/step")
    print(f"  FLOP floor @197T: {fl/197e12*1e3:.1f} ms; "
          f"HBM floor @819G/s: {by/819e9*1e3:.1f} ms; "
          f"arith intensity {fl/by:.0f} FLOP/B (ridge ~241)")


def measure(tag, B, unroll, remat=False, iters=8, base_ch=64,
            model_cfg=None, accum_steps=1):
    step, state, xd, yd = build(B, unroll, remat, base_ch=base_ch,
                                model_cfg=model_cfg,
                                accum_steps=accum_steps)
    for _ in range(3):
        state, loss, _ = step(state, xd, yd)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, xd, yd)
    assert np.isfinite(float(loss))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:34s} {dt*1e3:8.2f} ms/step  {B*T/dt:9.0f} frames/s",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cost"
    if which == "cost":
        cost(32, 10)
    elif which == "sweep":
        for tag, B, unroll, remat in [
            ("B=32 unroll=10 (prod baseline)", 32, 10, False),
            ("B=32 unroll=12 (full)", 32, 12, False),
            ("B=32 unroll=1", 32, 1, False),
            ("B=16 unroll=12", 16, 12, False),
            ("B=64 unroll=12", 64, 12, False),
            ("B=32 unroll=12 remat", 32, 12, True),
            ("B=64 unroll=12 remat", 64, 12, True),
            ("B=96 unroll=12 remat", 96, 12, True),
        ]:
            try:
                measure(tag, B, unroll, remat)
            except Exception as e:
                print(f"{tag}: FAILED {type(e).__name__}: {e}",
                      flush=True)
    elif which == "accum":
        # gradient accumulation: effective batch B at the HBM footprint
        # of B/K — the THIRD answer to the B=64 question (resident B=64
        # OOMs at 16.6 G; remat fits-but-loses at 678 f/s). If B=64/K=2
        # beats 875 f/s the optimizer/weight-read amortization is real;
        # if it matches, accumulation is free effective-batch headroom.
        # Both families (VERDICT r3 #1): custom vs the 875 f/s B=32 knee,
        # resnet18 vs its 2274 f/s B=32 baseline.
        RCFG = {"type": "resnet18", "freeze_encoder": False}
        for tag, B, K, mc in [
            ("custom B=32 accum=1 (baseline)", 32, 1, None),
            ("custom B=64 accum=2", 64, 2, None),
            ("custom B=128 accum=4", 128, 4, None),
            ("resnet18 B=32 accum=1 (baseline)", 32, 1, RCFG),
            ("resnet18 B=64 accum=2", 64, 2, RCFG),
            ("resnet18 B=128 accum=4", 128, 4, RCFG),
        ]:
            try:
                measure(tag, B, 12, accum_steps=K, model_cfg=mc)
            except Exception as e:
                print(f"{tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    elif which == "accum_tail":
        # does the resnet accum curve keep rising past K=4? (2267 ->
        # 2338 -> 2359 measured; one more doubling finds the plateau)
        RCFG = {"type": "resnet18", "freeze_encoder": False}
        for tag, B, K, mc in [
            ("resnet18 B=256 accum=8", 256, 8, RCFG),
            ("custom B=256 accum=8", 256, 8, None),
        ]:
            try:
                measure(tag, B, 12, accum_steps=K, model_cfg=mc)
            except Exception as e:
                print(f"{tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    elif which == "resnet":
        # the reference DRIVER's default family (main.py:213
        # USE_PRETRAINED=True → PretrainedTemporalUNet, resnet18.py:19)
        # at production geometry (128², T=12). Encoder trained — the
        # frozen-ImageNet config needs a .pth; fwd+bwd cost is the same
        # (frozen only masks the optimizer update for encoder params).
        RCFG = {"type": "resnet18", "freeze_encoder": False}
        for tag, B, unroll, remat in [
            ("resnet18 B=8  unroll=12", 8, 12, False),
            ("resnet18 B=16 unroll=12", 16, 12, False),
            ("resnet18 B=32 unroll=12", 32, 12, False),
            ("resnet18 B=32 unroll=12 remat", 32, 12, True),
            ("resnet18 B=64 unroll=12", 64, 12, False),
        ]:
            try:
                step, state, xd, yd = build(B, unroll, remat,
                                            cost_only=True, model_cfg=RCFG)
                ca = step.lower(state, xd, yd).compile().cost_analysis()
                fl, by = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
                del step, state, xd, yd
                measure(tag, B, unroll, remat, model_cfg=RCFG)
                print(f"  {fl/1e12:.1f} TFLOP/step, {by/1e9:.0f} GB/step, "
                      f"FLOP floor {fl/197e12*1e3:.0f} ms", flush=True)
            except Exception as e:
                print(f"{tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    elif which == "width":
        # model-width scaling on one chip: the reference tops out at
        # base_ch 64 (unet.py:135); wider models are progressively more
        # FLOP-bound (channels ≥ MXU lane width) — measure where the
        # single-chip envelope lands, with remat/batch trimmed to fit HBM
        for tag, bc, B, unroll, remat in [
            ("base_ch 64  B=32 (prod)", 64, 32, 12, False),
            ("base_ch 96  B=16", 96, 16, 12, False),
            ("base_ch 96  B=16 remat", 96, 16, 12, True),
            ("base_ch 128 B=8", 128, 8, 12, False),
            ("base_ch 128 B=8 remat", 128, 8, 12, True),
            ("base_ch 128 B=16 remat", 128, 16, 12, True),
        ]:
            try:
                step, state, xd, yd = build(B, unroll, remat,
                                            cost_only=True, base_ch=bc)
                ca = step.lower(state, xd, yd).compile().cost_analysis()
                fl, by = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
                del step, state, xd, yd
                measure(tag, B, unroll, remat, base_ch=bc)
                print(f"  {fl/1e12:.1f} TFLOP/step, {by/1e9:.0f} GB/step, "
                      f"FLOP floor {fl/197e12*1e3:.0f} ms", flush=True)
            except Exception as e:
                print(f"{tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
