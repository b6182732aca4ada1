"""Measure the production cloud-config step (base_ch 64, 128^2, T=12, B=32)
and a B=128 mnist variant."""
import functools, time
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


def measure(tag, cfg_dict, B, T, H, iters=10):
    rng = np.random.default_rng(0)
    x_raw = rng.random((B, T, H, H, 2), np.float32) * 3
    y_raw = rng.standard_normal((B, T, H, H,
                                 cfg_dict.get("out_channels", 1))
                                ).astype(np.float32)
    _, init_fn, apply_fn, _ = build_model(cfg_dict)
    af = functools.partial(apply_fn, unroll=min(T, 10))
    variables = init_fn(jax.random.PRNGKey(0))
    variables = jax.device_put(variables, replicated_sharding(mesh))
    tx = make_optimizer(1e-3)
    state = {"params": variables["params"], "stats": variables["stats"],
             "opt_state": jax.device_put(tx.init(variables["params"]),
                                         replicated_sharding(mesh))}
    step = make_train_step(af, tx, stats, use_mask=False, mesh=mesh)
    xd = jax.device_put(x_raw, batch_sharding(mesh))
    yd = jax.device_put(y_raw, batch_sharding(mesh))
    for _ in range(3):
        state, loss, _ = step(state, xd, yd)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, xd, yd)
    assert np.isfinite(float(loss))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:36s} {dt*1e3:8.2f} ms/step  {B*T/dt:9.0f} frames/s",
          flush=True)


measure("cloud base_ch64 128^2 T12 B32",
        {"type": "custom", "base_ch": 64, "use_skip_lstm": True,
         "lstm_layers": 1}, B=32, T=12, H=128)
measure("mnist base_ch32 64^2 T10 B128",
        {"type": "custom", "base_ch": 32, "use_skip_lstm": True,
         "lstm_layers": 1}, B=128, T=10, H=64, iters=20)
