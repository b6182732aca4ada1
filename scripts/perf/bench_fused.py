"""A/B: bench training step with and without the fused DoubleConv kernel."""
import functools
import time

import numpy as np
import jax

from unet_convlstm_tpu.data.moving_mnist import (
    generate_moving_mnist, moving_mnist_to_xy, synthetic_digit_bank)
from unet_convlstm_tpu.models.registry import build_model
from unet_convlstm_tpu.ops.normalize import compute_norm_stats
from unet_convlstm_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding)
from unet_convlstm_tpu.train import make_optimizer, make_train_step

B, T, H = 64, 10, 64
WARMUP, ITERS = 3, 20

mesh = make_mesh(data=len(jax.devices()))
data = generate_moving_mnist(seq_len=T, num_samples=B, image_size=H,
                             num_digits=2, digits=synthetic_digit_bank(),
                             seed=0)
X, Y = moving_mnist_to_xy(data)
stats = compute_norm_stats(X, Y)
x_raw = np.ascontiguousarray(np.moveaxis(X, 2, -1))
y_raw = np.ascontiguousarray(np.moveaxis(Y, 2, -1))

cfg_dict = {"type": "custom", "base_ch": 32, "use_skip_lstm": True,
            "use_attention": False, "lstm_layers": 1}
_, init_fn, apply_base, _ = build_model(cfg_dict)
variables0 = init_fn(jax.random.PRNGKey(0))
tx = make_optimizer(1e-3)
shard = batch_sharding(mesh)
x_dev = jax.device_put(x_raw, shard)
y_dev = jax.device_put(y_raw, shard)


def measure(name, **kw):
    apply_fn = functools.partial(apply_base, unroll=T, **kw)
    variables = jax.device_put(
        jax.tree_util.tree_map(lambda a: a.copy(), variables0),
        replicated_sharding(mesh))
    state = {"params": variables["params"], "stats": variables["stats"],
             "opt_state": jax.device_put(tx.init(variables["params"]),
                                         replicated_sharding(mesh))}
    step = make_train_step(apply_fn, tx, stats, use_mask=False, mesh=mesh)
    for _ in range(WARMUP):
        state, loss, _ = step(state, x_dev, y_dev)
    l0 = float(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss, _ = step(state, x_dev, y_dev)
    lN = float(loss)
    dt = time.perf_counter() - t0
    fps = B * T * ITERS / dt
    print(f"{name:28s} {dt / ITERS * 1e3:7.2f} ms/step  {fps:9.1f} f/s  "
          f"loss {l0:.4f}->{lN:.4f}")
    return fps


f_base = measure("baseline")
f_fused = measure("fused doubleconv", use_fused_doubleconv=True)
print(f"speedup: {f_fused / f_base:.3f}x")
