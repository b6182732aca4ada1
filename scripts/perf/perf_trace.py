"""Capture a jax.profiler trace of the bench train step."""
import functools, time, sys
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
mesh = make_mesh(data=1)
data = generate_moving_mnist(seq_len=T, num_samples=B, image_size=H,
                             num_digits=2, digits=synthetic_digit_bank(), seed=0)
X, Y = moving_mnist_to_xy(data)
stats = compute_norm_stats(X, Y)
x_raw = np.ascontiguousarray(np.moveaxis(X, 2, -1))
y_raw = np.ascontiguousarray(np.moveaxis(Y, 2, -1))

cfg_dict = {"type": "custom", "base_ch": 32, "use_skip_lstm": True,
            "use_attention": False, "lstm_layers": 1}
_, init_fn, apply_fn, _ = build_model(cfg_dict)
apply_fn = functools.partial(apply_fn, unroll=10)
variables = init_fn(jax.random.PRNGKey(0))
variables = jax.device_put(variables, replicated_sharding(mesh))
tx = make_optimizer(1e-3)
state = {"params": variables["params"], "stats": variables["stats"],
         "opt_state": jax.device_put(tx.init(variables["params"]),
                                     replicated_sharding(mesh))}
step = make_train_step(apply_fn, tx, stats, use_mask=False, mesh=mesh)
xd = jax.device_put(x_raw, batch_sharding(mesh))
yd = jax.device_put(y_raw, batch_sharding(mesh))
for _ in range(3):
    state, loss, _ = step(state, xd, yd)
float(loss)

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
with jax.profiler.trace(outdir):
    for _ in range(10):
        state, loss, _ = step(state, xd, yd)
    float(loss)
print("trace done ->", outdir)
