import functools, time
import numpy as np
import jax
from unet_convlstm_tpu.models.registry import build_model
from unet_convlstm_tpu.ops.normalize import NormStats
from unet_convlstm_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding)
from unet_convlstm_tpu.train import make_optimizer, make_train_step

B, T, H = 32, 12, 128
mesh = make_mesh(data=1)
stats = NormStats(norm_const=43.45, min_vel=-8.0, max_vel=8.0, y_scale=2.0,
                  trans_min=-2.0, trans_max=2.0)
rng = np.random.default_rng(0)
x_raw = rng.random((B, T, H, H, 2), np.float32) * 3
y_raw = rng.standard_normal((B, T, H, H, 1)).astype(np.float32)
cfg = {"type": "custom", "base_ch": 64, "use_skip_lstm": True, "lstm_layers": 1}
_, init_fn, apply_fn, _ = build_model(cfg)
af = functools.partial(apply_fn, unroll=10)
variables = jax.device_put(init_fn(jax.random.PRNGKey(0)), replicated_sharding(mesh))
tx = make_optimizer(1e-3)
state = {"params": variables["params"], "stats": variables["stats"],
         "opt_state": jax.device_put(tx.init(variables["params"]), replicated_sharding(mesh))}
step = make_train_step(af, tx, stats, use_mask=False, mesh=mesh)
xd = jax.device_put(x_raw, batch_sharding(mesh))
yd = jax.device_put(y_raw, batch_sharding(mesh))
for _ in range(2):
    state, loss, _ = step(state, xd, yd)
float(loss)
with jax.profiler.trace("/tmp/jaxtrace_cloud"):
    for _ in range(4):
        state, loss, _ = step(state, xd, yd)
    float(loss)
print("done")
