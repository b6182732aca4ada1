"""Component-level timing of the bench train step (B=64,T=10,H=64,bc=32)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp

from unet_convlstm_tpu.models.registry import build_model
from unet_convlstm_tpu.models.temporal_unet import (
    TemporalUNetConfig, _encode, _decode, _to_time_major, _to_batch_major)
from unet_convlstm_tpu.ops.convlstm import convlstm
from unet_convlstm_tpu.ops.blocks import double_conv
from unet_convlstm_tpu.core.dtypes import DEFAULT_POLICY
from unet_convlstm_tpu.data.moving_mnist import (
    generate_moving_mnist, moving_mnist_to_xy, synthetic_digit_bank)
from unet_convlstm_tpu.ops.normalize import compute_norm_stats
from unet_convlstm_tpu.train import make_optimizer, make_train_step
from unet_convlstm_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding

B, T, H = 64, 10, 64
POL = DEFAULT_POLICY

cfg = TemporalUNetConfig(base_ch=32, use_skip_lstm=True)
cfg_dict = {"type": "custom", "base_ch": 32, "use_skip_lstm": True,
            "use_attention": False, "lstm_layers": 1}
_, init_fn, apply_fn, _ = build_model(cfg_dict)
apply_fn = functools.partial(apply_fn, unroll=10)
variables = init_fn(jax.random.PRNGKey(0))
params, stats = variables["params"], variables["stats"]

data = generate_moving_mnist(seq_len=T, num_samples=B, image_size=H,
                             num_digits=2, digits=synthetic_digit_bank(), seed=0)
X, Y = moving_mnist_to_xy(data)
nstats = compute_norm_stats(X, Y)
x_raw = jnp.asarray(np.ascontiguousarray(np.moveaxis(X, 2, -1)))
y_raw = jnp.asarray(np.ascontiguousarray(np.moveaxis(Y, 2, -1)))
x_norm = (x_raw / nstats.norm_const).astype(jnp.float32)

def timeit(name, fn, *args, iters=20, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    # drain queue (axon backend)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[...]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[...]
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:45s} {dt:8.2f} ms")
    return dt

x_bt = x_norm.reshape(B * T, H, H, 2)

# --- forward only (train mode) ---
def fwd(params, stats, x):
    y, _, ns = apply_fn({"params": params, "stats": stats}, x, train=True)
    return y, ns
timeit("fwd full model (train)", fwd, params, stats, x_norm)

# --- forward+backward, no optimizer ---
def fwdbwd(params, stats, x):
    def lf(p):
        y, _, ns = apply_fn({"params": p, "stats": stats}, x, train=True)
        return jnp.mean(jnp.abs(y.astype(jnp.float32))), ns
    (l, ns), g = jax.value_and_grad(lf, has_aux=True)(params)
    return l, g
timeit("fwd+bwd full model", fwdbwd, params, stats, x_norm)

# --- encoder fwd / fwd+bwd ---
def enc(params, stats, xbt):
    xb, skips, ns = _encode(params, stats, xbt, cfg, True, POL)
    return xb, skips
timeit("encoder fwd (B*T=640)", enc, params, stats, x_bt)

def encbwd(params, stats, xbt):
    def lf(p):
        xb, skips, _ = _encode(p, stats, xbt, cfg, True, POL)
        return (jnp.mean(jnp.abs(xb.astype(jnp.float32)))
                + sum(jnp.mean(jnp.abs(s.astype(jnp.float32))) for s in skips))
    return jax.value_and_grad(lf)(params)
timeit("encoder fwd+bwd", encbwd, params, stats, x_bt)

# --- lstm segment ---
xb, skips, _ = jax.jit(lambda p, s, x: _encode(p, s, x, cfg, True, POL))(params, stats, x_bt)
xb_tm = _to_time_major(xb, B, T)
x3_tm = _to_time_major(skips[0], B, T)
x2_tm = _to_time_major(skips[1], B, T)

def lstms(params, xb_tm, x3_tm, x2_tm):
    a, _ = convlstm(params["temporal"], xb_tm, policy=POL, unroll=10)
    b, _ = convlstm(params["skip3"], x3_tm, policy=POL, unroll=10)
    c, _ = convlstm(params["skip2"], x2_tm, policy=POL, unroll=10)
    return a, b, c
timeit("3 ConvLSTMs fwd", lstms, params, xb_tm, x3_tm, x2_tm)

def lstms_bwd(params, xb_tm, x3_tm, x2_tm):
    def lf(p):
        a, b, c = lstms(p, xb_tm, x3_tm, x2_tm)
        return (jnp.mean(jnp.abs(a.astype(jnp.float32)))
                + jnp.mean(jnp.abs(b.astype(jnp.float32)))
                + jnp.mean(jnp.abs(c.astype(jnp.float32))))
    return jax.value_and_grad(lf)(params)
timeit("3 ConvLSTMs fwd+bwd", lstms_bwd, params, xb_tm, x3_tm, x2_tm)

# --- decoder ---
xb_bt = _to_batch_major(xb_tm, B, T)
def dec(params, stats, xb_bt, skips):
    y, ns = _decode(params, stats, xb_bt, skips, cfg, True, POL)
    return y
timeit("decoder fwd", dec, params, stats, xb_bt, skips)

def dec_bwd(params, stats, xb_bt, skips):
    def lf(p):
        y, _ = _decode(p, stats, xb_bt, skips, cfg, True, POL)
        return jnp.mean(jnp.abs(y.astype(jnp.float32)))
    return jax.value_and_grad(lf)(params)
timeit("decoder fwd+bwd", dec_bwd, params, stats, xb_bt, skips)

# --- single double_conv at level 0 (640,64,64,32->32): train vs eval BN ---
dc_p, dc_s = params["inc"], stats["inc"]
x32 = jnp.zeros((B*T, H, H, 2), jnp.float32) + x_bt
def dc_train(p, s, x):
    return double_conv(p, s, x, True, POL)[0]
def dc_eval(p, s, x):
    return double_conv(p, s, x, False, POL)[0]
timeit("inc DoubleConv train-BN", dc_train, dc_p, dc_s, x32)
timeit("inc DoubleConv eval-BN", dc_eval, dc_p, dc_s, x32)

# --- full train step ---
mesh = make_mesh(data=1)
tx = make_optimizer(1e-3)
state = {"params": params, "stats": stats, "opt_state": tx.init(params)}
step = make_train_step(apply_fn, tx, nstats, use_mask=False, mesh=mesh)
xd = jax.device_put(np.asarray(x_raw), batch_sharding(mesh))
yd = jax.device_put(np.asarray(y_raw), batch_sharding(mesh))
st = jax.device_put(state, replicated_sharding(mesh))
for _ in range(3):
    st, loss, _ = step(st, xd, yd)
float(loss)
t0 = time.perf_counter()
for _ in range(20):
    st, loss, _ = step(st, xd, yd)
float(loss)
print(f"{'FULL train step':45s} {(time.perf_counter()-t0)/20*1e3:8.2f} ms")

