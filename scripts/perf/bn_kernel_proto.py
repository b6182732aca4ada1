"""Prototype: Pallas per-channel sum/sumsq reduction vs XLA jnp.mean.

Shapes: the bench model's level-0 activation [640,64,64,32] bf16.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, W, C = 640, 64, 64, 32
LANES = 128
GROUP = LANES // C          # channel-groups per 128-lane row
ROWS_PER_TILE = 1024

x = jax.device_put(
    (np.random.default_rng(0).standard_normal((N, H, W, C)) * 0.5)
    .astype(jnp.bfloat16))


def timeit(name, f, *a, iters=50):
    g = jax.jit(f)
    out = g(*a)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*a)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    gbps = (N * H * W * C * 2) / (dt / 1e3) / 1e9
    print(f"{name:34s} {dt:7.3f} ms   {gbps:6.0f} GB/s")
    return out


# --- XLA reference ---
def xla_stats(x):
    mean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
    meansq = jnp.mean(jax.lax.square(x), axis=(0, 1, 2), dtype=jnp.float32)
    return mean, meansq


# --- Pallas: view as [R, 128], accumulate f32[8,128] in scratch ---
def _sum_kernel(x_ref, sum_ref, sq_ref, acc_s, acc_q):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)
        acc_q[:] = jnp.zeros_like(acc_q)

    v = x_ref[:].astype(jnp.float32)
    acc_s[:] += jnp.sum(v, axis=0, keepdims=True)
    acc_q[:] += jnp.sum(v * v, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        sum_ref[:] = acc_s[:]
        sq_ref[:] = acc_q[:]


def pallas_stats(x):
    total = x.size
    R = total // LANES
    x2 = x.reshape(R, LANES)
    grid = (R // ROWS_PER_TILE,)
    s, q = pl.pallas_call(
        _sum_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((ROWS_PER_TILE, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((1, LANES), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32),
                        pltpu.VMEM((1, LANES), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(x2)
    n = total // C
    mean = s.reshape(GROUP, C).sum(0) / n
    meansq = q.reshape(GROUP, C).sum(0) / n
    return mean, meansq


m1 = timeit("xla mean+meansq", xla_stats, x)
m2 = timeit("pallas sum+sumsq", pallas_stats, x)
np.testing.assert_allclose(np.asarray(m1[0], np.float32),
                           np.asarray(m2[0], np.float32), rtol=2e-3, atol=2e-3)
np.testing.assert_allclose(np.asarray(m1[1], np.float32),
                           np.asarray(m2[1], np.float32), rtol=2e-3, atol=2e-3)
print("parity OK")

# pure read roofline probe: sum everything to one scalar
timeit("xla full-sum (roofline probe)", lambda x: jnp.sum(x, dtype=jnp.float32), x)
