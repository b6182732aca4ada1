"""TPU probe: fused_conv3x3 vs unfused XLA conv+BN chain.

Measures forward and fwd+bwd wall time at the bench L0 geometry
([640,64,64,32] bf16) and checks numerical parity compiled (not interpret).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from unet_convlstm_tpu.ops.conv import conv2d, conv2d_init
from unet_convlstm_tpu.ops.pallas.doubleconv_fused import fused_conv3x3

print("backend:", jax.default_backend())

N, H, W, CIN, COUT = 640, 64, 64, 32, 32
key = jax.random.PRNGKey(0)
kx, kw, ki, ks, kg = jax.random.split(key, 5)
x = jax.random.normal(kx, (N, H, W, CIN), jnp.float32).astype(jnp.bfloat16)
p = conv2d_init(kw, CIN, COUT, 3)
inv = jax.random.uniform(ki, (CIN,), jnp.float32, 0.5, 1.5)
shift = jax.random.normal(ks, (CIN,)) * 0.1
gy = jax.random.normal(kg, (N, H, W, COUT), jnp.float32).astype(jnp.bfloat16)


def ref_chain(x, w, b, inv, shift):
    z = jax.nn.relu(x * inv.astype(x.dtype) + shift.astype(x.dtype))
    y = conv2d({"w": w, "b": b}, z)
    s = jnp.sum(y, axis=(0, 1, 2), dtype=jnp.float32)
    q = jnp.sum(y.astype(jnp.float32) ** 2, axis=(0, 1, 2))
    return y, s, q


def timeit(name, f, *a, iters=30):
    g = jax.jit(f)
    out = g(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:38s} {dt:8.3f} ms")
    return out


o_ref = timeit("XLA chain fwd", ref_chain, x, p["w"], p["b"], inv, shift)
o_fus = timeit("fused fwd", lambda *a: fused_conv3x3(
    a[0], a[1], a[2], pre_inv=a[3], pre_shift=a[4]),
    x, p["w"], p["b"], inv, shift)

for a, b, nm, tol in [(o_ref[0], o_fus[0], "y", 3e-2),
                      (o_ref[1], o_fus[1], "sum", 1e-2),
                      (o_ref[2], o_fus[2], "sumsq", 1e-2)]:
    aa = np.asarray(a, np.float32); bb = np.asarray(b, np.float32)
    rel = np.max(np.abs(aa - bb)) / (np.max(np.abs(aa)) + 1e-9)
    print(f"parity {nm}: max-rel {rel:.2e}")
    assert rel < tol, nm


def loss_ref(x, w, b, inv, shift):
    y, s, q = ref_chain(x, w, b, inv, shift)
    return (jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))
            + 1e-3 * jnp.sum(s) + 1e-4 * jnp.sum(q))


def loss_fus(x, w, b, inv, shift):
    y, s, q = fused_conv3x3(x, w, b, pre_inv=inv, pre_shift=shift)
    return (jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))
            + 1e-3 * jnp.sum(s) + 1e-4 * jnp.sum(q))


gref = timeit("XLA chain fwd+bwd", jax.grad(loss_ref, (0, 1, 2, 3, 4)),
              x, p["w"], p["b"], inv, shift)
gfus = timeit("fused fwd+bwd", jax.grad(loss_fus, (0, 1, 2, 3, 4)),
              x, p["w"], p["b"], inv, shift)
for a, b, nm in zip(gref, gfus, ["dx", "dw", "db", "dinv", "dshift"]):
    aa = np.asarray(a, np.float32); bb = np.asarray(b, np.float32)
    rel = np.max(np.abs(aa - bb)) / (np.max(np.abs(aa)) + 1e-9)
    print(f"grad parity {nm}: max-rel {rel:.2e}")
