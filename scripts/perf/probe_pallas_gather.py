"""Empirically map Mosaic TPU's dynamic-gather support + throughput.

jax 0.9.0 lowers `jnp.take_along_axis(x2d, idx2d, axis=0|1)` (equal 2-D
shapes) to `tpu.dynamic_gather` (jax/_src/pallas/mosaic/lowering.py:2464).
What the docs do NOT say is which SHAPES Mosaic actually compiles:
in-native-tile only (8 sublanes / 128 lanes) or cross-tile. This probe
compiles each variant on the real TPU and times the survivors — the
feasibility data for a Pallas gather-bound MC kernel (VERDICT round-2 #7).

Variants (all: out[i,j] = x[idx[i,j], j] for axis 0, x[i, idx[i,j]] for 1):
  A  (8,   128) axis=1 — in-tile lane shuffle (the classic)
  B  (8,   128) axis=0 — in-tile sublane shuffle
  C  (512, 128) axis=0 — cross-tile sublane gather (64 native tiles)
  D  (8,  1024) axis=1 — cross-register lane gather
  E  (512, 128) axis=1 — big-block lane gather
  F  chained-block full gather: arbitrary flat index into a (512*128,)
     table via 1 block of C + lane fix-up — only if C and E both pass

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
         scripts/perf/probe_pallas_gather.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(axis, reps, x_ref, i_ref, o_ref):
    # chain reps gathers (index = value + previous index) so timing
    # measures throughput, not one shuffle
    idx = i_ref[:]
    acc = jnp.zeros_like(x_ref)
    n = x_ref.shape[axis]
    for _ in range(reps):
        v = jnp.take_along_axis(x_ref[:], idx, axis=axis)
        acc = acc + v
        idx = (idx + v.astype(jnp.int32) + 1) % n
    o_ref[:] = acc


def build(shape, axis, reps):
    return pl.pallas_call(
        functools.partial(gather_kernel, axis, reps),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def try_variant(name, shape, axis, reps=64):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, np.float32))
    idx = jnp.asarray(rng.integers(0, shape[axis], shape), jnp.int32)
    try:
        fn = jax.jit(build(shape, axis, reps))
        np.asarray(fn(x, idx))                # compile + run
        # correctness: a reps=1 chain IS one take_along_axis — compare it
        # against numpy so a wrong-element Mosaic gather reports FAIL
        out1 = np.asarray(jax.jit(build(shape, axis, 1))(x, idx))
        want0 = np.take_along_axis(np.asarray(x), np.asarray(idx), axis)
        parity = bool(np.allclose(out1, want0))
        t0 = time.perf_counter()
        np.asarray(fn(x, idx))
        dt = time.perf_counter() - t0
        per = dt / reps
        elems = shape[0] * shape[1]
        print(f"  {name}: {'OK  ' if parity else 'WRONG'} "
              f"{per*1e6:9.2f} us/gather "
              f"({elems/per/1e9:7.2f} G elem/s)  "
              f"[first-link parity ok={parity}]")
        return per if parity else None
    except Exception as e:
        msg = str(e).splitlines()[0][:110]
        print(f"  {name}: FAIL  {msg}")
        return None


def xla_baseline(n=65536, reps=64):
    """XLA's own vector gather from a (200,128,128) volume — the number a
    Pallas kernel must beat."""
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((200, 128, 128), np.float32))

    @jax.jit
    def run(gi):
        def body(_, gi):
            v = vol[gi[:, 2] % 200, gi[:, 1] % 128, gi[:, 0] % 128]
            return (gi + v[:, None].astype(jnp.int32) + 1) % 128
        return jax.lax.fori_loop(0, reps, body, gi)

    gi = jnp.asarray(rng.integers(0, 128, (n, 3)), jnp.int32)
    np.asarray(run(gi))
    t0 = time.perf_counter()
    np.asarray(run(gi))
    per = (time.perf_counter() - t0) / reps
    print(f"  XLA vol[gz,gy,gx] N={n}: {per*1e6:9.2f} us/gather "
          f"({n/per/1e9:7.2f} G elem/s)")
    return per


def main():
    print(f"devices: {jax.devices()}")
    print("XLA baseline:")
    xla_baseline()
    print("Pallas dynamic_gather variants:")
    try_variant("A (8,128)   axis=1", (8, 128), 1)
    try_variant("B (8,128)   axis=0", (8, 128), 0)
    try_variant("C (512,128) axis=0", (512, 128), 0)
    try_variant("D (8,1024)  axis=1", (8, 1024), 1)
    try_variant("E (512,128) axis=1", (512, 128), 1)


if __name__ == "__main__":
    main()
