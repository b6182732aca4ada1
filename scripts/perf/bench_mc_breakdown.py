"""Where does the MC delta-tracking iteration actually spend its time?

Isolates the three cost classes of `datagen/mc_reference._mc_radiance_impl`'s
lockstep body (the while_loop at mc_reference.py:154-226) on the live TPU:

  1. volume gathers   — vol[gz, gy, gx] with [N] vector indices (3 per iter)
  2. PRNG             — jax.random.split x4 + 3 uniforms per iter (threefry),
                        vs the 'rbg' generator (RngBitGenerator HLO)
  3. elementwise rest — flight/exit arithmetic, HG sampling trig

Each class runs K chained iterations inside ONE jitted fori_loop (data
dependency between iterations defeats CSE; one dispatch amortizes the
tunnel round-trip). Output: per-iteration ms for each class + the measured
full MC iteration for cross-checking. This drives the Pallas kernel
decision (VERDICT round-2 #7): attack the dominant class, not a guess.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python \
          scripts/perf/bench_mc_breakdown.py [N] [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536   # rays (256²)
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100     # chained iterations
NZ, NY, NX = 200, 128, 128                             # production patch


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "dtype") else a, out)
    t0 = time.perf_counter()
    out = fn(*args)
    total = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = time.perf_counter() - t0
    print(f"{name:34s} {dt / K * 1e3:8.3f} ms/iter   (total {dt:.3f} s,"
          f" checksum {total:.3e})")
    return dt / K


def main():
    print(f"devices: {jax.devices()}  N={N}  K={K}")
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((NZ, NY, NX), np.float32))
    idx0 = jnp.asarray(rng.integers(0, NX, (N, 3)), jnp.int32)

    # -- 1. chained vector gathers (index depends on previous value) -----
    @jax.jit
    def gathers(idx):
        def body(_, carry):
            gi = carry
            v = vol[jnp.clip(gi[:, 2] % NZ, 0, NZ - 1),
                    jnp.clip(gi[:, 1], 0, NY - 1),
                    jnp.clip(gi[:, 0], 0, NX - 1)]
            gi = (gi + v[:, None].astype(jnp.int32) + 1) % NX
            return gi
        return jax.lax.fori_loop(0, K, body, idx)

    # -- 2. PRNG chain — the impl difference (threefry vs rbg/HW-backed
    # RngBitGenerator HLO) is carried entirely by the key passed in, so
    # ONE body serves both legs of the comparison.
    @jax.jit
    def prng_chain(key):
        def body(_, carry):
            k, acc = carry
            k, k1, k2, k3 = jax.random.split(k, 4)
            u = (jax.random.uniform(k1, (N,)) + jax.random.uniform(k2, (N,))
                 + jax.random.uniform(k3, (N,)))
            return k, acc + u
        return jax.lax.fori_loop(0, K, body, (key, jnp.zeros(N)))[1]

    # -- 3. elementwise flight/exit/HG arithmetic (no gather, no RNG) ----
    @jax.jit
    def elementwise(pos, d):
        cell_m = 16 * 20.0
        def body(_, carry):
            pos, d = carry
            u = pos / cell_m
            ci = jnp.floor(u)
            frac = u - ci
            dist = jnp.where(d > 0, 1.0 - frac, frac) * cell_m
            t_axis = jnp.where(jnp.abs(d) < 1e-9, jnp.inf,
                               dist / jnp.abs(d))
            t_exit = jnp.min(t_axis, axis=1)
            t_flight = -jnp.log(jnp.abs(pos[:, 0]) / 4000.0 + 0.5) / 0.02
            t = jnp.where(t_flight >= t_exit, t_exit + 0.02, t_flight)
            new_pos = pos + d * t[:, None]
            # HG-like trig block (the _sample_hg cost shape)
            cos_t = (1 + 0.85**2 - ((1 - 0.85**2)
                     / (1 - 0.85 + 2 * 0.85 * frac[:, 0]))**2) / (2 * 0.85)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1 - cos_t**2))
            phi = 2 * jnp.pi * frac[:, 1]
            new_d = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                               cos_t], axis=1)
            d = jnp.where((t[:, None] > 1.0), new_d, d)
            return jnp.clip(new_pos, -4000.0, 4000.0), d
        return jax.lax.fori_loop(0, K, body, (pos, d))[0]

    # -- 1b. the SAME chained gather but with a 2-field stacked payload
    # ([...,2] trailing dim) — measures whether a second field riding the
    # same address stream is ~free (the mc_reference.py β+t_sun fusion)
    vol2 = jnp.stack([vol, vol * 0.5], axis=-1)

    @jax.jit
    def gathers_stacked(idx):
        def body(_, carry):
            gi = carry
            v2 = vol2[jnp.clip(gi[:, 2] % NZ, 0, NZ - 1),
                      jnp.clip(gi[:, 1], 0, NY - 1),
                      jnp.clip(gi[:, 0], 0, NX - 1)]
            # 1e-30 scale: keeps field 1 live in the gather (a 0.0
            # multiplier invites the algebraic simplifier to narrow the
            # payload back to one field) without changing the int cast
            v = v2[:, 0] + 1e-30 * v2[:, 1]
            gi = (gi + v[:, None].astype(jnp.int32) + 1) % NX
            return gi
        return jax.lax.fori_loop(0, K, body, idx)

    # -- 1c. padded gather: [...,2] payload but field 1 NEVER used — does
    # the algebraic simplifier narrow the gather back to the slow scalar
    # form, or does mere payload padding keep the fast lowering? Decides
    # whether the macro-grid majorant gather (single field by nature) can
    # be accelerated by padding alone.
    @jax.jit
    def gathers_padded(idx):
        def body(_, carry):
            gi = carry
            v2 = vol2[jnp.clip(gi[:, 2] % NZ, 0, NZ - 1),
                      jnp.clip(gi[:, 1], 0, NY - 1),
                      jnp.clip(gi[:, 0], 0, NX - 1)]
            v = v2[:, 0]
            gi = (gi + v[:, None].astype(jnp.int32) + 1) % NX
            return gi
        return jax.lax.fori_loop(0, K, body, idx)

    # -- 1d. small-table gather: the super-voxel macro grid (cell 16 →
    # 13x8x8 for the production patch) with the same N chained addresses —
    # how much of the dense-regime iteration does the majorant lookup cost?
    MZ, MY, MX = (NZ + 15) // 16, (NY + 15) // 16, (NX + 15) // 16
    macro = jnp.asarray(rng.random((MZ, MY, MX), np.float32))

    @jax.jit
    def gathers_macro(idx):
        def body(_, carry):
            gi = carry
            v = macro[jnp.clip(gi[:, 2] % MZ, 0, MZ - 1),
                      jnp.clip(gi[:, 1] % MY, 0, MY - 1),
                      jnp.clip(gi[:, 0] % MX, 0, MX - 1)]
            gi = (gi + v[:, None].astype(jnp.int32) + 1) % NX
            return gi
        return jax.lax.fori_loop(0, K, body, idx)

    t_gather = timeit("3D vector gather (1/iter)", gathers, idx0)
    t_gather2 = timeit("stacked 2-field gather (1/iter)", gathers_stacked,
                       idx0)
    t_gatherp = timeit("padded dead-field gather (1/iter)", gathers_padded,
                       idx0)
    t_gatherm = timeit("small-table macro gather (1/iter)", gathers_macro,
                       idx0)
    key = jax.random.PRNGKey(0)
    t_tf = timeit("threefry split+3 uniforms", prng_chain, key)
    try:
        rbg_key = jax.random.key(0, impl="rbg")
        t_rbg = timeit("rbg split+3 uniforms", prng_chain, rbg_key)
    except Exception as e:  # rbg unavailable on some backends
        print(f"rbg PRNG unavailable: {e}")
        t_rbg = float("nan")
    pos = jnp.asarray(rng.random((N, 3), np.float32) * 2000.0)
    d = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    t_elem = timeit("elementwise flight+exit+HG", elementwise, pos, d)

    print("\nper-iteration model (3 gathers + RNG + elementwise):")
    print(f"  gathers   3 x {t_gather*1e3:7.3f} = {3*t_gather*1e3:8.3f} ms")
    print(f"  stacked 2-field gather {t_gather2*1e3:8.3f} ms "
          f"(vs 2 x {t_gather*1e3:7.3f} = {2*t_gather*1e3:7.3f} separate)")
    print(f"  padded dead-field      {t_gatherp*1e3:8.3f} ms; "
          f"macro small-table {t_gatherm*1e3:8.3f} ms")
    print(f"  threefry      {t_tf*1e3:8.3f} ms   (rbg: {t_rbg*1e3:8.3f} ms)")
    print(f"  elementwise   {t_elem*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
