"""Pallas TPU kernel: fused per-iteration sampling block for MC delta
tracking (datagen/mc_reference.py).

Each lockstep iteration of the path tracer consumes 3-4 uniforms per ray
(free-flight distance, collision acceptance, two for the HG direction) and
a trig-heavy Henyey-Greenstein frame construction. Under XLA this is a
threefry2x32 chain (~100+ ALU ops per random word: jax.random.split x4 +
three uniform draws, mc_reference.py:156-157,202,212) — pure VPU serial
work interleaved with the gathers. This kernel replaces the whole block
with ONE VMEM pass using the TPU's hardware PRNG (`pltpu.prng_random_bits`,
unreachable from XLA-level jax.random) and fuses the HG math into the same
pass.

Two entry points:

* :func:`sample_flights` — hardware-PRNG kernel (TPU only; the PRNG
  primitives are stubs under the CPU interpreter).
* :func:`sample_flights_with_uniforms` — same math, uniforms supplied by
  the caller; used for exact parity tests against the XLA formulas and as
  the interpret-mode path.

The realization differs from the threefry stream, so the MC estimate
changes within its own 1/√spp noise — callers opt in via
``use_pallas_sampler`` (datagen/mc_reference.py); the default stays
bit-stable with round-2 artifacts.

Reference behavioral contract being accelerated: the sampling steps of the
volpath-class tracer (reference mitsuba3/render.py:215-218 delegates to
Mitsuba's native sampler; ours is first-party).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def _uniform_from_bits(bits):
    """random bits → f32 uniform in [0, 1) from 23 uniform bits.

    ``pltpu.prng_random_bits`` returns *signed* int32, so ``bits >> 9``
    alone is an arithmetic shift that would yield values in [-0.5, 0.5);
    masking to the low 23 bits after the shift gives an unbiased [0, 1)
    uniform for signed and unsigned inputs alike."""
    return ((bits >> 9) & jnp.asarray(0x7FFFFF, bits.dtype)).astype(
        jnp.float32) * (1.0 / (1 << 23))


def flight_and_hg_math(u1, u2, u3, u4, dx, dy, dz, m, g: float):
    """The fused per-iteration sampling math, on [R, 128] planes.

    Returns (t_flight, u_accept, ndx, ndy, ndz). Formula-identical to
    mc_reference.py: free flight ``-log(1-u1)/m`` (:198) and the exact HG
    inverse CDF + branchless Duff frame (:64-87)."""
    t_flight = -jnp.log1p(-u1) / jnp.maximum(m, 1e-12)

    if abs(g) < 1e-3:
        cos_t = 1.0 - 2.0 * u3
    else:
        s = (1.0 - g * g) / (1.0 + g - 2.0 * g * u3)
        cos_t = (1.0 + g * g - s * s) / (2.0 * g)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u4
    cp, sp = jnp.cos(phi), jnp.sin(phi)

    sign = jnp.where(dz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + dz)
    b = dx * dy * a
    t1x, t1y, t1z = 1.0 + sign * dx * dx * a, sign * b, -sign * dx
    t2x, t2y, t2z = b, sign + dy * dy * a, -dy
    w1, w2 = sin_t * cp, sin_t * sp
    ndx = w1 * t1x + w2 * t2x + cos_t * dx
    ndy = w1 * t1y + w2 * t2y + cos_t * dy
    ndz = w1 * t1z + w2 * t2z + cos_t * dz
    inv = jax.lax.rsqrt(jnp.maximum(ndx * ndx + ndy * ndy + ndz * ndz,
                                    1e-30))
    return t_flight, u2, ndx * inv, ndy * inv, ndz * inv


def _hw_kernel(g, seed_ref, dx_ref, dy_ref, dz_ref, m_ref,
               t_ref, ua_ref, nx_ref, ny_ref, nz_ref):
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0])
    shape = dx_ref.shape
    u1 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    u2 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    u3 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    u4 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    t, ua, nx, ny, nz = flight_and_hg_math(
        u1, u2, u3, u4, dx_ref[:], dy_ref[:], dz_ref[:], m_ref[:], g)
    t_ref[:] = t
    ua_ref[:] = ua
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz


def _uniforms_kernel(g, u_ref, dx_ref, dy_ref, dz_ref, m_ref,
                     t_ref, ua_ref, nx_ref, ny_ref, nz_ref):
    t, ua, nx, ny, nz = flight_and_hg_math(
        u_ref[0], u_ref[1], u_ref[2], u_ref[3],
        dx_ref[:], dy_ref[:], dz_ref[:], m_ref[:], g)
    t_ref[:] = t
    ua_ref[:] = ua
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz


def _planes(x, n_pad):
    x = jnp.pad(x, (0, n_pad - x.shape[0]))
    return x.reshape(n_pad // LANES, LANES)


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def sample_flights(seed, d, m, g: float, interpret: bool = False):
    """Hardware-PRNG fused sampling block.

    seed: int32 scalar (vary per iteration); d: [N, 3] unit directions;
    m: [N] local majorants. Returns (t_flight [N], u_accept [N],
    new_d [N, 3])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = d.shape[0]
    n_pad = -(-N // LANES) * LANES
    planes = [_planes(d[:, 0], n_pad), _planes(d[:, 1], n_pad),
              _planes(d[:, 2], n_pad), _planes(m, n_pad)]
    shape = planes[0].shape
    out_sds = [jax.ShapeDtypeStruct(shape, jnp.float32)] * 5
    outs = pl.pallas_call(
        functools.partial(_hw_kernel, g),
        out_shape=out_sds,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), *planes)
    t, ua, nx, ny, nz = [o.reshape(-1)[:N] for o in outs]
    return t, ua, jnp.stack([nx, ny, nz], axis=-1)


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def sample_flights_with_uniforms(u, d, m, g: float,
                                 interpret: bool = False):
    """Parity/testing variant: uniforms ``u`` [4, N] supplied by caller."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = d.shape[0]
    n_pad = -(-N // LANES) * LANES
    u_planes = jnp.stack([_planes(u[i], n_pad) for i in range(4)])
    planes = [_planes(d[:, 0], n_pad), _planes(d[:, 1], n_pad),
              _planes(d[:, 2], n_pad), _planes(m, n_pad)]
    shape = planes[0].shape
    out_sds = [jax.ShapeDtypeStruct(shape, jnp.float32)] * 5
    outs = pl.pallas_call(
        functools.partial(_uniforms_kernel, g),
        out_shape=out_sds,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        interpret=interpret,
    )(u_planes, *planes)
    t, ua, nx, ny, nz = [o.reshape(-1)[:N] for o in outs]
    return t, ua, jnp.stack([nx, ny, nz], axis=-1)
