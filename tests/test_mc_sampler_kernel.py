"""Parity tests for the Pallas fused MC sampling block
(ops/pallas/mc_sampler.py) — math identical to mc_reference's formulas;
run through the Pallas interpreter on CPU (the hardware-PRNG variant is
TPU-only and is validated statistically by scripts/perf/bench_mc_breakdown
on the live chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_convlstm_tpu.datagen.mc_reference import hg_from_uniforms
from unet_convlstm_tpu.ops.pallas.mc_sampler import (
    _uniform_from_bits, flight_and_hg_math, sample_flights_with_uniforms)


def test_uniform_from_bits_signed_int32_lands_in_unit_interval(rng):
    """pltpu.prng_random_bits returns SIGNED int32; the bits→uniform map
    must stay in [0, 1) for negative words too (an arithmetic shift alone
    yields [-0.5, 0.5) — the round-3 review bug)."""
    bits = jnp.asarray(
        rng.integers(-(2**31), 2**31, 100_000, dtype=np.int64), jnp.int32)
    u = np.asarray(_uniform_from_bits(bits))
    assert u.min() >= 0.0 and u.max() < 1.0
    # all 23 mantissa-step levels reachable, mean ~0.5 (unbiased)
    assert abs(u.mean() - 0.5) < 5e-3
    # exact endpoints: all-ones word → (2^23-1)/2^23; zero word → 0
    ends = np.asarray(_uniform_from_bits(jnp.asarray([-1, 0], jnp.int32)))
    np.testing.assert_allclose(ends, [(2**23 - 1) / 2**23, 0.0])
    # uint32 input gives the identical stream (bit-source agnostic)
    u32 = np.asarray(_uniform_from_bits(
        jnp.asarray(np.asarray(bits).view(np.uint32))))
    np.testing.assert_array_equal(u, u32)


@pytest.fixture
def rays(rng):
    N = 300                                  # non-multiple of 128: padding
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    m = rng.uniform(0.01, 0.5, N).astype(np.float32)
    u = rng.uniform(0.0, 1.0, (4, N)).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(d), jnp.asarray(m)


@pytest.mark.parametrize("g", [0.85, 0.0])
def test_kernel_matches_reference_formulas(rays, g):
    u, d, m = rays
    t, ua, nd = sample_flights_with_uniforms(u, d, m, g=g, interpret=True)

    # flight: -log(1-u1)/m (mc_reference.py:198)
    np.testing.assert_allclose(
        np.asarray(t), -np.log1p(-np.asarray(u[0])) / np.asarray(m),
        rtol=1e-6)
    # acceptance uniform passes through untouched
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(u[1]))
    # HG direction: exactly the tracer's inverse-CDF + Duff frame
    want = hg_from_uniforms(u[2], u[3], d, g)
    # kernel normalizes with rsqrt, reference with /norm — 1-2 ulp apart
    np.testing.assert_allclose(np.asarray(nd), np.asarray(want),
                               rtol=2e-5, atol=1e-5)
    # unit norm preserved
    np.testing.assert_allclose(np.linalg.norm(np.asarray(nd), axis=1),
                               1.0, atol=1e-5)


def test_plane_math_equals_flat_math(rays):
    """The [R,128]-plane kernel math is the same function as the flat
    formulas (no layout-dependent term crept in)."""
    u, d, m = rays
    t, ua, nx, ny, nz = flight_and_hg_math(
        u[0], u[1], u[2], u[3], d[:, 0], d[:, 1], d[:, 2], m, 0.85)
    t2, ua2, nd2 = sample_flights_with_uniforms(u, d, m, g=0.85,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), rtol=1e-6)
    # identical formulas; XLA fuses the two call sites differently, so
    # low-order bits of the trig/rsqrt chain may differ
    np.testing.assert_allclose(
        np.stack([nx, ny, nz], axis=-1), np.asarray(nd2), rtol=2e-5,
        atol=1e-5)
