"""Pallas fused ConvLSTM gate kernel: fwd + custom-VJP bwd vs the XLA
reference math (interpret mode on the CPU mesh; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_convlstm_tpu.ops.pallas.convlstm_fused import (
    fused_gate_update, _xla_gate_update,
)


@pytest.fixture
def gc(rng):
    C, N = 128, 40  # lane-aligned channels engage the Pallas path
    gates = jnp.asarray(rng.standard_normal((N, 4 * C)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
    return gates, c


def test_forward_matches_xla(gc):
    gates, c = gc
    h_p, c_p = fused_gate_update(gates, c)
    h_x, c_x = _xla_gate_update(gates, c)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x),
                               rtol=1e-6, atol=1e-6)


def test_custom_vjp_matches_autodiff(gc):
    gates, c = gc

    def f_pallas(g, c):
        h, cn = fused_gate_update(g, c)
        return jnp.sum(h * 1.3 + cn * 0.7)

    def f_xla(g, c):
        h, cn = _xla_gate_update(g, c)
        return jnp.sum(h * 1.3 + cn * 0.7)

    gp = jax.grad(f_pallas, argnums=(0, 1))(gates, c)
    gx = jax.grad(f_xla, argnums=(0, 1))(gates, c)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_bf16_gates_f32_cell(gc):
    """Mixed precision: bf16 gates in, f32 math inside the kernel, h back
    in bf16 / c in f32 — no f32 gate tensor in HBM (the default-policy
    training path)."""
    gates, c = gc
    gates_bf = gates.astype(jnp.bfloat16)
    h_p, c_p = fused_gate_update(gates_bf, c)
    assert h_p.dtype == jnp.bfloat16 and c_p.dtype == jnp.float32
    h_x, c_x = _xla_gate_update(gates_bf, c)
    np.testing.assert_allclose(np.asarray(h_p, np.float32),
                               np.asarray(h_x, np.float32),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x),
                               rtol=1e-5, atol=1e-5)

    def f_pallas(g, c):
        h, cn = fused_gate_update(g, c)
        return jnp.sum(h.astype(jnp.float32) * 1.3 + cn * 0.7)

    def f_xla(g, c):
        h, cn = _xla_gate_update(g, c)
        return jnp.sum(h.astype(jnp.float32) * 1.3 + cn * 0.7)

    gp = jax.grad(f_pallas, argnums=(0, 1))(gates_bf, c)
    gx = jax.grad(f_xla, argnums=(0, 1))(gates_bf, c)
    assert gp[0].dtype == jnp.bfloat16
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=3e-2, atol=3e-2)


def test_fallback_on_unaligned_channels(rng):
    gates = jnp.asarray(rng.standard_normal((8, 4 * 20)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((8, 20)).astype(np.float32))
    h, cn = fused_gate_update(gates, c)   # C=20 → XLA fallback, no error
    assert h.shape == c.shape
