"""Pallas TPU kernel: fused ConvLSTM gate nonlinearities + state update.

One scanned ConvLSTM step is ``gates = conv(concat(x, h))`` followed by the
elementwise block (reference behavior, train/unet.py:28-36):

    i,f,o = sigmoid(gates[..0C,1C,3C..]); g = tanh(gates[..2C..])
    c' = f*c + i*g ; h' = o*tanh(c')

The conv is MXU work that XLA already schedules optimally; the wins here:

* the 4C-wide gate tensor + (h, c) stay VMEM-resident for the whole
  elementwise chain (one HBM read of gates/c, one write of h'/c', zero
  intermediate traffic);
* mixed precision without wide HBM tensors: gates arrive in the conv's
  compute dtype (bf16 under the default policy) and are upcast INSIDE the
  kernel — the math runs in f32, but no f32 gate tensor ever exists in HBM;
* the custom VJP saves only (gates[bf16], c[f32]) as residuals and
  recomputes the activations in the backward kernel. XLA's default AD for
  the same chain stacks the four f32 activation tensors per scan step —
  measured ~7 ms/step of pure f32 residual traffic at the bench config.

Forward and backward are both Pallas kernels wired through
``jax.custom_vjp`` so the op trains.

The wrapper falls back to plain XLA elementwise (which fuses well too) when
the channel count is not lane-aligned (C % 128 != 0) or the dtype is
unsupported — keeps unit tests and small configs robust.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256  # rows (B*H*W pixels) per grid step


# ---------------------------------------------------------------------------
# Kernels (compute in f32 regardless of the gate storage dtype)
# ---------------------------------------------------------------------------

def _fwd_kernel(gates_ref, c_ref, h_out_ref, c_out_ref):
    C = c_ref.shape[-1]
    g_all = gates_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(g_all[:, 0 * C:1 * C])
    f = jax.nn.sigmoid(g_all[:, 1 * C:2 * C])
    g = jnp.tanh(g_all[:, 2 * C:3 * C])
    o = jax.nn.sigmoid(g_all[:, 3 * C:4 * C])
    c_next = f * c_ref[:].astype(jnp.float32) + i * g
    c_out_ref[:] = c_next.astype(c_out_ref.dtype)
    h_out_ref[:] = (o * jnp.tanh(c_next)).astype(h_out_ref.dtype)


def _bwd_kernel(gates_ref, c_ref, dh_ref, dc_out_ref,
                dgates_ref, dc_ref):
    C = c_ref.shape[-1]
    g_all = gates_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(g_all[:, 0 * C:1 * C])
    f = jax.nn.sigmoid(g_all[:, 1 * C:2 * C])
    g = jnp.tanh(g_all[:, 2 * C:3 * C])
    o = jax.nn.sigmoid(g_all[:, 3 * C:4 * C])
    c = c_ref[:].astype(jnp.float32)
    c_next = f * c + i * g
    tc = jnp.tanh(c_next)
    dh = dh_ref[:].astype(jnp.float32)
    dc_next = dc_out_ref[:].astype(jnp.float32) + dh * o * (1.0 - tc * tc)
    dt = dgates_ref.dtype
    dgates_ref[:, 0 * C:1 * C] = (dc_next * g * i * (1.0 - i)).astype(dt)
    dgates_ref[:, 1 * C:2 * C] = (dc_next * c * f * (1.0 - f)).astype(dt)
    dgates_ref[:, 2 * C:3 * C] = (dc_next * i * (1.0 - g * g)).astype(dt)
    dgates_ref[:, 3 * C:4 * C] = (dh * tc * o * (1.0 - o)).astype(dt)
    dc_ref[:] = (dc_next * f).astype(dc_ref.dtype)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------

def _interpret() -> bool:
    """Pallas TPU kernels run in interpret mode on non-TPU backends (keeps
    the code path testable on the CPU mesh)."""
    return jax.default_backend() != "tpu"


def _pad_rows(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, n


def _fwd_2d(gates2d, c2d):
    (gates2d, n), (c2d, _) = _pad_rows(gates2d, _TILE_N), _pad_rows(c2d, _TILE_N)
    C = c2d.shape[-1]
    grid = (gates2d.shape[0] // _TILE_N,)
    h, c_next = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, 4 * C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # h in the gate/compute dtype, c in the carry dtype (f32)
            jax.ShapeDtypeStruct(c2d.shape, gates2d.dtype),
            jax.ShapeDtypeStruct(c2d.shape, c2d.dtype),
        ],
        interpret=_interpret(),
    )(gates2d, c2d)
    return h[:n], c_next[:n]


def _bwd_2d(gates2d, c2d, dh2d, dcout2d):
    n = gates2d.shape[0]
    gates2d, _ = _pad_rows(gates2d, _TILE_N)
    c2d, _ = _pad_rows(c2d, _TILE_N)
    dh2d, _ = _pad_rows(dh2d, _TILE_N)
    dcout2d, _ = _pad_rows(dcout2d, _TILE_N)
    C = c2d.shape[-1]
    grid = (gates2d.shape[0] // _TILE_N,)
    dgates, dc = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, 4 * C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_N, 4 * C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(gates2d.shape, gates2d.dtype),
            jax.ShapeDtypeStruct(c2d.shape, c2d.dtype),
        ],
        interpret=_interpret(),
    )(gates2d, c2d, dh2d, dcout2d)
    return dgates[:n], dc[:n]


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

def _xla_gate_update(gates, c):
    # ONE implementation of the gate math: delegate to convlstm's XLA
    # chain (f32 accumulation, matching the Pallas kernel) instead of a
    # drift-prone duplicate; only the h dtype contract differs (the
    # fused API returns h in the conv's compute dtype).
    from ..convlstm import _gate_update
    h, c_next = _gate_update(gates, c, c.shape[-1], use_pallas=False,
                             accum_dtype=jnp.float32)
    return h.astype(gates.dtype), c_next


@jax.custom_vjp
def _fused(gates, c):
    C = c.shape[-1]
    g2 = gates.reshape(-1, 4 * C)
    c2 = c.reshape(-1, C)
    h2, cn2 = _fwd_2d(g2, c2)
    return h2.reshape(c.shape), cn2.reshape(c.shape)


def _fused_fwd(gates, c):
    out = _fused(gates, c)
    return out, (gates, c)   # narrow residuals; activations recomputed in bwd


def _fused_bwd(res, cts):
    gates, c = res
    dh, dc_out = cts
    C = c.shape[-1]
    dg2, dc2 = _bwd_2d(gates.reshape(-1, 4 * C), c.reshape(-1, C),
                       dh.astype(gates.dtype).reshape(-1, C),
                       dc_out.astype(c.dtype).reshape(-1, C))
    return dg2.reshape(gates.shape), dc2.reshape(c.shape)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_gate_update(gates: jax.Array, c: jax.Array):
    """gates: [..., 4C] (f32 or bf16), c: [..., C] (f32) → (h_next, c_next).

    h_next comes back in the gate dtype, c_next in the carry dtype; the
    math runs in f32 inside VMEM either way.  Uses the Pallas kernel when C
    is lane-aligned; XLA fallback otherwise.
    """
    C = c.shape[-1]
    if C % 128 != 0 or gates.dtype not in (jnp.float32, jnp.bfloat16):
        return _xla_gate_update(gates, c)
    return _fused(gates, c.astype(jnp.float32))
