"""ConvLSTM — the temporal core, driven by ``jax.lax.scan``.

Behavioral spec (reference train/unet.py:14-60, re-designed for TPU):

* Cell step: one 3x3 conv over concat([x, h]) producing ``4*hidden`` gate
  channels; split (i, f, g, o); i,f,o = sigmoid, g = tanh;
  c' = f*c + i*g; h' = o*tanh(c').
* Multi-layer stack: layer l consumes the full output sequence of layer l-1.
* Zero-initialized (h, c) when no carry is given.

TPU-first differences from the reference:

* The time loop is ``lax.scan`` (compiled once, O(T) on device) instead of a
  host-side Python list loop (reference unet.py:52-58).
* Sequences are time-major ``[T, B, H, W, C]`` so scan slices are contiguous.
* The carry (h, c) stays in float32 for recurrence stability; the gate conv
  runs in bf16 with f32 accumulation.
* The gate nonlinearities + state update can run as a fused Pallas kernel
  (``ops.pallas.fused_gate_update``) — enabled via ``use_pallas=True``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, DEFAULT_POLICY
from .conv import conv2d_init, conv2d

Carry = Tuple[jax.Array, jax.Array]  # (h, c), each [B, H, W, hidden]


def convlstm_cell_init(key, input_dim: int, hidden_dim: int,
                       kernel_size: int = 3, bias: bool = True):
    return {
        "conv": conv2d_init(key, input_dim + hidden_dim, 4 * hidden_dim,
                            kernel_size, bias=bias),
        # static metadata kept out of the pytree leaves
    }


def _gate_update(gates: jax.Array, c: jax.Array, hidden_dim: int,
                 use_pallas: bool = False) -> Carry:
    if use_pallas:
        from .pallas.convlstm_fused import fused_gate_update
        return fused_gate_update(gates, c)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_next = f * c + i * g
    h_next = o * jnp.tanh(c_next)
    return h_next, c_next


def _h_dtype(policy: Policy):
    """h is re-quantized by the gate conv next step anyway, so it lives in
    the compute dtype (halves the scanned-output HBM traffic — the step is
    bandwidth-bound); c carries error across T steps and stays in the
    accumulation dtype."""
    return policy.compute_dtype


def convlstm_cell_step(params, x: jax.Array, carry: Carry,
                       policy: Policy = DEFAULT_POLICY,
                       use_pallas: bool = False) -> Tuple[jax.Array, Carry]:
    """One recurrent step. x: [B,H,W,Cin]; carry h,c: [B,H,W,hidden]."""
    h, c = carry
    hidden_dim = h.shape[-1]
    gates = conv2d(params["conv"],
                   jnp.concatenate([x, h.astype(x.dtype)], axis=-1),
                   policy=policy).astype(policy.accum_dtype)
    # [B,H,W,4*hidden] — upcast to f32 (fused into the conv epilogue) so the
    # recurrence update runs in full precision.
    h_next, c_next = _gate_update(gates, c, hidden_dim, use_pallas)
    h_next = h_next.astype(_h_dtype(policy))
    return h_next, (h_next, c_next)


def convlstm_zero_state(batch: int, height: int, width: int, hidden_dim: int,
                        dtype=jnp.float32) -> Carry:
    shape = (batch, height, width, hidden_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def convlstm_init(key, input_dim: int, hidden_dim: int, num_layers: int = 1,
                  kernel_size: int = 3):
    keys = jax.random.split(key, num_layers)
    return {
        f"layer{l}": convlstm_cell_init(
            keys[l], input_dim if l == 0 else hidden_dim, hidden_dim,
            kernel_size)
        for l in range(num_layers)
    }


def convlstm(params, x_seq: jax.Array,
             state: Optional[List[Carry]] = None,
             hidden_dim: Optional[int] = None,
             policy: Policy = DEFAULT_POLICY,
             use_pallas: bool = False,
             unroll: int = 1) -> Tuple[jax.Array, List[Carry]]:
    """Run the full stack over a time-major sequence.

    x_seq: [T, B, H, W, Cin]. Returns (out_seq [T,B,H,W,hidden], final states).
    ``state`` enables O(1)-per-frame streaming rollout (each entry is the
    (h, c) carry of one layer).
    """
    num_layers = len(params)
    T, B, H, W, _ = x_seq.shape
    if hidden_dim is None:
        hidden_dim = params["layer0"]["conv"]["w"].shape[-1] // 4
    if state is None:
        # h in the compute dtype (bandwidth), c in the accumulation dtype
        # (f32 — recurrence drift in bf16 compounds over T steps).
        state = [(jnp.zeros((B, H, W, hidden_dim), _h_dtype(policy)),
                  jnp.zeros((B, H, W, hidden_dim), policy.accum_dtype))
                 for _ in range(num_layers)]
    else:
        # coerce externally-provided carries to the scan's dtypes
        state = [(h.astype(_h_dtype(policy)),
                  c.astype(policy.accum_dtype)) for h, c in state]

    out = x_seq
    new_states: List[Carry] = []
    for l in range(num_layers):
        layer_params = params[f"layer{l}"]

        def step(carry, x_t, _p=layer_params):
            h_t, carry = convlstm_cell_step(_p, x_t, carry, policy, use_pallas)
            return carry, h_t

        final_carry, out = jax.lax.scan(step, state[l], out,
                                        unroll=unroll)
        new_states.append(final_carry)
    return out, new_states
