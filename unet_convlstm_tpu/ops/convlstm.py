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
                 use_pallas: bool = False,
                 accum_dtype=jnp.float32) -> Carry:
    """Gate nonlinearities + state update, computed in ``accum_dtype``.

    ``gates`` arrives in the conv's compute dtype (bf16 under the default
    policy); each gate is upcast inside this elementwise chain so the
    recurrence math runs in f32 without ever materializing a wide gate
    tensor in HBM."""
    if use_pallas and accum_dtype == jnp.float32:
        # the Pallas kernel accumulates in f32 by construction, so it is
        # only a valid implementation of this function under the default
        # accum_dtype; other policies fall through to the XLA chain below
        from .pallas.convlstm_fused import fused_gate_update
        # gates stay in the conv's compute dtype — the kernel upcasts in
        # VMEM and its VJP saves only (gates, c), not f32 activations
        return fused_gate_update(gates, c.astype(accum_dtype))
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i.astype(accum_dtype))
    f = jax.nn.sigmoid(f.astype(accum_dtype))
    g = jnp.tanh(g.astype(accum_dtype))
    o = jax.nn.sigmoid(o.astype(accum_dtype))
    c_next = f * c.astype(accum_dtype) + i * g
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
    # The conv output stays in the compute dtype; the upcast to f32 happens
    # per-gate INSIDE the elementwise update chain (_gate_update), where XLA
    # fuses it for free. An `.astype(f32)` here instead materializes the
    # full [B,H,W,4*hidden] gate tensor at double width in HBM every scan
    # step (measured: ~7 ms/step of pure f32 gate traffic at the bench
    # config) for zero precision gain — the values are bf16 either way.
    gates = conv2d(params["conv"],
                   jnp.concatenate([x, h.astype(x.dtype)], axis=-1),
                   policy=policy)
    h_next, c_next = _gate_update(gates, c, hidden_dim, use_pallas,
                                  accum_dtype=policy.accum_dtype)
    h_next = h_next.astype(_h_dtype(policy))
    return h_next, (h_next, c_next)


def _recurrent_step_preprojected(params_h, x_proj_t, carry: Carry,
                                 hidden_dim: int, policy: Policy,
                                 use_pallas: bool) -> Tuple[jax.Array, Carry]:
    """Scan body when the input projection was hoisted out of the loop:
    gates_t = x_proj_t + conv(h_{t-1}, W_h).  Exactly the same math as the
    fused conv over concat([x, h]) — a convolution is linear in its input
    channels, so conv(concat(x,h), W) ≡ conv(x, W_x) + conv(h, W_h)."""
    h, c = carry
    gates = x_proj_t + conv2d(params_h, h, policy=policy)
    h_next, c_next = _gate_update(gates, c, hidden_dim, use_pallas,
                                  accum_dtype=policy.accum_dtype)
    h_next = h_next.astype(_h_dtype(policy))
    return h_next, (h_next, c_next)


def _hoist_input_projection(w_bytes_x: int, gate_step_bytes: int) -> bool:
    """Hoisting the input half of the gate conv out of the scan trades
    T re-reads of W_x for one write + one read of the pre-projected gate
    sequence (T · gate_step_bytes each). Worth it exactly when the weight
    traffic saved exceeds the activation traffic added — true for
    bottleneck-type cells (big channels, tiny spatial), false for skip
    cells (small weights, big maps). Measured on v5e: the 19M-param
    bottleneck cell's weight re-reads alone were ~6 ms/step at the bench
    config."""
    return w_bytes_x > 2 * gate_step_bytes


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
             unroll: int = 1,
             flat_layout: str = "time") -> Tuple[jax.Array, List[Carry]]:
    """Run the full stack over a time-major sequence.

    x_seq: [T, B, H, W, Cin]. Returns (out_seq [T,B,H,W,hidden], final states).
    ``state`` enables O(1)-per-frame streaming rollout (each entry is the
    (h, c) carry of one layer). ``flat_layout`` governs how the hoisted
    input projection flattens [T,B]→one conv batch: "time" is a free
    reshape on one chip but interleaves a 'data'-sharded batch axis
    (XLA all-gathers the sequence); "batch" stays device-local under a
    mesh at the cost of two local transposes (models/layout.py).
    """
    num_layers = len(params)
    T, B, H, W, _ = x_seq.shape
    if hidden_dim is None:
        c0 = params["layer0"]["conv"]
        hidden_dim = c0.get("w", c0.get("w_q")).shape[-1] // 4
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
    itemsize = jnp.dtype(policy.compute_dtype).itemsize
    for l in range(num_layers):
        if "w_q" in params[f"layer{l}"]["conv"]:
            # int8-quantized cell (ops/quant.py): skip the compute-dtype
            # cast entirely — w_q is integer and the f32 per-channel
            # dequant scales w_s (and bias) must NOT round to bf16. The
            # hoist below slices the float kernel, so quantized inference
            # always runs the fused concat([x, h]) conv — conv2d
            # dispatches to the int8 path; per-step weight re-reads are
            # half the bf16 bytes anyway, which is what the hoist existed
            # to reduce.
            layer_params = params[f"layer{l}"]
            hoist = False
        else:
            # Hoist the param f32→bf16 cast out of the scan: without the
            # optimization barrier XLA re-materializes the cast of the
            # (large) gate kernel inside EVERY unrolled step (measured:
            # ~5.7 ms/step of redundant weight-cast traffic at the bench
            # config — the bottleneck cell kernel alone is 19M params).
            layer_params = jax.lax.optimization_barrier(
                jax.tree_util.tree_map(policy.cast_param,
                                       params[f"layer{l}"]))
            w = layer_params["conv"]["w"]      # [kh, kw, Cin+hidden, 4*hidden]
            in_dim = w.shape[2] - hidden_dim
            w_x_bytes = (w.shape[0] * w.shape[1] * in_dim * w.shape[3]
                         * itemsize)
            gate_step_bytes = (B * H * W * 4 * hidden_dim) * itemsize
            hoist = _hoist_input_projection(w_x_bytes, gate_step_bytes)

        if hoist:
            # Split the gate conv: the input half runs ONCE over all T*B
            # frames (weights read once, MXU-batched); only the recurrent
            # half stays in the scan. conv is linear in input channels, so
            # this is exactly conv(concat(x, h), W) + b.
            p_x = {"w": w[:, :, :in_dim, :], "b": layer_params["conv"]["b"]} \
                if "b" in layer_params["conv"] else {"w": w[:, :, :in_dim, :]}
            p_h = {"w": w[:, :, in_dim:, :]}
            T_ = out.shape[0]
            from ..models.layout import to_batch_major, to_time_major
            x_flat = to_batch_major(out, B, T_, flat_layout)
            x_proj = conv2d(p_x, x_flat, policy=policy)
            x_proj = to_time_major(x_proj, B, T_, flat_layout)

            def step(carry, xp_t, _ph=p_h):
                h_t, carry = _recurrent_step_preprojected(
                    _ph, xp_t, carry, hidden_dim, policy, use_pallas)
                return carry, h_t

            final_carry, out = jax.lax.scan(step, state[l], x_proj,
                                            unroll=unroll)
        else:
            def step(carry, x_t, _p=layer_params):
                h_t, carry = convlstm_cell_step(_p, x_t, carry, policy,
                                                use_pallas)
                return carry, h_t

            final_carry, out = jax.lax.scan(step, state[l], out,
                                            unroll=unroll)
        new_states.append(final_carry)
    return out, new_states
