"""Sequence-parallel (time-sharded) ConvLSTM — pipelined over a mesh axis.

The reference holds whole sequences on one device and loops T in Python
(reference train/unet.py:46-60); our standard path scans T on one device
(ops/convlstm.py). For rollouts too long for one chip's HBM, this module
shards the TIME axis across a mesh axis and pipelines the recurrence
GPipe-style (SURVEY.md §5 "ring/CP over the time axis ... ppermute the (h,c)
carry"):

* Each of S devices holds a contiguous chunk of ceil(T/S) frames
  (time-major, sharded via shard_map; T is zero-padded to a multiple of S
  and the padded frames are masked out of the carry chain, so any T works).
* The batch splits into M microbatches (B zero-padded to a multiple of M).
  At pipeline step s, device d runs its chunk's scan for microbatch
  m = s - d; the resulting (h, c) carry is handed to device d+1 with
  ``lax.ppermute`` over ICI. S + M - 1 steps drain the pipeline; device
  utilization is M / (S + M - 1) — measured numbers in docs/PERF.md.
* Inactive pipeline slots SKIP their compute via ``lax.cond`` (the
  predicate is the per-device activity flag, so XLA executes only the
  taken branch at runtime): an idle device passes the carry through
  instead of burning a full chunk scan on garbage. Wall-clock per step is
  set by the active devices either way; this removes the wasted FLOPs
  (round 1 masked results AFTER computing them).
* Exact numerics: identical to the single-device scan (verified in
  tests/test_parallel_sp.py, including non-divisible T and B).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.dtypes import Policy, DEFAULT_POLICY
from .convlstm import _h_dtype, convlstm_cell_step


def convlstm_time_pipelined(params, x_seq: jax.Array, mesh: Mesh,
                            axis: str = "data", microbatches: int = 2,
                            policy: Policy = DEFAULT_POLICY
                            ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run a single ConvLSTM layer over time-sharded input.

    x_seq: [T, B, H, W, Cin] (global), any T >= 1 and B >= 1. Returns
    (out_seq [T, B, H, W, hidden], final (h, c) [B, H, W, hidden]).
    """
    S = mesh.shape[axis]
    T, B = x_seq.shape[0], x_seq.shape[1]
    M = int(microbatches)
    if M < 1:
        raise ValueError(f"microbatches must be >= 1, got {microbatches}")
    # pad T to a multiple of S and B to a multiple of M; padded frames are
    # masked out of the carry chain, padded batch rows are sliced off
    chunk = -(-T // S)
    T_pad, B_pad = chunk * S, -(-B // M) * M
    if T_pad != T or B_pad != B:
        x_seq = jnp.pad(x_seq, ((0, T_pad - T), (0, B_pad - B),
                                (0, 0), (0, 0), (0, 0)))
    mb = B_pad // M
    hidden = params["conv"]["w"].shape[-1] // 4
    cell = functools.partial(convlstm_cell_step, policy=policy)

    def worker(x_local):
        # x_local: [chunk, B_pad, H, W, Cin] — this device's time chunk
        idx = lax.axis_index(axis)
        spatial = x_local.shape[2:4]
        carry_shape = (mb,) + spatial + (hidden,)
        h = jnp.zeros(carry_shape, _h_dtype(policy))
        c = jnp.zeros(carry_shape, jnp.float32)
        y_local = jnp.zeros(x_local.shape[:-1] + (hidden,),
                            _h_dtype(policy))
        # final (h, c) per microbatch, filled only on the device owning
        # the last VALID frame
        fin_h = jnp.zeros((M,) + carry_shape, _h_dtype(policy))
        fin_c = jnp.zeros((M,) + carry_shape, jnp.float32)
        # which local frames are real (global index < T)
        valid_t = (idx * chunk + jnp.arange(chunk)) < T
        owns_final = idx == (T - 1) // chunk  # device holding frame T-1

        def scan_chunk(carry, x_chunk_mb):
            def step(cr, xv):
                x_t, v = xv
                _, cr_new = cell(params, x_t, cr)
                # padded frame: pass the carry through untouched
                cr = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(v, a, b), cr_new, cr)
                return cr, cr[0]

            return lax.scan(step, carry, (x_chunk_mb, valid_t))

        for s in range(S + M - 1):
            m = s - idx
            active = (m >= 0) & (m < M)
            off = jnp.clip(m, 0, M - 1) * mb
            x_mb = lax.dynamic_slice_in_dim(x_local, off, mb, axis=1)

            # only active pipeline slots run the chunk scan
            def run(op):
                carry, x_c = op
                return scan_chunk(carry, x_c)

            def skip(op):
                carry, x_c = op
                return carry, jnp.zeros(
                    x_c.shape[:-1] + (hidden,), _h_dtype(policy))

            (h_f, c_f), y_mb = lax.cond(active, run, skip, ((h, c), x_mb))
            y_upd = lax.dynamic_update_slice_in_dim(y_local, y_mb, off,
                                                    axis=1)
            y_local = jnp.where(active, y_upd, y_local)
            # the final-frame owner records the completed microbatch state
            mslot = jnp.clip(m, 0, M - 1)
            fin_h = jnp.where(active & owns_final,
                              lax.dynamic_update_slice_in_dim(
                                  fin_h, h_f[None], mslot, axis=0), fin_h)
            fin_c = jnp.where(active & owns_final,
                              lax.dynamic_update_slice_in_dim(
                                  fin_c, c_f[None], mslot, axis=0), fin_c)
            # hand the carry to the next device in the time ring
            perm = [(i, (i + 1) % S) for i in range(S)]
            h = lax.ppermute(h_f, axis, perm)
            c = lax.ppermute(c_f, axis, perm)
            # device 0 starts each microbatch from zero state
            h = jnp.where(idx == 0, jnp.zeros_like(h), h)
            c = jnp.where(idx == 0, jnp.zeros_like(c), c)

        # surface the final states from the owning device to all
        fin_h = lax.psum(jnp.where(owns_final, fin_h, 0.0), axis)
        fin_c = lax.psum(jnp.where(owns_final, fin_c, 0.0), axis)
        return y_local, fin_h, fin_c

    y, fin_h, fin_c = jax.shard_map(
        worker, mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(), P()),
        check_vma=False)(x_seq)
    final_h = fin_h.reshape((B_pad,) + fin_h.shape[2:])[:B]
    final_c = fin_c.reshape((B_pad,) + fin_c.shape[2:])[:B]
    return y[:T, :B], (final_h, final_c)
