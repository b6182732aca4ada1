"""Fast-path TPU volume gathers — the stacked/padded-payload idiom.

XLA lowers a gather whose OPERAND carries a trailing payload dimension
(slice_sizes ``[1,1,1,C]``, minor dim contiguous) onto a vector memory
path that runs ~4.3× faster per field on v5e than the scalar-payload
form — even at C=2 with a DEAD second field: the algebraic simplifier
does not narrow unused payload fields away. Measured on the live chip
in `scripts/perf/bench_mc_breakdown.py` (plain 4.85 ms/iter vs stacked
1.11 ms at the same chained 65536-address stream, identical checksums);
end-to-end effects in docs/PERF.md round 3 (MC tracer 1.7-2.6×,
stage-C first-hit 24×). Exception: tiny tables that fit on-chip (e.g.
the 13×8×8 MC majorant grid) are already at fast-path cost — padding
those buys nothing.

Usage: build the stacked volume ONCE outside any loop (`stack_volume`
— it dead-pads a single field to C=2), then read it with
`payload_lookup`, selecting fields AFTER the gather (``[..., i]``).
Selecting inside the index expression (``vol[gz, gy, gx, 0]``) narrows
the gather at trace time and falls back to the slow lowering.
"""
import jax
import jax.numpy as jnp


def stack_volume(*fields: jax.Array) -> jax.Array:
    """Stack same-shape volumes into one ``[..., C]`` payload volume.

    A single field is padded with a dead copy (C=2): the one extra O(V)
    stack write is repaid ~4× over by the first V-address gather.
    """
    if len(fields) == 1:
        fields = (fields[0], fields[0])
    return jnp.stack(fields, axis=-1)


def payload_lookup(vol: jax.Array, gz, gy, gx) -> jax.Array:
    """Gather the full ``[..., C]`` payload at integer voxel indices.

    ``gz``/``gy``/``gx`` may be any (broadcastable) integer shape; the
    result has their shape plus the trailing payload dim. Keep field
    selection OUTSIDE this call (see module docstring).
    """
    return vol[gz, gy, gx]
