"""Sequence-flatten layout shared by the model families.

The conv path runs on all T·B frames at once (one [T*B, h, w, c] or
[B*T, h, w, c] tensor through encoder/decoder — reference resnet18.py:83-87
batches frames the same way; the custom model's per-frame Python loop,
unet.py:179/195, is erased). Two flatten layouts, selected per call:

``"time"`` (default) — time-major [T*B]: the thin input is transposed
    once and every scan boundary becomes a FREE reshape instead of an HBM
    transpose (round-2 trace: one copy per skip level, fwd + bwd —
    docs/PERF.md). Fastest on a single chip. BUT the [T,B]→[T*B] merge
    interleaves the batch axis, so under a 'data'-sharded mesh XLA must
    all-gather the full input (fwd) and output-grad (bwd) every step to
    reshard from B-blocked to T*B-blocked.

``"batch"`` — batch-major [B*T]: the flatten keeps the sharded batch axis
    MAJOR, so every reshape/transpose in the network is device-local — a
    data-parallel step's only collectives are the gradient psums. Scan
    boundaries pay a device-local [B,T]↔[T,B] transpose (HBM bandwidth,
    ~0.7% of the single-chip step, the round-2 measurement this knob
    preserves). train/loop.py auto-selects "batch" whenever the mesh's
    data degree > 1.

BatchNorm batch statistics reduce over all T·B frames either way —
order-invariant, so both layouts compute the same function (tested:
tests/test_parallel.py::test_flat_layouts_agree).

Both models depend on this exact contract; keep it in one place.
"""

from __future__ import annotations


def flatten_seq(x_seq, layout: str = "time"):
    """[B, T, h, w, c] -> flattened frames for the conv path.

    "time": [T*B, ...] (row t*B+b). "batch": [B*T, ...] (row b*T+t)."""
    B, T = x_seq.shape[0], x_seq.shape[1]
    if layout == "time":
        return x_seq.transpose(1, 0, 2, 3, 4).reshape(T * B,
                                                      *x_seq.shape[2:])
    if layout == "batch":
        return x_seq.reshape(B * T, *x_seq.shape[2:])
    raise ValueError(f"unknown flat layout {layout!r} "
                     "(expected 'time' or 'batch')")


def unflatten_seq(y_flat, B: int, T: int, layout: str = "time"):
    """Flattened frames -> [B, T, h, w, c] (inverse of flatten_seq)."""
    if layout == "time":
        return y_flat.reshape(T, B, *y_flat.shape[1:]).transpose(
            1, 0, 2, 3, 4)
    if layout == "batch":
        return y_flat.reshape(B, T, *y_flat.shape[1:])
    raise ValueError(f"unknown flat layout {layout!r}")


def to_time_major(x_flat, B: int, T: int, layout: str = "time"):
    """Flattened frames -> [T, B, h, w, c] for the lax.scan recurrences.

    Free reshape in "time" layout; device-local transpose in "batch"."""
    if layout == "time":
        return x_flat.reshape(T, B, *x_flat.shape[1:])
    if layout == "batch":
        return x_flat.reshape(B, T, *x_flat.shape[1:]).swapaxes(0, 1)
    raise ValueError(f"unknown flat layout {layout!r}")


def to_batch_major(x_tm, B: int, T: int, layout: str = "time"):
    """[T, B, h, w, c] -> flattened frames (inverse of to_time_major).

    Name kept from the round-2 API ("back to the batched conv path")."""
    if layout == "time":
        return x_tm.reshape(T * B, *x_tm.shape[2:])
    if layout == "batch":
        return x_tm.swapaxes(0, 1).reshape(B * T, *x_tm.shape[2:])
    raise ValueError(f"unknown flat layout {layout!r}")
