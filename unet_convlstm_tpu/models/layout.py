"""Time-major layout helpers shared by the model families.

The whole conv path runs time-major flattened ([T*B, h, w, c]) so every
scan boundary is a FREE reshape instead of an HBM transpose (round 1 paid
a copy per skip level here, fwd and bwd — docs/PERF.md). Both models
depend on this exact contract; keep it in one place.
"""

from __future__ import annotations


def to_time_major(x_bt, B: int, T: int):
    """[T*B, h, w, c] (time-major flattened) -> [T, B, h, w, c]."""
    return x_bt.reshape(T, B, *x_bt.shape[1:])


def to_batch_major(x_tm, B: int, T: int):
    """[T, B, h, w, c] -> [T*B, h, w, c]."""
    return x_tm.reshape(T * B, *x_tm.shape[2:])
