"""Fused batch gather + NCHW→NHWC transpose (native fast path).

The training loop's host-side hot operation: ``X[indices]`` then
``moveaxis(2, -1)`` — numpy makes two full copies; the C++ kernel
(native/hostio.cpp) does one fused cache-blocked pass into a preallocated
output. Falls back to numpy transparently.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_NTHREADS = max(1, (os.cpu_count() or 1) - 1) or 1


def gather_transpose(src: np.ndarray, indices: np.ndarray,
                     out: Optional[np.ndarray] = None,
                     nthreads: Optional[int] = None) -> np.ndarray:
    """src [N,T,C,H,W] float32 → out [B,T,H,W,C] float32 for ``indices``."""
    from ..native.build import load_hostio

    indices = np.ascontiguousarray(indices, np.int64)
    N, T, C, H, W = src.shape
    B = len(indices)
    # the native kernel does raw pointer math — validate like numpy would
    if B and (indices.min() < 0 or indices.max() >= N):
        raise IndexError(
            f"index out of range for dataset of {N} samples: "
            f"[{indices.min()}, {indices.max()}]")

    lib = load_hostio()
    if (lib is not None and src.dtype == np.float32
            and src.flags["C_CONTIGUOUS"]):
        if out is None:
            out = np.empty((B, T, H, W, C), np.float32)
        elif (out.shape != (B, T, H, W, C) or out.dtype != np.float32
              or not out.flags["C_CONTIGUOUS"]):
            # the kernel writes B*T*H*W*C f32 at out's raw pointer — a
            # wrong-shape/dtype or non-contiguous buffer would be heap
            # corruption, not an exception
            raise ValueError(
                f"out must be C-contiguous float32 {(B, T, H, W, C)}, got "
                f"{out.dtype} {out.shape} contiguous={out.flags['C_CONTIGUOUS']}")
        lib.gather_transpose_f32(
            src.ctypes.data, indices.ctypes.data, out.ctypes.data,
            B, T, C, H, W, int(nthreads or _NTHREADS))
        return out
    # numpy fallback (two passes)
    gathered = np.moveaxis(src[indices], 2, -1)
    if out is None:
        return np.ascontiguousarray(gathered, np.float32)
    out[...] = gathered
    return out
