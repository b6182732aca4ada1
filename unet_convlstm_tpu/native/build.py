"""Build + load the hostio C++ extension.

Compiles ``hostio.cpp`` with g++ -O3 into a cached shared object next to the
source (rebuilt when the source is newer) and binds it with ctypes. Returns
None when no compiler is available — callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _compile(src: str, out: str) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", out]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def load_hostio() -> Optional[ctypes.CDLL]:
    """Compile-once, cached. None if g++ missing or compile fails."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "hostio.cpp")
        out = os.path.join(here, "_hostio.so")
        fresh = (os.path.exists(out)
                 and os.path.getmtime(out) >= os.path.getmtime(src))
        if not fresh and not _compile(src, out):
            return None
        try:
            lib = ctypes.CDLL(out)
        except OSError:
            return None
        i64 = ctypes.c_int64
        lib.gather_transpose_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            i64, i64, i64, i64, i64, ctypes.c_int32]
        lib.gather_transpose_f32.restype = None
        lib.paste_digit_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            i64, i64, i64, ctypes.c_float]
        lib.paste_digit_f32.restype = None
        _LIB = lib
        return _LIB
