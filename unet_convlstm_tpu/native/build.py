"""Build + load the hostio C++ extension.

Compiles ``hostio.cpp`` with g++ -O3 into a shared object next to the
source and binds it with ctypes. The cache is keyed on a hash of the
source and compile flags — a stale or foreign binary (wrong
microarchitecture, edited source) is never loaded; only an artifact this
host compiled from the current source matches the name. Returns None when
no compiler is available — callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import glob
import hashlib
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

# -O3 only: portable baseline (no -march=native), so a binary built on one
# host can't SIGILL on another if it ever leaks across machines.
_CFLAGS = ["-O3", "-shared", "-fPIC", "-std=c++17", "-pthread"]


def _compile(src: str, out: str) -> bool:
    cmd = ["g++", *_CFLAGS, src, "-o", out]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _cache_key(src: str) -> str:
    h = hashlib.sha256()
    with open(src, "rb") as f:
        h.update(f.read())
    h.update(" ".join(_CFLAGS).encode())
    return h.hexdigest()[:12]


def load_hostio() -> Optional[ctypes.CDLL]:
    """Compile-once, cached by source hash. None if g++ missing or the
    compile fails."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "hostio.cpp")
        out = os.path.join(here, f"_hostio-{_cache_key(src)}.so")
        if not os.path.exists(out):
            tmp = out + f".tmp{os.getpid()}"
            if not _compile(src, tmp):
                return None
            os.replace(tmp, out)  # atomic vs concurrent importers
            for stale in glob.glob(os.path.join(here, "_hostio-*.so")):
                if stale != out:
                    try:
                        os.remove(stale)
                    except OSError:
                        pass
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
