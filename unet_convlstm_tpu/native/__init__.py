"""Native (C++) host-runtime components, built on demand with g++ and bound
via ctypes (no pybind11 in this image). Python fallbacks exist for every
entry point — the framework never hard-requires the toolchain."""

from .build import load_hostio  # noqa: F401
