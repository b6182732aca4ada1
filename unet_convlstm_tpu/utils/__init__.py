"""Utilities: torch checkpoint interop, compile cache, logging helpers."""

from .compile_cache import enable_persistent_cache  # noqa: F401
from .torch_weights import (  # noqa: F401
    convert_resnet18_state_dict, load_torch_resnet18,
)
