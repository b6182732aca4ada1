"""Utilities: torch checkpoint interop, logging helpers."""

from .torch_weights import (  # noqa: F401
    convert_resnet18_state_dict, load_torch_resnet18,
)
