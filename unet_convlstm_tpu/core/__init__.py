from .module import (
    Variables,
    merge,
    split_rngs,
    tree_size,
)
from .dtypes import Policy, DEFAULT_POLICY, FP32_POLICY

__all__ = [
    "Variables",
    "merge",
    "split_rngs",
    "tree_size",
    "Policy",
    "DEFAULT_POLICY",
    "FP32_POLICY",
]
