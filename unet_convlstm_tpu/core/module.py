"""Minimal functional module system.

The framework represents every layer/model as a pair of pure functions:

* ``init(key, ...) -> Variables`` — build a pytree of parameters (and, for
  layers with running statistics, a ``stats`` collection).
* ``apply(variables, x, ...) -> y`` or ``(y, new_stats)`` — pure forward.

``Variables`` is a plain nested dict with two top-level collections:

* ``params`` — trainable parameters (float32 leaves).
* ``stats``  — non-trained state (BatchNorm running mean/var).

This deliberately avoids a class-based module framework: pure pytrees compose
naturally with ``jax.jit`` / ``jax.grad`` / ``shard_map`` and make sharding
annotations trivial (a pytree-of-PartitionSpec mirrors the params tree).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Variables = Dict[str, Any]


def merge(*trees: Dict[str, Any]) -> Dict[str, Any]:
    """Merge disjoint nested dicts (shallow at the top level)."""
    out: Dict[str, Any] = {}
    for t in trees:
        for k, v in t.items():
            if k in out:
                raise ValueError(f"duplicate key {k!r} in merge")
            out[k] = v
    return out


def split_rngs(key: jax.Array, names: list[str]) -> Dict[str, jax.Array]:
    """Split one PRNG key into a dict of named keys (deterministic order)."""
    keys = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, keys)}


def tree_size(tree: Any) -> int:
    """Total number of scalar elements in a pytree."""
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def tree_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def empty_variables() -> Variables:
    return {"params": {}, "stats": {}}


def cast_floating(tree: Any, dtype: jnp.dtype) -> Any:
    """Cast floating-point leaves of a pytree to ``dtype`` (ints untouched)."""

    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
