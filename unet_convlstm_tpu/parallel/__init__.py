"""Parallelism: device meshes and sharding rules.

The reference is strictly single-device (``cuda if available else cpu``,
reference main.py:230; no torch.distributed anywhere — SURVEY.md §2.4).
Here parallelism is first-class and TPU-native: a ``jax.sharding.Mesh`` over
ICI, batch sharded on the ``data`` axis, parameters replicated (or
channel-sharded on ``model`` for scale-up), with XLA inserting the gradient
``psum`` / all-gathers automatically under ``jit``.
"""

from .mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_batch_spec,
    MeshRules,
)
