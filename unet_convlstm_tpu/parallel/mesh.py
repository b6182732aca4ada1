"""Mesh construction + sharding rules (DP over ICI; seams for TP/SP).

Design (SURVEY.md §2.4, "How to Scale Your Model" recipe):

* Mesh axes: ``data`` (batch / DP) and ``model`` (channel / TP). For the
  reference-parity workloads the largest layer (the 2048→4096-channel gate
  conv at base_ch=64) fits on one chip, so the default mesh is
  ``(data=N, model=1)`` — pure DP, gradients psum over ICI under jit.
* Batch arrays are sharded ``P('data')`` on their leading axis; parameters
  and optimizer state are replicated (``P()``).
* Scale-up seam: ``MeshRules.conv_kernel`` shards conv kernels' output
  channels over ``model`` — flipping ``model>1`` channel-shards every conv
  without touching model code (XLA inserts the halo/all-reduce traffic).
* Sequence/context parallelism seam: time stays on-device via lax.scan
  (T≤40); for very long rollouts shard T and ppermute the (h,c) carry —
  documented design seam, not needed for parity (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh. ``data=None`` → all devices / model.

    The ``model`` axis maps to the fastest-varying device order: TP's
    per-layer collectives fire many times per step and should ride
    adjacent ICI links, while the DP gradient reduction fires once per
    step and tolerates the strided hops (with model=1, the default, the
    data axis is trivially contiguous anyway).
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model > len(devices):
        raise ValueError(f"mesh {data}x{model} exceeds {len(devices)} devices")
    grid = np.array(devices[:data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for [B, ...] arrays."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_spec(ndim: int) -> P:
    """PartitionSpec sharding only the leading (batch) axis."""
    return P(*(("data",) + (None,) * (ndim - 1)))


@dataclasses.dataclass(frozen=True)
class MeshRules:
    """Partition rules applied to the params pytree by leaf role."""
    mesh: Mesh
    shard_model_channels: bool = False  # TP seam: conv out-channels on 'model'
    shard_opt_state_data: bool = False  # ZeRO-1: optimizer moments on 'data'

    def param_spec(self, path, leaf) -> P:
        """``path``: tuple of pytree dict keys (may be empty when unknown).
        Sharding is by OUTPUT channels: axis 3 for HWIO conv kernels,
        axis 2 for transposed-conv kernels, identified structurally by
        their 'wt' leaf key (HWOI layout, ops/conv.py::conv_transpose2d_init;
        'up' kept for pre-rename checkpoints) — sharding their last axis
        would split the contraction dim and force per-step resharding."""
        model_size = self.mesh.shape.get("model", 1)
        if (not self.shard_model_channels or getattr(leaf, "ndim", 0) != 4
                or not jnp.issubdtype(leaf.dtype, jnp.floating)):
            return P()
        out_axis = 2 if ("wt" in path or "up" in path) else 3
        if leaf.shape[out_axis] % model_size == 0:
            spec = [None, None, None, None]
            spec[out_axis] = "model"
            return P(*spec)
        return P()

    def opt_state_spec(self, path, leaf) -> P:
        """ZeRO-1 rule for optimizer-state leaves: shard each floating
        moment over the ``data`` axis on its largest still-unsharded,
        divisible dimension, ON TOP of the TP channel rule. Params stay
        replicated — each device owns 1/data of the AdamW moments, updates
        its shard, and XLA all-gathers the param delta (the ZeRO-1
        communication pattern, for free from sharding propagation).
        Gradients are bit-identical to the replicated form because every
        optimizer op here is elementwise over the leaf."""
        base = self.param_spec(path, leaf)
        data_size = self.mesh.shape.get("data", 1)
        ndim = getattr(leaf, "ndim", 0)
        if (not self.shard_opt_state_data or data_size <= 1 or ndim == 0
                or not jnp.issubdtype(leaf.dtype, jnp.floating)):
            return base
        spec = list(base) + [None] * (ndim - len(base))
        free = [i for i in range(ndim)
                if spec[i] is None and leaf.shape[i] % data_size == 0]
        if not free:
            return base
        best = max(free, key=lambda i: leaf.shape[i])
        spec[best] = "data"
        return P(*spec)

    def params_sharding(self, params):
        """Alias of ``tree_sharding`` kept for the params-only call sites."""
        return self.tree_sharding(params)

    def tree_sharding(self, tree):
        """Leaf-wise sharding for ANY pytree of arrays/ShapeDtypeStructs —
        conv-kernel-shaped leaves get the TP channel rule, everything else
        (biases, BN stats, optimizer scalars/moment trees' non-4D leaves)
        replicates. Applying it to a whole train state
        ``{params, stats, opt_state}`` shards the AdamW moments exactly like
        their params (adam's mu/nu mirror the param tree), which is what
        makes TP *training* — not just a sharded forward — work: each
        device updates only its channel shard of params+moments, and XLA
        inserts the gradient collectives.

        With ``shard_opt_state_data`` (ZeRO-1), leaves under an
        ``opt_state`` key additionally shard over ``data``
        (``opt_state_spec``); params/stats keep the param rule."""
        def leaf_sharding(key_path, leaf):
            keys = tuple(getattr(k, "key", getattr(k, "name", ""))
                         for k in key_path)
            rule = (self.opt_state_spec if "opt_state" in keys
                    else self.param_spec)
            return NamedSharding(self.mesh, rule(keys, leaf))

        return jax.tree_util.tree_map_with_path(leaf_sharding, tree)
