"""Jitted train / eval steps — the hot path.

One ``train_step`` call does, entirely on device (contrast reference
main.py:87-133, which normalizes on host, syncs the loss scalar and pulls two
denormalized tensors to host every batch):

    raw batch → mask/normalize (ops.normalize) → forward (model apply) →
    weighted-L1+gradient loss → backward → clip+AdamW update →
    denormalized metric reduction → 4 scalars

The step is donated (params/opt-state buffers reused in place) and, when a
mesh is given, compiled with the batch sharded over ``data`` and the state
replicated — XLA inserts the gradient psum over ICI (this *is* the DP
all-reduce; no NCCL-style code, SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.normalize import (NormStats, compute_mask, denormalize_y,
                             normalize_x, normalize_y)
from ..ops.losses import compute_loss
from .metrics import MetricSums, metric_sums_init, metric_sums_update
from ..parallel.mesh import batch_sharding, replicated_sharding

TrainState = Dict[str, Any]  # {"params", "stats", "opt_state"}


def _guarded_bn(new_opt, grads, new_bn, old_stats):
    """BatchNorm running stats committed ONLY when the update was finite —
    see ``_make_step_core``'s guard_nonfinite_stats docstring."""
    if hasattr(new_opt, "notfinite_count"):
        # reuse the wrapper's own decision (resets to 0 on a finite
        # step) — one scalar compare, and it can never disagree
        # with what the optimizer actually did
        finite = new_opt.notfinite_count == 0
    else:  # tx built without apply_if_finite: decide ourselves
        finite = jnp.all(jnp.stack([
            jnp.all(jnp.isfinite(g))
            for g in jax.tree_util.tree_leaves(grads)]))
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(finite, n, o.astype(n.dtype)),
        new_bn, old_stats)


def _make_step_core(apply_fn: Callable, tx: optax.GradientTransformation,
                    norm_stats: NormStats, use_mask: bool,
                    grad_weight: float,
                    guard_nonfinite_stats: bool = False):
    """The one training-step body shared by the single-step and K-step
    (scanned) trainers — edits here keep both in lockstep (their exact
    equivalence is tested).

    ``guard_nonfinite_stats`` (set when the optimizer runs under
    ``skip_nonfinite``): a batch with non-finite gradients must leave ALL
    persistent state untouched — ``optax.apply_if_finite`` covers params
    and moments, but the BatchNorm running stats are committed outside the
    optimizer, and one NaN forward would otherwise poison them forever
    (eval mode reads running stats, so every later epoch's val loss would
    be NaN even with pristine params). Same on-device lax-select
    discipline: no host syncs."""

    def step_core(state: TrainState, x_raw, y_raw):
        x = normalize_x(x_raw, norm_stats)
        y = normalize_y(y_raw, norm_stats)
        mask = compute_mask(x_raw, norm_stats)

        def loss_fn(params):
            y_pred, _, new_bn = apply_fn(
                {"params": params, "stats": state["stats"]}, x, train=True)
            loss = compute_loss(y_pred, y, mask, use_mask,
                                grad_weight=grad_weight)
            return loss, (new_bn, y_pred)

        (loss, (new_bn, y_pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        if guard_nonfinite_stats:
            new_bn = _guarded_bn(new_opt, grads, new_bn, state["stats"])
        sums = metric_sums_update(
            metric_sums_init(),
            denormalize_y(y_pred.astype(jnp.float32), norm_stats),
            denormalize_y(y, norm_stats),
            mask, use_mask)
        new_state = {"params": new_params, "stats": new_bn,
                     "opt_state": new_opt}
        return new_state, loss, sums

    return step_core


def _make_accum_step_core(apply_fn: Callable,
                          tx: optax.GradientTransformation,
                          norm_stats: NormStats, use_mask: bool,
                          grad_weight: float, accum_steps: int,
                          guard_nonfinite_stats: bool = False, mesh=None):
    """Gradient-accumulation step body: the [B] batch is split into
    ``accum_steps`` microbatches, a ``lax.scan`` accumulates their mean
    gradient (every microbatch differentiated at the SAME params — textbook
    accumulation, not sequential SGD), then ONE optimizer update fires. Only
    one microbatch's activations are live at a time, so the effective batch
    B costs the HBM of B/accum_steps — the third answer to the B=64 question
    in docs/PERF.md (B=64 OOMs resident; remat fits but loses; accumulation
    fits at B=32's activation footprint).

    Semantic deltas vs one resident [B] step, both inherent to accumulation:
    BatchNorm batch statistics are per-microbatch (running stats thread
    through the scan), and a ``use_mask=True`` loss normalizes per
    microbatch's own mask sum (the reported loss is their mean).
    """

    def step_core(state: TrainState, x_raw, y_raw):
        K = accum_steps
        if x_raw.shape[0] % K:
            raise ValueError(
                f"batch size {x_raw.shape[0]} is not divisible by "
                f"accum_steps={K} — gradient accumulation splits the batch "
                f"into K equal microbatches")
        if mesh is not None:
            D = mesh.shape.get("data", 1)
            if (x_raw.shape[0] // K) % D:
                raise ValueError(
                    f"microbatch {x_raw.shape[0] // K} (batch "
                    f"{x_raw.shape[0]} / accum_steps={K}) is not divisible "
                    f"by the mesh data degree {D} — each microbatch must "
                    f"shard evenly over 'data' (same rule fit() enforces)")

        def to_micro(a):
            # [B] batch-sharded on 'data' → [K, B/K] microbatches by
            # STRIDED selection: microbatch k = rows {k, k+K, k+2K, …}.
            # Chosen over the contiguous split ([k·B/K, (k+1)·B/K))
            # because it is sharding-stable: the [B]→[B/K,K] reshape and
            # the [K,B/K] transpose are both LOCAL under a 'data'-sharded
            # batch axis (each device's contiguous row block factors
            # evenly when K·D | B), so a D-device mesh runs accumulation
            # with ZERO batch resharding. The contiguous split could not
            # keep the sharded axis intact through the reshape, and XLA's
            # partitioner fell back to "involuntary full
            # rematerialization" — all-gathering the entire input batch
            # every accumulation step (MULTICHIP_r04.json,
            # spmd_partitioner.cc warnings; tests/test_accum.py asserts
            # the optimized HLO is now free of it). The grouping is
            # device-count-independent: microbatch contents AND order are
            # identical on 1 device and on any mesh, so DP ≡ single-device
            # accumulation exactly, BatchNorm microbatch semantics
            # included.
            B = a.shape[0]
            a = a.reshape((B // K, K) + a.shape[1:])
            a = jnp.swapaxes(a, 0, 1)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                a = jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, P(None, "data")))
            return a

        def loss_fn(params, bn, x, y, mask):
            y_pred, _, new_bn = apply_fn(
                {"params": params, "stats": bn}, x, train=True)
            loss = compute_loss(y_pred, y, mask, use_mask,
                                grad_weight=grad_weight)
            return loss, (new_bn, y_pred)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, microbatch):
            bn, gsum, loss_sum, sums = carry
            x_r, y_r = microbatch
            x = normalize_x(x_r, norm_stats)
            y = normalize_y(y_r, norm_stats)
            mask = compute_mask(x_r, norm_stats)
            (loss, (new_bn, y_pred)), grads = grad_fn(
                state["params"], bn, x, y, mask)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            sums = metric_sums_update(
                sums,
                denormalize_y(y_pred.astype(jnp.float32), norm_stats),
                denormalize_y(y, norm_stats), mask, use_mask)
            return (new_bn, gsum, loss_sum + loss.astype(jnp.float32),
                    sums), None

        gzero = jax.tree_util.tree_map(jnp.zeros_like, state["params"])
        carry0 = (state["stats"], gzero, jnp.zeros((), jnp.float32),
                  metric_sums_init())
        (new_bn, gsum, loss_sum, sums), _ = jax.lax.scan(
            body, carry0, (to_micro(x_raw), to_micro(y_raw)))

        grads = jax.tree_util.tree_map(lambda g: g / K, gsum)
        loss = loss_sum / K
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        if guard_nonfinite_stats:
            new_bn = _guarded_bn(new_opt, grads, new_bn, state["stats"])
        return ({"params": new_params, "stats": new_bn,
                 "opt_state": new_opt}, loss, sums)

    return step_core


def make_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                    norm_stats: NormStats, use_mask: bool = False,
                    grad_weight: float = 0.005,
                    mesh=None, donate: bool = True,
                    state_sharding=None,
                    guard_nonfinite_stats: bool = False,
                    accum_steps: int = 1):
    """Build the jitted step: (state, x_raw, y_raw) → (state, loss, sums).

    ``apply_fn(variables, x_seq, state=None, train=...)`` → (y_seq, state,
    new_bn_stats); raw NHWC batches (normalization fuses into the step).

    ``state_sharding``: optional pytree of NamedShardings matching the train
    state — pass ``MeshRules.tree_sharding(state)`` to run tensor-parallel
    training (conv kernels + their AdamW moments channel-sharded over the
    mesh 'model' axis; XLA inserts the activation gathers and gradient
    reduce-scatters). Default: state replicated (pure DP).

    ``accum_steps > 1``: gradient accumulation — the [B] batch is processed
    as ``accum_steps`` scanned microbatches of B/accum_steps rows before the
    single optimizer update (see ``_make_accum_step_core``). B must be
    divisible by accum_steps (and the microbatch by the mesh 'data' degree).
    """
    if accum_steps > 1:
        step = _make_accum_step_core(apply_fn, tx, norm_stats, use_mask,
                                     grad_weight, accum_steps,
                                     guard_nonfinite_stats, mesh=mesh)
    else:
        step = _make_step_core(apply_fn, tx, norm_stats, use_mask,
                               grad_weight, guard_nonfinite_stats)

    kwargs: Dict[str, Any] = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        rep = replicated_sharding(mesh)
        bat = batch_sharding(mesh)
        st = state_sharding if state_sharding is not None else rep
        kwargs["in_shardings"] = (st, bat, bat)
        kwargs["out_shardings"] = (st, rep, rep)
    return jax.jit(step, **kwargs)


def make_multi_train_step(apply_fn: Callable,
                          tx: optax.GradientTransformation,
                          norm_stats: NormStats, use_mask: bool = False,
                          grad_weight: float = 0.005, mesh=None,
                          guard_nonfinite_stats: bool = False,
                          accum_steps: int = 1):
    """K training steps per dispatch: (state, x_raw [K,B,...],
    y_raw [K,B,...]) → (state, losses [K], summed metric sums).

    ``lax.scan`` over the step body keeps the whole K-step window on
    device — one launch, one host round-trip — which amortizes dispatch
    overhead on high-latency links and lets XLA overlap the optimizer of
    step k with the forward of step k+1. Use when the K-batch window fits
    HBM; the single-step variant streams otherwise.

    ``accum_steps > 1`` composes: each of the K dispatched steps runs the
    scanned gradient-accumulation body (``_make_accum_step_core``) over its
    own [B] batch — B must be divisible by accum_steps."""
    if accum_steps > 1:
        step_core = _make_accum_step_core(apply_fn, tx, norm_stats,
                                          use_mask, grad_weight,
                                          accum_steps,
                                          guard_nonfinite_stats, mesh=mesh)
    else:
        step_core = _make_step_core(apply_fn, tx, norm_stats, use_mask,
                                    grad_weight, guard_nonfinite_stats)

    def step_body(state, batch):
        x_raw, y_raw = batch
        new_state, loss, sums = step_core(state, x_raw, y_raw)
        return new_state, (loss, sums)

    def multi_step(state, x_raw, y_raw):
        state, (losses, sums) = jax.lax.scan(step_body, state,
                                             (x_raw, y_raw))
        total = jax.tree_util.tree_map(lambda s: jnp.sum(s, axis=0), sums)
        return state, losses, total

    kwargs: Dict[str, Any] = {"donate_argnums": (0,)}
    if mesh is not None:
        rep = replicated_sharding(mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        kbat = NamedSharding(mesh, P(None, "data"))  # [K, B, ...] on B
        kwargs["in_shardings"] = (rep, kbat, kbat)
        kwargs["out_shardings"] = (rep, rep, rep)
    return jax.jit(multi_step, **kwargs)


def make_eval_step(apply_fn: Callable, norm_stats: NormStats,
                   use_mask: bool = False, grad_weight: float = 0.005,
                   mesh=None, variables_sharding=None):
    """(variables, x_raw, y_raw) → (loss, sums) — reference evaluate()
    (main.py:151-205) as one jitted call."""

    def step(variables, x_raw, y_raw, n_valid):
        """``n_valid``: number of real rows — the rest are zero padding that
        keeps the batch shape static/shardable; they carry zero weight."""
        B = x_raw.shape[0]
        valid = (jnp.arange(B) < n_valid).astype(jnp.float32)
        x = normalize_x(x_raw, norm_stats)
        y = normalize_y(y_raw, norm_stats)
        mask = compute_mask(x_raw, norm_stats)
        y_pred, _, _ = apply_fn(variables, x, train=False)
        loss = compute_loss(y_pred, y, mask, use_mask,
                            grad_weight=grad_weight, sample_weight=valid)
        vmask = valid.reshape((-1,) + (1,) * (y.ndim - 1))
        sums = metric_sums_update(
            metric_sums_init(),
            denormalize_y(y_pred.astype(jnp.float32), norm_stats),
            denormalize_y(y, norm_stats),
            mask * vmask if use_mask else vmask, use_mask=True)
        return loss, sums

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        rep = replicated_sharding(mesh)
        bat = batch_sharding(mesh)
        var = variables_sharding if variables_sharding is not None else rep
        kwargs["in_shardings"] = (var, bat, bat, rep)
        kwargs["out_shardings"] = (rep, rep)
    return jax.jit(step, **kwargs)
