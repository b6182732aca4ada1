"""Optimizer: AdamW + global-norm clip + runtime-adjustable LR + freezing.

Parity targets:

* AdamW(lr 1e-3, wd 1e-4) over trainable params only — reference
  main.py:257-261 filters ``requires_grad`` for the frozen-encoder model.
* ``clip_grad_norm_(1.0)`` before the step — reference main.py:106.
* ``ReduceLROnPlateau(mode='min', factor=0.5, patience=3)`` on val loss —
  reference main.py:278-280; implemented host-side with torch's semantics
  (relative threshold 1e-4), mutating the LR inside the optax state so the
  jitted step never recompiles.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax


def make_optimizer(lr: float, weight_decay: float = 1e-4,
                   grad_clip: float = 1.0,
                   trainable_mask: Optional[Any] = None,
                   skip_nonfinite: Optional[int] = None):
    """optax transform. ``trainable_mask``: pytree of bools matching params;
    False leaves get zero updates (frozen encoder, main.py:257-261).

    ``skip_nonfinite``: when set, wrap the chain in
    ``optax.apply_if_finite`` — a step whose gradients contain NaN/Inf
    leaves params AND optimizer moments untouched (decided on device by a
    ``lax.cond``; zero host syncs, so the async dispatch pipeline is
    unaffected). After ``skip_nonfinite`` consecutive bad steps the update
    is accepted anyway (optax semantics) — the epoch-level ``TrainingGuard``
    is the backstop for persistent blow-ups. The reference has no
    equivalent: a single NaN batch poisons its weights permanently."""
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay),
    )
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_labels=jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", trainable_mask))
    if skip_nonfinite is not None:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    return tx


def nonfinite_step_count(opt_state) -> int:
    """Total gradient updates rejected as non-finite so far (0 when the
    optimizer was built without ``skip_nonfinite``)."""
    node = opt_state
    while not hasattr(node, "total_notfinite"):
        if hasattr(node, "inner_state"):
            node = node.inner_state
        else:
            return 0
    return int(node.total_notfinite)


def _find_inject_state(opt_state):
    """Locate the InjectHyperparamsState inside a (possibly masked) chain."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if hasattr(opt_state, "inner_states"):  # multi_transform
        return _find_inject_state(opt_state.inner_states["train"].inner_state)
    if hasattr(opt_state, "inner_state"):  # apply_if_finite wrapper
        return _find_inject_state(opt_state.inner_state)
    if isinstance(opt_state, tuple):
        for s in opt_state:
            found = _find_inject_state(s)
            if found is not None:
                return found
    return None


def get_learning_rate(opt_state) -> float:
    state = _find_inject_state(opt_state)
    return float(state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Return a copy of ``opt_state`` with the injected LR replaced (a leaf
    swap — same pytree structure, so no jit recompilation)."""
    target = _find_inject_state(opt_state)

    def swap(node):
        if node is target:
            hp = dict(node.hyperparams)
            hp["learning_rate"] = jax.numpy.asarray(
                lr, dtype=jax.numpy.asarray(hp["learning_rate"]).dtype)
            return node._replace(hyperparams=hp)
        if hasattr(node, "inner_states"):
            inner = dict(node.inner_states)
            inner["train"] = inner["train"]._replace(
                inner_state=swap(inner["train"].inner_state))
            return node._replace(inner_states=inner)
        if (hasattr(node, "_fields") and hasattr(node, "inner_state")
                and not hasattr(node, "hyperparams")):  # apply_if_finite
            return node._replace(inner_state=swap(node.inner_state))
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(swap(s) for s in node)
        return node

    return swap(opt_state)


class ReduceLROnPlateau:
    """torch-semantics plateau scheduler (mode='min', rel threshold 1e-4,
    cooldown 0) — reference main.py:278-280."""

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 3,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, val_loss: float) -> float:
        """Feed the epoch's val loss; returns the (possibly reduced) LR."""
        if val_loss < self.best * (1.0 - self.threshold):
            self.best = val_loss
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
        return self.lr

    def state_dict(self):
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d):
        self.lr, self.best, self.num_bad = d["lr"], d["best"], d["num_bad"]
