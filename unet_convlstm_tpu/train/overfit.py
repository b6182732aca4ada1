"""Overfit harness — the reference's convergence sanity gate.

Behavioral parity with reference ``train/overfit_check.py:36-139``: pick 16
random sequences, one fixed batch, AdamW(1e-3, wd 1e-4), iterate masked-MSE
(``sum(diff²·mask)/(sum(mask)+1e-6)``, :106-107) up to 3001 steps; success
when loss < 5e-4 (:117); checkpoint carries the selected indices so the run
can be replayed visually (:126-130).

TPU re-design: the whole optimization is one ``lax.scan`` over a jitted
fused step (one compile, zero per-iter host round-trips, early-exit handled
by scanning in chunks and checking the loss between chunks).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.npz_dataset import NPZSequenceDataset
from ..models.registry import build_model
from ..ops.losses import masked_mse
from ..ops.normalize import compute_mask, normalize_x, normalize_y
from .checkpoint import save_checkpoint
from .loop import _trainable_mask
from .optim import make_optimizer


def run_overfit_test(npz_path_or_ds, model_cfg: Optional[Dict[str, Any]] = None,
                     num_samples: int = 16, max_iters: int = 3001,
                     target_loss: float = 5e-4, lr: float = 1e-3,
                     weight_decay: float = 1e-4, chunk: int = 100,
                     seed: int = 0, use_all_ones_mask: Optional[bool] = None,
                     checkpoint_dir: Optional[str] = None,
                     verbose: bool = True) -> Dict[str, Any]:
    """Returns {'converged', 'final_loss', 'iters', 'indices', 'state'}."""
    log = print if verbose else (lambda *a, **k: None)
    ds = (npz_path_or_ds if isinstance(npz_path_or_ds, NPZSequenceDataset)
          else NPZSequenceDataset(npz_path_or_ds))
    model_cfg = model_cfg or {"type": "custom", "base_ch": 64,
                              "use_skip_lstm": True, "use_attention": False}

    rng = np.random.default_rng(seed)
    indices = rng.choice(len(ds), size=min(num_samples, len(ds)),
                         replace=False)
    x_raw, y_raw = ds.get_batch_raw(np.sort(indices))
    s = ds.stats
    x = normalize_x(jnp.asarray(x_raw), s)
    y = normalize_y(jnp.asarray(y_raw), s)
    mask = compute_mask(jnp.asarray(x_raw), s)
    if use_all_ones_mask is None:
        # Moving-MNIST intensities never exceed the 1.1 radiance threshold —
        # an all-zero mask makes the gate vacuous; fall back to ones.
        use_all_ones_mask = float(jnp.sum(mask)) == 0.0
    if use_all_ones_mask:
        mask = jnp.ones_like(mask)

    _, init_fn, apply_fn, _ = build_model(model_cfg)
    variables = init_fn(jax.random.PRNGKey(seed))
    tmask = _trainable_mask(variables["params"], model_cfg)
    tx = make_optimizer(lr, weight_decay, grad_clip=1e9, trainable_mask=tmask)
    state = {"params": variables["params"], "stats": variables["stats"],
             "opt_state": tx.init(variables["params"])}

    def one_step(state, _):
        def loss_fn(params):
            y_pred, _, new_bn = apply_fn(
                {"params": params, "stats": state["stats"]}, x, train=True)
            return masked_mse(y_pred, y, mask), new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return ({"params": new_params, "stats": new_bn,
                 "opt_state": new_opt}, loss)

    from functools import partial

    @partial(jax.jit, static_argnames=("length",))
    def run_chunk(state, length):
        return jax.lax.scan(one_step, state, None, length=length)

    iters_done, final_loss, converged = 0, float("inf"), False
    while iters_done < max_iters:
        length = min(chunk, max_iters - iters_done)  # never overshoot
        state, losses = run_chunk(state, length)
        iters_done += length
        final_loss = float(losses[-1])
        log(f"iter {iters_done:04d} | loss {final_loss:.6f}")
        if final_loss < target_loss:
            converged = True
            break

    result = {"converged": converged, "final_loss": final_loss,
              "iters": iters_done, "indices": indices, "state": state}
    if checkpoint_dir:
        tag = "overfit" if converged else "overfit_failed"
        save_checkpoint(checkpoint_dir,
                        f"{tag}_{model_cfg.get('type', 'custom')}", state,
                        {"config": model_cfg, "indices": indices.tolist(),
                         "final_loss": final_loss, "iters": iters_done,
                         "norm_stats": ds.stats.to_dict()}, wait=True)
    return result
