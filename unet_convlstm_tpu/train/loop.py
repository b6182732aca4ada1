"""Epoch driver — the TPU equivalent of reference main.py's __main__ loop.

Structure parity (main.py:211-325): dataset → deterministic 80/20 split →
model init (type-dispatched) → AdamW(+freeze filter) → per-epoch train/eval
with denormalized MAE/RMSE/ME lines → ReduceLROnPlateau on val loss →
best-val checkpoint with embedded config.

TPU-first differences:

* One jitted fused step (see steps.py); raw batches stream through a
  double-buffered device prefetch queue.
* Per-step scalars stay on device; the only host sync is at epoch end.
* Checkpoints carry optimizer + scheduler state → true resume.
* Optional ``jax.profiler`` trace of a step window (SURVEY.md §5: the
  reference has no tracing at all).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.npz_dataset import NPZSequenceDataset
from ..data.pipeline import SequenceLoader, pad_batch, prefetch_to_device
from ..models.registry import build_model
from ..parallel.mesh import make_mesh, batch_sharding, replicated_sharding
from .config import TrainConfig
from .checkpoint import save_checkpoint
from .metrics import metric_sums_init, metric_sums_finalize
from .optim import ReduceLROnPlateau, make_optimizer, set_learning_rate
from .steps import make_train_step, make_eval_step


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


@jax.jit
def _device_copy(tree):
    """Distinct-buffer copy of a state tree, on device (shardings kept).

    The copy must be a real one: the working state's buffers are DONATED
    into every train step, so a mere reference would be invalidated by
    the next update."""
    return jax.tree_util.tree_map(jnp.copy, tree)


def _snap_take(state, mode: str):
    """Guard rollback snapshot of the train state.

    ``device``: an HBM-resident copy (milliseconds; one extra state copy
    of HBM). ``host``: device_get to host RAM — free HBM, but the full
    params+optimizer transfer costs ~45 s/epoch for the production cloud
    model through the TPU tunnel (measured 2026-08-18, docs/PERF.md)."""
    return jax.device_get(state) if mode == "host" else _device_copy(state)


def _snap_restore(snap, state_shard, mode: str):
    if mode == "host":
        return jax.device_put(snap, state_shard)
    # copy again: the restored state is donated onward, and the retained
    # snapshot must survive for a possible second rollback
    return _device_copy(snap)


def _append_history_csv(ckpt_dir: str, row: Dict[str, Any],
                        filename: str = "history.csv") -> None:
    """Persistent per-epoch metrics log (the reference only prints,
    main.py:302-304)."""
    import csv
    import os

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, filename)
    fieldnames = list(row)
    if os.path.exists(path):
        # A resume may toggle the row schema (e.g. skip_nonfinite_updates
        # adds/removes the nonfinite_steps column); keep the existing
        # header authoritative so appended rows stay column-aligned —
        # unknown keys are dropped, missing ones left blank.
        with open(path, newline="") as f:
            header = next(csv.reader(f), None)
        if header:
            fieldnames = header
    else:
        header = None
    with open(path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames,
                                extrasaction="ignore", restval="")
        if header is None:
            writer.writeheader()
        writer.writerow(row)


def _checkpoint_config(cfg) -> Dict[str, Any]:
    """The config dict embedded in checkpoints.

    For the resnet18 family the saved weights already EMBODY whatever
    pretrained init was used, so the embedded model config (a) drops
    ``pretrained_path`` — otherwise every later restore (serve/evaluate/
    resume) would re-load an external .pth that may no longer exist, for
    weights the restore immediately overwrites — and (b) records
    ``pretrained_resolved: true`` so the registry honors
    ``freeze_encoder`` as saved instead of re-searching for weights and
    falling back to unfrozen (the never-freeze-random policy is about
    fresh inits; a trained checkpoint's encoder is not random)."""
    d = cfg.to_dict()
    model = dict(d.get("model") or {})
    if model.get("type") == "resnet18":
        model.pop("pretrained_path", None)
        model["pretrained_resolved"] = True
        d["model"] = model
    return d


def _trainable_mask(params: Dict[str, Any], model_cfg: Dict[str, Any]):
    """Frozen-encoder filter (reference main.py:257-261 trains only
    requires_grad params; resnet18.py:41-44 freezes the encoder).

    The default must mirror the registry's (freeze_encoder=True for
    resnet18) — otherwise AdamW weight decay would still shrink the
    zero-gradient encoder weights every step."""
    default_freeze = model_cfg.get("type") == "resnet18"
    if not model_cfg.get("freeze_encoder", default_freeze):
        return None
    return {k: jax.tree_util.tree_map(lambda _: k != "encoder", v)
            for k, v in params.items()}


def fit(cfg: TrainConfig, dataset: Optional[NPZSequenceDataset] = None,
        epochs: Optional[int] = None, verbose: bool = True,
        profile_dir: Optional[str] = None,
        resume_from: Optional[str] = None) -> Dict[str, Any]:
    """Train per config; returns {'state', 'history', 'best_val_loss', ...}.

    ``resume_from``: checkpoint dir — restores params + BN stats + optimizer
    + scheduler state and continues from the saved epoch (true resume; the
    reference cannot — it saves no optimizer state, SURVEY.md §5)."""
    log = print if verbose else (lambda *a, **k: None)

    if dataset is None:
        dataset = NPZSequenceDataset(cfg.npz_path, min_y=cfg.min_y,
                                     max_y=cfg.max_y,
                                     mask_threshold=cfg.mask_threshold)
    train_idx, val_idx = dataset.train_val_split(cfg.train_frac,
                                                 cfg.split_seed)
    log(f"Dataset: N={len(dataset)} T={dataset.T} {dataset.H}x{dataset.W} "
        f"-> train {len(train_idx)} / val {len(val_idx)}")
    if len(val_idx) == 0:
        raise ValueError(
            f"empty validation split (train_frac={cfg.train_frac}, "
            f"N={len(dataset)}) — lower train_frac or add data")

    mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)
    n_data = mesh.shape["data"]
    if cfg.batch_size % n_data:
        raise ValueError(f"batch {cfg.batch_size} not divisible by "
                         f"data-parallel degree {n_data}")
    if cfg.accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {cfg.accum_steps}")
    if cfg.batch_size % cfg.accum_steps:
        raise ValueError(f"batch {cfg.batch_size} not divisible by "
                         f"accum_steps {cfg.accum_steps}")
    if (cfg.batch_size // cfg.accum_steps) % n_data:
        raise ValueError(
            f"microbatch {cfg.batch_size // cfg.accum_steps} "
            f"(batch {cfg.batch_size} / accum_steps {cfg.accum_steps}) not "
            f"divisible by data-parallel degree {n_data}")

    import functools

    # ``pretrained_resolved`` is a RESTORE-path marker (set by
    # _checkpoint_config when a trained checkpoint embeds its config): it
    # tells the registry the weights already embody the pretrained init.
    # Honor it only when this fit() actually restores those weights
    # (resume_from); a fresh initialization from a copied checkpoint-meta
    # config must re-resolve real pretrained weights, or the registry's
    # never-freeze-random guard would be silently bypassed (ADVICE r4).
    # Conversely, on resume the external .pth is never needed (the
    # checkpoint supplies every weight), so resume survives its deletion.
    if resume_from:
        cfg.model.pop("pretrained_path", None)
        cfg.model["pretrained_resolved"] = True
    elif cfg.model.pop("pretrained_resolved", None):
        import warnings

        warnings.warn(
            "model config carried pretrained_resolved=True into a FRESH "
            "initialization (no resume_from) — ignoring it and re-resolving "
            "pretrained weights; that marker is only valid when checkpoint "
            "weights will overwrite the init", stacklevel=2)

    model_cfg, init_fn, apply_fn, _ = build_model(cfg.model)
    # flat_layout "auto": time-major flatten is fastest on one chip but its
    # [T,B]→[T·B] merge interleaves the sharded batch axis — XLA would
    # all-gather the full input (fwd) and output-grad (bwd) EVERY step on a
    # data mesh (the SPMD involuntary-replication class of MULTICHIP_r04).
    # Batch-major keeps every reshape device-local (models/layout.py).
    flat_layout = cfg.flat_layout
    if flat_layout == "auto":
        flat_layout = "batch" if n_data > 1 else "time"
    apply_fn = functools.partial(apply_fn, use_pallas=cfg.use_pallas,
                                 unroll=cfg.unroll, remat=cfg.remat,
                                 flat_layout=flat_layout)
    key = jax.random.PRNGKey(cfg.seed)
    with jax.default_device(jax.devices()[0]):
        variables = init_fn(key)
    variables = jax.device_put(variables, replicated_sharding(mesh))

    mask = _trainable_mask(variables["params"], cfg.model)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.grad_clip,
                        trainable_mask=mask,
                        skip_nonfinite=cfg.skip_nonfinite_updates)
    state = {"params": variables["params"], "stats": variables["stats"],
             "opt_state": tx.init(variables["params"])}

    # mesh_model>1 → tensor-parallel training: conv kernels and their AdamW
    # moments channel-sharded over 'model' (everything else replicated).
    # zero1 → additionally shard the optimizer moments over 'data' (ZeRO-1:
    # params replicated, each device owns 1/data of the AdamW state).
    from ..parallel.mesh import MeshRules

    rules = MeshRules(mesh, shard_model_channels=(mesh.shape["model"] > 1),
                      shard_opt_state_data=cfg.zero1)
    state_shard = rules.tree_sharding(state)
    state = jax.device_put(state, state_shard)

    train_step = make_train_step(
        apply_fn, tx, dataset.stats, use_mask=cfg.use_mask, mesh=mesh,
        state_sharding=state_shard,
        guard_nonfinite_stats=cfg.skip_nonfinite_updates is not None,
        accum_steps=cfg.accum_steps)
    eval_step = make_eval_step(
        apply_fn, dataset.stats, use_mask=cfg.use_mask, mesh=mesh,
        variables_sharding={"params": state_shard["params"],
                            "stats": state_shard["stats"]})
    scheduler = ReduceLROnPlateau(cfg.lr, cfg.plateau_factor,
                                  cfg.plateau_patience, min_lr=cfg.min_lr)

    guard = None
    if cfg.guard:
        from .guard import TrainingGuard

        guard = TrainingGuard(cfg.guard_spike_factor,
                              max_events=cfg.guard_max_events)

    start_epoch = 1
    best_val = float("inf")
    if resume_from:
        from .checkpoint import restore_checkpoint

        restored, meta = restore_checkpoint(resume_from,
                                            state_template=state)
        state = jax.device_put(restored, state_shard)
        if "scheduler" in meta:
            scheduler.load_state_dict(meta["scheduler"])
            state["opt_state"] = set_learning_rate(state["opt_state"],
                                                   scheduler.lr)
        if guard is not None and "guard" in meta:
            guard.load_state_dict(meta["guard"])
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_val = float(meta.get("val_loss", float("inf")))
        log(f"resumed from {resume_from} at epoch {start_epoch} "
            f"(best val {best_val:.4f}, lr {scheduler.lr:.2e})")

    if cfg.guard_snapshot not in ("device", "host"):
        raise ValueError(f"guard_snapshot must be 'device' or 'host', "
                         f"got {cfg.guard_snapshot!r}")
    # last healthy end-of-epoch (state, scheduler, epoch) for guard
    # rollback — HBM-resident copy by default, host RAM via config
    snapshot = (_snap_take(state, cfg.guard_snapshot),
                scheduler.state_dict(),
                start_epoch - 1) if guard is not None else None

    bat_shard = batch_sharding(mesh)
    train_loader = SequenceLoader(dataset, train_idx, cfg.batch_size,
                                  shuffle=True, seed=cfg.seed,
                                  drop_remainder=True)
    # resume continues the per-epoch shuffle sequence instead of replaying
    # the orders epochs 1..N already consumed
    train_loader.epoch = start_epoch - 1
    val_loader = SequenceLoader(dataset, val_idx, cfg.batch_size,
                                shuffle=False)

    tb_writer = None
    if cfg.tensorboard_dir:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(cfg.tensorboard_dir)
        except Exception as e:  # logging is best-effort
            log(f"[tensorboard] unavailable: {e}")

    model_name = cfg.model.get("type", "custom")
    history = []
    n_epochs = epochs if epochs is not None else cfg.epochs
    last_completed = start_epoch - 1   # advanced per healthy epoch
    global_step = 0
    trace_active = False

    try:
        for epoch in range(start_epoch, n_epochs + 1):
            # ---- train ----
            t0 = time.time()
            losses, sums = [], metric_sums_init()
            n_seen = 0
            for x_raw, y_raw in prefetch_to_device(train_loader, 2, bat_shard):
                if profile_dir and global_step == 10:
                    try:
                        jax.profiler.start_trace(profile_dir)
                        trace_active = True
                    except Exception as e:  # profiling is best-effort
                        log(f"[profiler] start failed: {e}")
                        profile_dir = None
                state, loss, s = train_step(state, x_raw, y_raw)
                losses.append(loss * x_raw.shape[0])
                sums = _tree_add(sums, s)
                n_seen += x_raw.shape[0]
                global_step += 1
                if trace_active and global_step >= 20:
                    try:
                        jax.profiler.stop_trace()
                    except Exception as e:
                        log(f"[profiler] stop failed: {e}")
                    trace_active = False
                    profile_dir = None
            if not losses:
                raise ValueError(
                    f"no train batches: {len(train_idx)} train samples with "
                    f"batch_size {cfg.batch_size} (drop_remainder) — lower the "
                    f"batch size or add data")
            tr_loss = float(jnp.sum(jnp.stack(losses))) / max(n_seen, 1)
            tr = metric_sums_finalize(jax.device_get(sums))
            tr_time = time.time() - t0

            # ---- eval (tail batches padded to keep shapes static/shardable) ----
            variables = {"params": state["params"], "stats": state["stats"]}
            losses, sums = [], metric_sums_init()
            n_seen = 0

            for x_np, y_np in val_loader:
                x_np, y_np, n_real = pad_batch(x_np, y_np, cfg.batch_size)
                x_raw = jax.device_put(x_np, bat_shard)
                y_raw = jax.device_put(y_np, bat_shard)
                loss, s = eval_step(variables, x_raw, y_raw, n_real)
                losses.append(loss * n_real)
                sums = _tree_add(sums, s)
                n_seen += int(n_real)
            val_loss = float(jnp.sum(jnp.stack(losses))) / max(n_seen, 1)
            va = metric_sums_finalize(jax.device_get(sums))

            # ---- failure detection: roll back a poisoned/exploded epoch ----
            if guard is not None:
                reason = guard.check(tr_loss, val_loss)
                if reason is not None:
                    try:
                        guard.record_event(epoch, reason)
                    except RuntimeError:
                        # budget exhausted: persist the LAST HEALTHY state (the
                        # snapshot — current device state is the diverged one)
                        # before propagating, so hours of training survive the
                        # exact failure case the guard exists for. Stamped with
                        # the snapshot's true epoch, the COMPOUNDED-cut LR (not
                        # the one that diverged), and a fresh rollback budget —
                        # the rescue point must be resumable-with-guard.
                        if cfg.checkpoint_dir:
                            sched_meta = dict(snapshot[1])
                            sched_meta["lr"] = max(
                                snapshot[1]["lr"]
                                * cfg.plateau_factor ** guard.consecutive,
                                cfg.min_lr)
                            save_checkpoint(
                                cfg.checkpoint_dir, f"{model_name}_last",
                                snapshot[0],
                                {"config": _checkpoint_config(cfg), "val_loss": best_val,
                                 "epoch": snapshot[2],
                                 "norm_stats": dataset.stats.to_dict(),
                                 "scheduler": sched_meta,
                                 "guard": {"recent": [], "n_events": 0,
                                           "consecutive": 0}}, wait=True)
                        raise
                    state = _snap_restore(snapshot[0], state_shard,
                                          cfg.guard_snapshot)
                    scheduler.load_state_dict(snapshot[1])
                    # compound the cut across CONSECUTIVE rollbacks — the
                    # snapshot scheduler would otherwise reset the LR and every
                    # retry would re-run the same too-high value
                    scheduler.lr = max(
                        snapshot[1]["lr"]
                        * cfg.plateau_factor ** guard.consecutive,
                        scheduler.min_lr)
                    state["opt_state"] = set_learning_rate(state["opt_state"],
                                                           scheduler.lr)
                    row = {"epoch": epoch, "lr": scheduler.lr,
                           "train_loss": tr_loss, "val_loss": val_loss,
                           "train_time_s": tr_time, "guard_event": reason}
                    history.append(row)
                    if cfg.checkpoint_dir:
                        _append_history_csv(cfg.checkpoint_dir, row,
                                            "guard_events.csv")
                    log(f"Epoch {epoch}/{n_epochs}: GUARD — {reason}; rolled "
                        f"back to last healthy state, lr -> {scheduler.lr:.2e} "
                        f"(event {guard.n_events}/{guard.max_events})")
                    continue

            lr = scheduler.step(val_loss)
            state["opt_state"] = set_learning_rate(state["opt_state"], lr)

            last_completed = epoch
            row = {"epoch": epoch, "lr": lr, "train_loss": tr_loss,
                   "val_loss": val_loss, "train_time_s": tr_time,
                   **{f"train_{k}": v for k, v in tr.items()},
                   **{f"val_{k}": v for k, v in va.items()}}
            if cfg.skip_nonfinite_updates is not None:
                from .optim import nonfinite_step_count

                row["nonfinite_steps"] = nonfinite_step_count(
                    state["opt_state"])
            history.append(row)
            if cfg.checkpoint_dir:
                _append_history_csv(cfg.checkpoint_dir, row)
            if tb_writer is not None:
                for k, v in row.items():
                    if k != "epoch":
                        tb_writer.add_scalar(k, v, epoch)
                tb_writer.flush()
            log(f"Epoch {epoch}/{n_epochs}: "
                f"Train Loss={tr_loss:.4f} MAE={tr['mae']:.4f} "
                f"RMSE={tr['rmse']:.4f} ME={tr['me']:.4f} | "
                f"Val Loss={val_loss:.4f} MAE={va['mae']:.4f} "
                f"RMSE={va['rmse']:.4f} ME={va['me']:.4f} "
                f"| lr={lr:.2e} ({tr_time:.1f}s)")

            if guard is not None:  # this epoch is healthy — new rollback point
                snapshot = (_snap_take(state, cfg.guard_snapshot),
                            scheduler.state_dict(), epoch)

            if (cfg.checkpoint_dir and cfg.save_last_every
                    and epoch % cfg.save_last_every == 0):
                # periodic crash-recovery point (async save): a cold kill
                # then resumes from here instead of the last BEST epoch
                meta = {"config": _checkpoint_config(cfg),
                        "val_loss": best_val, "epoch": epoch,
                        "norm_stats": dataset.stats.to_dict(),
                        "scheduler": scheduler.state_dict()}
                if guard is not None:
                    meta["guard"] = guard.state_dict()
                save_checkpoint(cfg.checkpoint_dir, f"{model_name}_last",
                                state, meta)

            if val_loss < best_val:
                best_val = val_loss
                if cfg.checkpoint_dir:
                    meta = {"config": _checkpoint_config(cfg), "val_loss": best_val,
                            "epoch": epoch,
                            "norm_stats": dataset.stats.to_dict(),
                            "scheduler": scheduler.state_dict()}
                    if guard is not None:
                        meta["guard"] = guard.state_dict()
                    save_checkpoint(cfg.checkpoint_dir, f"{model_name}_best",
                                    state, meta)
                    log("   -> new best; checkpoint saved")

    finally:
        # one teardown for EVERY exit (normal, guard give-up,
        # OOM, Ctrl-C): never leak an open SummaryWriter or a
        # running profiler trace
        if tb_writer is not None:
            tb_writer.close()
        if trace_active:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                log(f"[profiler] stop failed: {e}")

    if cfg.checkpoint_dir and last_completed >= start_epoch:
        # stamp the last COMPLETED epoch, never the requested horizon: a
        # resume whose start exceeds cfg.epochs runs zero epochs, and
        # overwriting the newer checkpoint with a smaller epoch number
        # would silently replay finished epochs on the next resume
        meta = {"config": _checkpoint_config(cfg), "val_loss": best_val,
                "epoch": last_completed,
                "norm_stats": dataset.stats.to_dict(),
                "scheduler": scheduler.state_dict()}
        if guard is not None:
            meta["guard"] = guard.state_dict()
        save_checkpoint(cfg.checkpoint_dir, f"{model_name}_last", state,
                        meta, wait=True)
    elif cfg.checkpoint_dir:
        log(f"no epochs ran (resumed at {start_epoch}, horizon "
            f"{n_epochs}); leaving the existing _last checkpoint alone")
    return {"state": state, "history": history, "best_val_loss": best_val,
            "mesh": mesh, "apply_fn": apply_fn, "dataset": dataset}
