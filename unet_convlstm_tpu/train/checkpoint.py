"""Checkpointing — Orbax, with config embedded beside the state.

Capability parity and upgrades vs. the reference:

* The reference ``torch.save``s ``{model_state, config, val_loss, epoch}``
  only on a new best val loss (main.py:307-323) and never saves optimizer or
  scheduler state — no true resume (SURVEY.md §5). Here every checkpoint
  carries params + BatchNorm stats + optimizer state + plateau-scheduler
  state + normalization manifest, so training resumes exactly.
* The embedded config keeps the reference's dispatch-on-load capability
  (get_metrics.py:67-90): ``restore_checkpoint`` + ``models.build_model``
  reconstructs the right model from the checkpoint alone.
* Saves are async (Orbax AsyncCheckpointer) so the chips keep training while
  the host serializes.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


_CKPTR: Optional[ocp.AsyncCheckpointer] = None
# (state_next, state_final, meta_tmp, meta_final) — one PAIRED entry per
# save, applied FIFO after the async Orbax commit. The state swap runs
# before its meta promote, and the meta promote is conditional on the
# swap: a save whose Orbax commit failed leaves no ``state.next``, and
# its staged ``meta.json.next`` must then be DROPPED, not promoted —
# otherwise the old state gets relabeled with the new save's metadata.
_PENDING_META: list = []


def _checkpointer() -> ocp.AsyncCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _CKPTR


def _finalize_pending_meta() -> None:
    import shutil

    while _PENDING_META:
        state_next, state_final, meta_tmp, meta_final = _PENDING_META.pop(0)
        if os.path.isdir(state_next):
            # the new state is fully committed under ``state.next`` —
            # only now may the previous ``state`` be replaced, and only
            # a completed swap earns the paired metadata promote
            if os.path.isdir(state_final):
                shutil.rmtree(state_final)
            os.rename(state_next, state_final)
            if os.path.exists(meta_tmp):
                os.replace(meta_tmp, meta_final)
        elif os.path.exists(meta_tmp):
            # the paired state never committed (failed/aborted save) —
            # the staged metadata describes a state that does not exist
            os.remove(meta_tmp)


def _recover_staged_state(path: str) -> None:
    """Cross-process crash recovery: a committed-but-never-swapped
    ``state.next`` (the process died between the Orbax commit and the
    swap) is rolled forward so the newest durable save wins. The rename
    bumps the ``state`` dir's ctime, which makes the metadata adoption
    logic below pair it with its staged ``meta.json.next``."""
    import shutil

    state_final = os.path.join(path, "state")
    state_next = state_final + ".next"
    if os.path.isdir(state_next):
        if os.path.isdir(state_final):
            shutil.rmtree(state_final)
        os.rename(state_next, state_final)


def save_checkpoint(ckpt_dir: str, name: str, state: Dict[str, Any],
                    metadata: Dict[str, Any], wait: bool = False) -> str:
    """Write ``state`` (params/stats/opt_state pytree) under
    ``ckpt_dir/name`` plus a ``meta.json`` (config, epoch, val_loss,
    norm_stats, scheduler).

    Crash consistency: the state save is async, Orbax-atomic, and — since
    round 3 — STAGED: it writes to ``state.next`` and the previous
    ``state`` is replaced only after the new one is fully committed (an
    unstaged ``force=True`` save deletes the old state before the new one
    exists, so a kill mid-save destroyed the only copy — observed live
    2026-08-18). The new metadata is staged as ``meta.json.next`` BEFORE
    the state save starts, so the state swap (a rename, which bumps the
    ``state`` dir's ctime) is always strictly newer than its staged
    metadata. ``restore_checkpoint`` uses that ordering to decide whether
    a never-finalized ``.next`` belongs to the committed state (crash
    after commit → adopt it) or to an aborted save (crash before commit →
    keep the old ``meta.json``), closing the stale-metadata window for
    ``wait=False`` saves that advisor round 1 flagged."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(path, exist_ok=True)
    ckptr = _checkpointer()
    # The previous async save must commit before a new one starts (Orbax
    # would serialize them anyway); waiting here lets us finalize earlier
    # staged metadata without adding steady-state blocking.
    ckptr.wait_until_finished()
    _finalize_pending_meta()
    meta_final = os.path.join(path, "meta.json")
    meta_tmp = meta_final + ".next"
    with open(meta_tmp, "w") as f:
        json.dump(metadata, f, indent=2, default=float)
        f.flush()
        os.fsync(f.fileno())
    state_final = os.path.join(path, "state")
    state_next = state_final + ".next"
    _PENDING_META.append((state_next, state_final, meta_tmp, meta_final))
    # force=True only ever clears a stale ``state.next`` leftover — the
    # live ``state`` is untouched until the swap above runs post-commit
    ckptr.save(state_next, args=ocp.args.StandardSave(state), force=True)
    if wait:
        ckptr.wait_until_finished()
        _finalize_pending_meta()
    return path


def wait_for_saves() -> None:
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()
    _finalize_pending_meta()


# Structural key renames (new -> legacy): transposed-conv kernels gained
# the "wt" layout tag in round 3; checkpoints written before that store
# them as plain "w" (and int8 exports as "w_q"/"w_s"). The rename applies
# uniformly to every dict level, so optimizer-state trees that mirror the
# param structure (optax mu/nu) migrate too.
_LEGACY_KEY_RENAMES = {"wt": "w", "wt_q": "w_q", "wt_s": "w_s"}


def _rename_to_legacy_keys(tree):
    """Rewrite every new-style key to its legacy name; returns
    (renamed_tree, n_renames)."""
    if isinstance(tree, dict):
        out, n = {}, 0
        for k, v in tree.items():
            nk = _LEGACY_KEY_RENAMES.get(k, k)
            if nk != k:
                n += 1
            child, cn = _rename_to_legacy_keys(v)
            out[nk] = child
            n += cn
        return out, n
    if isinstance(tree, (list, tuple)):
        children = [_rename_to_legacy_keys(v) for v in tree]
        n = sum(cn for _, cn in children)
        vals = [c for c, _ in children]
        if isinstance(tree, tuple):
            cls = type(tree)
            return (cls(*vals) if hasattr(cls, "_fields")
                    else cls(vals)), n
        return vals, n
    return tree, 0


def _align_to_template(restored, template):
    """Rename legacy keys in ``restored`` back to the names ``template``
    uses, guided position-by-position by the template (so a genuine "w"
    conv kernel is never touched)."""
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            rk = k if k in restored else _LEGACY_KEY_RENAMES.get(k, k)
            out[k] = _align_to_template(restored[rk], v)
        return out
    if isinstance(template, (list, tuple)):
        vals = [_align_to_template(r, t) for r, t in zip(restored, template)]
        if isinstance(template, tuple):
            cls = type(template)
            return cls(*vals) if hasattr(cls, "_fields") else cls(vals)
        return vals
    return restored


def restore_checkpoint(path: str,
                       state_template: Optional[Dict[str, Any]] = None
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (state, metadata). With a template the state restores with the
    exact pytree structure/dtypes (required for optax namedtuple states);
    without one it restores as nested dicts (fine for params-only use).

    Checkpoints written before the structural "wt" rename restore
    transparently: on a tree-structure mismatch the restore retries with
    the legacy key names and the result is renamed back to the template's
    (new) names, so ``--resume`` and ``convert-checkpoint`` keep working
    across the rename."""
    path = os.path.abspath(path)
    _checkpointer().wait_until_finished()
    _finalize_pending_meta()
    _recover_staged_state(path)
    ckptr = ocp.StandardCheckpointer()
    if state_template is not None:
        # read metadata only — np.asarray would device-transfer every leaf
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                np.shape(x), getattr(x, "dtype", None)
                or np.asarray(x).dtype),
            state_template)
        try:
            state = ckptr.restore(os.path.join(path, "state"),
                                  target=abstract)
        except Exception:
            legacy_abstract, n_renamed = _rename_to_legacy_keys(abstract)
            if n_renamed == 0:
                raise  # no legacy rename applies — a genuine mismatch
            state = ckptr.restore(os.path.join(path, "state"),
                                  target=legacy_abstract)
            state = _align_to_template(state, state_template)
    else:
        state = ckptr.restore(os.path.join(path, "state"))
    meta_path = os.path.join(path, "meta.json")
    next_path = meta_path + ".next"
    if os.path.exists(next_path):
        if not os.path.exists(meta_path):
            # first save crashed after the state commit (the restore above
            # proves a commit happened) — the staged meta is the match
            meta_path = next_path
        else:
            # Staging happens before the state save starts, and the Orbax
            # commit renames the `state` dir (bumping its ctime). So:
            # commit-after-staging  => crash happened post-commit, the
            # `.next` describes the restored state — adopt (finalize) it;
            # commit-before-staging => the save that staged `.next` never
            # committed, `meta.json` still matches — drop the orphan.
            state_ctime = os.stat(os.path.join(path, "state")).st_ctime_ns
            if state_ctime >= os.stat(next_path).st_mtime_ns:
                os.replace(next_path, meta_path)
            else:
                os.remove(next_path)
    with open(meta_path) as f:
        metadata = json.load(f)
    return state, metadata


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Most recently written checkpoint directory (by meta.json mtime)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_t = None, -1.0
    for name in os.listdir(ckpt_dir):
        for meta_name in ("meta.json", "meta.json.next"):
            meta = os.path.join(ckpt_dir, name, meta_name)
            if os.path.exists(meta):
                t = os.path.getmtime(meta)
                if t > best_t:
                    best, best_t = os.path.join(ckpt_dir, name), t
    return best
