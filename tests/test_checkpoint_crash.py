"""Crash-consistency of checkpoint metadata (advisor round-1, medium).

``save_checkpoint(wait=False)`` stages ``meta.json.next`` before the async
Orbax state save starts and only finalizes it later. If the process dies
in between, a later restore (in a NEW process, so the in-process pending
list is gone) must pair the restored state with the RIGHT metadata:

* crash after the state commit  -> adopt the staged ``.next``
* crash before the state commit -> keep the old ``meta.json`` and drop
  the orphaned ``.next``
"""

import json
import os

import numpy as np

from unet_convlstm_tpu.train import checkpoint as ckpt_mod
from unet_convlstm_tpu.train.checkpoint import (
    latest_checkpoint, restore_checkpoint, save_checkpoint)


def _state(v):
    return {"params": {"w": np.full((2, 2), float(v), np.float32)}}


def _simulate_process_death():
    """Forget staged metadata exactly like a dead process would."""
    ckpt_mod._PENDING_META.clear()


def test_crash_after_commit_adopts_staged_meta(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, "m", _state(1), {"epoch": 1}, wait=True)

    # second (best-style, async) save: state 2 commits, meta never finalized
    save_checkpoint(d, "m", _state(2), {"epoch": 2}, wait=False)
    ckpt_mod._checkpointer().wait_until_finished()  # Orbax commit done
    _simulate_process_death()
    assert os.path.exists(os.path.join(d, "m", "meta.json.next"))
    with open(os.path.join(d, "m", "meta.json")) as f:
        assert json.load(f)["epoch"] == 1  # stale on disk — the bug window

    state, meta = restore_checkpoint(os.path.join(d, "m"))
    assert meta["epoch"] == 2  # paired with the committed state 2
    assert float(np.asarray(state["params"]["w"]).ravel()[0]) == 2.0
    assert not os.path.exists(os.path.join(d, "m", "meta.json.next"))


def test_crash_before_commit_keeps_old_meta(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, "m", _state(1), {"epoch": 1}, wait=True)

    # a save that staged metadata but whose state commit never happened
    next_path = os.path.join(d, "m", "meta.json.next")
    with open(next_path, "w") as f:
        json.dump({"epoch": 2}, f)
    _simulate_process_death()

    state, meta = restore_checkpoint(os.path.join(d, "m"))
    assert meta["epoch"] == 1  # state 1 on disk -> meta 1 is the match
    assert float(np.asarray(state["params"]["w"]).ravel()[0]) == 1.0
    assert not os.path.exists(next_path)  # orphan cleaned up


def test_crash_on_first_save_uses_staged_meta(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, "m", _state(1), {"epoch": 1}, wait=False)
    ckpt_mod._checkpointer().wait_until_finished()
    _simulate_process_death()
    assert not os.path.exists(os.path.join(d, "m", "meta.json"))

    assert latest_checkpoint(d) == os.path.join(d, "m")  # .next counts
    state, meta = restore_checkpoint(os.path.join(d, "m"))
    assert meta["epoch"] == 1


def test_save_never_destroys_old_state_before_commit(tmp_path, monkeypatch):
    """Round-3 durability fix: the previous `state` must survive a save
    that dies before its Orbax commit. The old force=True protocol
    deleted `state` first and wrote its replacement after — a kill in
    between destroyed the only copy (observed live 2026-08-18: a
    SIGTERM'd resume left only `state.orbax-checkpoint-tmp`)."""
    d = str(tmp_path)
    save_checkpoint(d, "m", _state(1), {"epoch": 1}, wait=True)

    def boom(*a, **k):
        raise RuntimeError("simulated death before commit")

    monkeypatch.setattr(ckpt_mod._checkpointer(), "save", boom)
    try:
        save_checkpoint(d, "m", _state(2), {"epoch": 2}, wait=False)
    except RuntimeError:
        pass
    _simulate_process_death()

    state, meta = restore_checkpoint(os.path.join(d, "m"))
    assert meta["epoch"] == 1
    assert float(np.asarray(state["params"]["w"]).ravel()[0]) == 1.0


def test_failed_save_in_live_process_never_promotes_its_meta(tmp_path,
                                                             monkeypatch):
    """Round-3 review finding (reproduced live): a save whose Orbax commit
    raises leaves its staged ``meta.json.next`` and pending entries behind
    in a process that KEEPS RUNNING; the next finalize pass (another save,
    wait_for_saves, or restore) must drop that orphan instead of promoting
    new metadata over the old state — which made restore return epoch-1
    params labeled epoch 2."""
    d = str(tmp_path)
    save_checkpoint(d, "m", _state(1), {"epoch": 1}, wait=True)

    def boom(*a, **k):
        raise RuntimeError("simulated serialization failure")

    ckptr = ckpt_mod._checkpointer()
    monkeypatch.setattr(ckptr, "save", boom)
    try:
        save_checkpoint(d, "m", _state(2), {"epoch": 2}, wait=False)
    except RuntimeError:
        pass
    monkeypatch.undo()  # process recovers and carries on

    # any later finalize pass — here the explicit drain — must pair-check
    ckpt_mod.wait_for_saves()
    state, meta = restore_checkpoint(os.path.join(d, "m"))
    assert meta["epoch"] == 1
    assert float(np.asarray(state["params"]["w"]).ravel()[0]) == 1.0
    assert not os.path.exists(os.path.join(d, "m", "meta.json.next"))

    # and a subsequent healthy save still works end-to-end
    save_checkpoint(d, "m", _state(3), {"epoch": 3}, wait=True)
    state, meta = restore_checkpoint(os.path.join(d, "m"))
    assert meta["epoch"] == 3
    assert float(np.asarray(state["params"]["w"]).ravel()[0]) == 3.0


def test_crash_between_commit_and_swap_rolls_forward(tmp_path):
    """Process dies AFTER the new state committed to `state.next` but
    BEFORE the swap: restore must adopt the newer committed pair."""
    d = str(tmp_path)
    save_checkpoint(d, "m", _state(1), {"epoch": 1}, wait=True)

    # save 2 commits; simulate death before _finalize applies the swap
    save_checkpoint(d, "m", _state(2), {"epoch": 2}, wait=False)
    ckpt_mod._checkpointer().wait_until_finished()
    _simulate_process_death()
    m = os.path.join(d, "m")
    assert os.path.isdir(os.path.join(m, "state.next"))  # committed
    assert os.path.isdir(os.path.join(m, "state"))       # old survives

    state, meta = restore_checkpoint(m)
    assert meta["epoch"] == 2
    assert float(np.asarray(state["params"]["w"]).ravel()[0]) == 2.0
    assert not os.path.exists(os.path.join(m, "state.next"))
