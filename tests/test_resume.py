"""True-resume test: params, optimizer, scheduler and epoch all restore."""

import os

import numpy as np
import jax
import pytest

from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
from unet_convlstm_tpu.train.config import TrainConfig
from unet_convlstm_tpu.train.loop import fit


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    npz = str(root / "mm.npz")
    save_moving_mnist_npz(npz, seq_len=3, num_samples=12, image_size=32,
                          num_digits=1, seed=0, as_xy=True)
    return root, NPZSequenceDataset(npz)


def _cfg(root, npz_path, ckpt):
    return TrainConfig(npz_path=npz_path, batch_size=8, epochs=2,
                       checkpoint_dir=str(root / ckpt),
                       model={"type": "custom", "base_ch": 4,
                              "use_skip_lstm": False, "lstm_layers": 1})


def test_resume_continues_training(setup):
    root, dataset = setup
    cfg = _cfg(root, "", "a")
    r1 = fit(cfg, dataset=dataset, verbose=False)
    last = os.path.join(cfg.checkpoint_dir, "custom_last")
    assert os.path.isdir(last)

    cfg2 = _cfg(root, "", "a")
    cfg2.epochs = 4
    r2 = fit(cfg2, dataset=dataset, verbose=False, resume_from=last)
    epochs_run = [row["epoch"] for row in r2["history"]]
    assert epochs_run == [3, 4]  # continued, not restarted

    # params actually moved on from the restored point
    p1 = jax.tree_util.tree_leaves(r1["state"]["params"])[0]
    p2 = jax.tree_util.tree_leaves(r2["state"]["params"])[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))

    # history.csv accumulated all four epochs
    with open(os.path.join(cfg.checkpoint_dir, "history.csv")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 1 + 4  # header + 2 + 2 epochs


def test_restore_pre_rename_checkpoint_with_new_template(setup):
    """Checkpoints saved before the structural 'wt' rename (transposed
    kernels keyed 'w', mirrored through the optax mu/nu trees) must restore
    against a new-style template — the retry path in restore_checkpoint."""
    from unet_convlstm_tpu.train.checkpoint import (
        _rename_to_legacy_keys, restore_checkpoint, save_checkpoint)

    root, dataset = setup
    cfg = _cfg(root, "", "legacy_src")
    cfg.epochs = 1
    state = fit(cfg, dataset=dataset, verbose=False)["state"]

    legacy_state, n = _rename_to_legacy_keys(state)
    assert n > 0  # 'wt' leaves exist in params AND optimizer mirrors
    save_checkpoint(str(root), "legacy_ckpt", legacy_state,
                    {"epoch": 1}, wait=True)
    restored, meta = restore_checkpoint(
        os.path.join(str(root), "legacy_ckpt"), state_template=state)
    assert meta["epoch"] == 1
    assert (jax.tree_util.tree_structure(restored)
            == jax.tree_util.tree_structure(state))
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_elastic_resume_across_mesh_sizes(setup):
    """Elastic recovery: a checkpoint trained on one mesh resumes on a
    DIFFERENT device count/topology (8-way DP -> 2x2 DP+TP -> 1 device).
    Checkpoints are device-layout-agnostic (host pytrees); fit re-shards
    on restore, so losing or gaining chips between runs just works."""
    root, dataset = setup

    cfg = _cfg(root, "", "elastic")
    cfg.mesh_data = 8                       # full virtual slice
    r1 = fit(cfg, dataset=dataset, verbose=False)
    last = os.path.join(cfg.checkpoint_dir, "custom_last")

    cfg2 = _cfg(root, "", "elastic2")
    cfg2.epochs, cfg2.mesh_data, cfg2.mesh_model = 3, 2, 2  # fewer+TP
    r2 = fit(cfg2, dataset=dataset, verbose=False, resume_from=last)
    assert [row["epoch"] for row in r2["history"]] == [3]

    cfg3 = _cfg(root, "", "elastic3")
    cfg3.epochs, cfg3.mesh_data = 4, 1      # down to a single device
    r3 = fit(cfg3, dataset=dataset, verbose=False, resume_from=last)
    assert [row["epoch"] for row in r3["history"]] == [3, 4]
    assert np.isfinite(r3["best_val_loss"])
    # same restored state: epoch-3 losses agree across mesh shapes (f32
    # noise only; bf16 policy -> loose-ish tolerance)
    assert r2["history"][0]["val_loss"] == pytest.approx(
        r3["history"][0]["val_loss"], rel=2e-2)


def test_resume_past_horizon_keeps_newer_checkpoint(setup):
    """Resuming a checkpoint whose epoch already exceeds cfg.epochs runs
    zero epochs — and must NOT overwrite the newer _last checkpoint with
    a smaller epoch stamp (the next resume would silently replay finished
    epochs against already-advanced weights)."""
    import json

    root, dataset = setup
    cfg = _cfg(root, "", "h")
    fit(cfg, dataset=dataset, verbose=False)          # epochs 1-2
    last = os.path.join(cfg.checkpoint_dir, "custom_last")
    with open(os.path.join(last, "meta.json")) as f:
        assert json.load(f)["epoch"] == 2

    cfg2 = _cfg(root, "", "h")
    cfg2.epochs = 1                                    # horizon < resumed
    r = fit(cfg2, dataset=dataset, verbose=False, resume_from=last)
    assert r["history"] == []                          # nothing ran
    with open(os.path.join(last, "meta.json")) as f:
        assert json.load(f)["epoch"] == 2              # not regressed to 1


def test_save_last_every_periodic_checkpoints(setup, monkeypatch):
    """TrainConfig.save_last_every=N refreshes the `_last` checkpoint
    every N healthy epochs (async, staged) — so a cold kill mid-run
    resumes from the last periodic point instead of rewinding to the
    last BEST epoch (round 5; the endurance drive
    scripts/run_endurance_200ep.py exercises the real-kill path)."""
    root, dataset = setup
    import unet_convlstm_tpu.train.loop as loop_mod

    calls = []
    real_save = loop_mod.save_checkpoint

    def spy(ckpt_dir, name, state, meta, wait=False):
        calls.append((name, int(meta.get("epoch", -1))))
        return real_save(ckpt_dir, name, state, meta, wait=wait)

    monkeypatch.setattr(loop_mod, "save_checkpoint", spy)
    cfg = _cfg(root, "", "periodic")
    cfg.epochs = 5
    cfg.save_last_every = 2
    fit(cfg, dataset=dataset, verbose=False)
    last_epochs = [ep for name, ep in calls if name == "custom_last"]
    # periodic at 2 and 4, final at 5
    assert last_epochs == [2, 4, 5], (calls,)
