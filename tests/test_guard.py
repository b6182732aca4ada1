"""Failure-detection subsystem: on-device non-finite-grad skip +
epoch-level guard rollback (train/guard.py, train/optim.py).

The reference has no failure handling in training (SURVEY.md §5) — these
tests prove the two defense layers this framework adds: a poisoned batch
neither corrupts the params (step level) nor survives the epoch boundary
(guard rollback)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from unet_convlstm_tpu.train.guard import TrainingGuard
from unet_convlstm_tpu.train.optim import (
    get_learning_rate, make_optimizer, nonfinite_step_count,
    set_learning_rate)


# ---------------------------------------------------------------- optimizer


def _params():
    return {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}


def test_skip_nonfinite_rejects_nan_grads():
    params = _params()
    tx = make_optimizer(0.1, skip_nonfinite=3)
    state = tx.init(params)

    bad = {"w": jnp.full((4, 4), jnp.nan), "b": jnp.ones((4,))}
    updates, state = tx.update(bad, state, params)
    assert all(np.all(np.asarray(u) == 0.0)
               for u in jax.tree_util.tree_leaves(updates))
    assert nonfinite_step_count(state) == 1

    good = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    updates, state = tx.update(good, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0.0
    assert nonfinite_step_count(state) == 1  # total, not reset


def test_skip_nonfinite_gives_up_after_budget():
    """optax semantics: after max_consecutive_errors skipped steps the
    update is accepted — the epoch guard is the backstop."""
    params = _params()
    tx = make_optimizer(0.1, skip_nonfinite=2)
    state = tx.init(params)
    bad = {"w": jnp.full((4, 4), jnp.inf), "b": jnp.zeros((4,))}
    for i in range(3):
        updates, state = tx.update(bad, state, params)
        if i < 2:
            assert all(np.all(np.asarray(u) == 0.0)
                       for u in jax.tree_util.tree_leaves(updates))
    assert not np.isfinite(np.asarray(updates["w"])).all()


def test_lr_plumbing_through_apply_if_finite():
    """set/get_learning_rate must traverse the ApplyIfFiniteState wrapper
    (same-structure swap — no recompile of a jitted step)."""
    params = _params()
    tx = make_optimizer(1e-3, skip_nonfinite=5)
    state = tx.init(params)
    assert get_learning_rate(state) == pytest.approx(1e-3)
    state2 = set_learning_rate(state, 5e-4)
    assert get_learning_rate(state2) == pytest.approx(5e-4)
    assert (jax.tree_util.tree_structure(state)
            == jax.tree_util.tree_structure(state2))


def test_lr_plumbing_with_freeze_mask_and_wrapper():
    params = _params()
    mask = {"w": True, "b": False}
    tx = make_optimizer(1e-3, trainable_mask=mask, skip_nonfinite=5)
    state = tx.init(params)
    state = set_learning_rate(state, 2e-4)
    assert get_learning_rate(state) == pytest.approx(2e-4)


def test_skip_nonfinite_inside_jit_no_host_sync():
    """The finiteness decision is a lax.cond — the whole update must trace
    under jit (no python branching on device values)."""
    params = _params()
    tx = make_optimizer(0.1, skip_nonfinite=3)
    state = tx.init(params)

    @jax.jit
    def step(state, grads, params):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    bad = {"w": jnp.full((4, 4), jnp.nan), "b": jnp.ones((4,))}
    new_params, state = step(state, bad, params)
    np.testing.assert_array_equal(np.asarray(new_params["w"]),
                                  np.asarray(params["w"]))


# -------------------------------------------------------------- guard unit


def test_guard_passes_healthy_epochs():
    g = TrainingGuard(spike_factor=10.0)
    for v in [1.0, 0.9, 1.1, 0.8, 0.85]:
        assert g.check(v, v) is None
    assert g.recent == [1.0, 0.9, 1.1, 0.8, 0.85]


def test_guard_flags_nonfinite():
    g = TrainingGuard()
    assert "non-finite train" in g.check(float("nan"), 1.0)
    assert "non-finite val" in g.check(1.0, float("inf"))
    # unhealthy epochs must not enter the healthy window
    assert g.recent == []


def test_guard_flags_spike_relative_to_median():
    g = TrainingGuard(spike_factor=10.0, window=3)
    for v in [1.0, 1.2, 0.9]:
        assert g.check(v, v) is None
    assert g.check(0.5, 11.0) is not None   # > 10 x median(1.0)
    assert g.check(0.5, 5.0) is None        # large but under the factor


def test_guard_first_epoch_spike_cannot_trigger():
    # no healthy baseline yet -> only the non-finite check applies
    g = TrainingGuard(spike_factor=2.0)
    assert g.check(1e9, 1e9) is None


def test_guard_event_budget_raises():
    g = TrainingGuard(max_events=2)
    g.record_event(1, "x")
    g.record_event(2, "x")
    with pytest.raises(RuntimeError, match="Persistent divergence"):
        g.record_event(3, "x")


def test_guard_state_roundtrip():
    g = TrainingGuard()
    g.check(1.0, 1.0)
    g.record_event(1, "x")
    g2 = TrainingGuard()
    g2.load_state_dict(g.state_dict())
    assert g2.recent == [1.0] and g2.n_events == 1


# ------------------------------------------------------- loop integration


class _PoisonEpoch:
    """Dataset proxy: returns NaN inputs for every batch (train AND val)
    of one epoch. ``calls_per_epoch`` = train batches + val batches, since
    both loaders share this object and the loop drains train before val."""

    def __init__(self, dataset, poison_epoch: int, calls_per_epoch: int):
        self._ds = dataset
        self._poison = poison_epoch
        self._cpe = calls_per_epoch
        self._calls = 0

    def __getattr__(self, name):
        return getattr(self._ds, name)

    def __len__(self):
        return len(self._ds)

    def get_batch_raw(self, idx):
        x, y = self._ds.get_batch_raw(idx)
        epoch = self._calls // self._cpe + 1
        self._calls += 1
        if epoch == self._poison:
            x = np.full_like(x, np.nan)
        return x, y


@pytest.fixture(scope="module")
def tiny_npz(tmp_path_factory):
    from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz

    path = tmp_path_factory.mktemp("guard") / "tiny.npz"
    save_moving_mnist_npz(str(path), seq_len=3, num_samples=10,
                          image_size=32, num_digits=1, seed=0, as_xy=True)
    return str(path)


def _tiny_cfg(tiny_npz, tmp_path, **kw):
    from unet_convlstm_tpu.train.config import TrainConfig

    kw.setdefault("epochs", 5)
    return TrainConfig(
        npz_path=tiny_npz, batch_size=4, lr=1e-3,
        model={"type": "custom", "base_ch": 4, "use_skip_lstm": False,
               "lstm_layers": 1},
        checkpoint_dir=str(tmp_path / "ckpt"), unroll=1,
        mesh_data=1, train_frac=0.8, **kw)


def test_fit_guard_rolls_back_poisoned_epoch(tiny_npz, tmp_path):
    """Epoch 2's batches are all-NaN: train loss goes non-finite, the guard
    restores the epoch-1 state, cuts LR, and training finishes healthy."""
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.train.loop import fit

    cfg = _tiny_cfg(tiny_npz, tmp_path, guard=True)
    ds = NPZSequenceDataset(cfg.npz_path)
    # 8 train samples -> 2 train batches (drop_remainder), 2 val -> 1 batch
    poisoned = _PoisonEpoch(ds, poison_epoch=2, calls_per_epoch=3)
    out = fit(cfg, dataset=poisoned, verbose=False)

    events = [r for r in out["history"] if "guard_event" in r]
    assert len(events) == 1 and events[0]["epoch"] == 2
    assert "non-finite" in events[0]["guard_event"]
    healthy = [r for r in out["history"] if "guard_event" not in r]
    assert len(healthy) == 4  # epochs 1, 3, 4, 5
    assert all(np.isfinite(r["val_loss"]) for r in healthy)
    # rollback cut the LR by plateau_factor exactly once
    assert healthy[-1]["lr"] == pytest.approx(cfg.lr * cfg.plateau_factor)
    # params survived: all finite
    leaves = jax.tree_util.tree_leaves(out["state"]["params"])
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)
    assert (tmp_path / "ckpt" / "guard_events.csv").exists()
    assert np.isfinite(out["best_val_loss"])


def test_fit_skip_nonfinite_keeps_params_clean(tiny_npz, tmp_path):
    """Same poisoned epoch, step-level defense only: every NaN-grad step is
    rejected on device, so params AND BatchNorm running stats survive the
    poisoned epoch (a NaN forward must not commit running stats either —
    eval mode reads them, so one poisoned commit would make every later
    epoch's val loss NaN), and the next clean epoch evaluates finite."""
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.train.loop import fit

    cfg = _tiny_cfg(tiny_npz, tmp_path, epochs=3, skip_nonfinite_updates=100)
    ds = NPZSequenceDataset(cfg.npz_path)
    poisoned = _PoisonEpoch(ds, poison_epoch=2, calls_per_epoch=3)
    out = fit(cfg, dataset=poisoned, verbose=False)

    assert out["history"][1]["nonfinite_steps"] == 2  # both epoch-2 steps
    for part in ("params", "stats"):
        leaves = jax.tree_util.tree_leaves(out["state"][part])
        assert all(np.isfinite(np.asarray(l, np.float32)).all()
                   for l in leaves), part
    # epoch 3 (clean data again) must be fully healthy
    assert np.isfinite(out["history"][2]["val_loss"])
    assert np.isfinite(out["history"][2]["train_loss"])


def test_fit_guard_gives_up_on_persistent_failure(tiny_npz, tmp_path):
    """Every epoch poisoned -> rollback budget exhausts -> loud failure,
    not an infinite retry loop."""
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.train.loop import fit

    cfg = _tiny_cfg(tiny_npz, tmp_path, guard=True, guard_max_events=2,
                    epochs=10)
    ds = NPZSequenceDataset(cfg.npz_path)

    class _AlwaysPoison(_PoisonEpoch):
        def get_batch_raw(self, idx):
            x, y = self._ds.get_batch_raw(idx)
            return np.full_like(x, np.nan), y

    with pytest.raises(RuntimeError, match="Persistent divergence"):
        fit(cfg, dataset=_AlwaysPoison(ds, 0, 1), verbose=False)


class _PoisonEpochs(_PoisonEpoch):
    def __init__(self, dataset, poison_epochs, calls_per_epoch):
        super().__init__(dataset, 0, calls_per_epoch)
        self._poison_set = set(poison_epochs)

    def get_batch_raw(self, idx):
        x, y = self._ds.get_batch_raw(idx)
        epoch = self._calls // self._cpe + 1
        self._calls += 1
        if epoch in self._poison_set:
            x = np.full_like(x, np.nan)
        return x, y


def test_fit_guard_compounds_lr_cut_on_consecutive_failures(tiny_npz,
                                                            tmp_path):
    """Two consecutive poisoned epochs: the second rollback must cut the
    LR by factor^2 from the healthy snapshot (restoring the snapshot's
    scheduler would otherwise retry the same once-cut LR forever)."""
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.train.loop import fit

    cfg = _tiny_cfg(tiny_npz, tmp_path, guard=True, epochs=5)
    ds = NPZSequenceDataset(cfg.npz_path)
    poisoned = _PoisonEpochs(ds, {2, 3}, calls_per_epoch=3)
    out = fit(cfg, dataset=poisoned, verbose=False)

    events = [r for r in out["history"] if "guard_event" in r]
    assert [e["epoch"] for e in events] == [2, 3]
    assert events[0]["lr"] == pytest.approx(cfg.lr * cfg.plateau_factor)
    assert events[1]["lr"] == pytest.approx(cfg.lr * cfg.plateau_factor**2)
    healthy = [r for r in out["history"] if "guard_event" not in r]
    # epochs 4-5 run at the compounded LR; epoch 4's healthy check resets
    # the consecutive counter
    assert healthy[-1]["lr"] == pytest.approx(cfg.lr * cfg.plateau_factor**2)
    assert all(np.isfinite(r["val_loss"]) for r in healthy)


def test_guard_snapshot_device_matches_host(tiny_npz, tmp_path):
    """The HBM-resident rollback snapshot (guard_snapshot='device', the
    default — a device copy instead of a ~45 s/epoch full-state
    device_get through the TPU tunnel) must be behaviorally identical to
    the host-RAM path: same guard events, same final params bit-for-bit."""
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.train.loop import fit

    outs = {}
    for mode in ("device", "host"):
        cfg = _tiny_cfg(tiny_npz, tmp_path / mode, guard=True, epochs=4,
                        guard_snapshot=mode)
        ds = NPZSequenceDataset(cfg.npz_path)
        poisoned = _PoisonEpoch(ds, poison_epoch=2, calls_per_epoch=3)
        outs[mode] = fit(cfg, dataset=poisoned, verbose=False)

    ev_d = [r["epoch"] for r in outs["device"]["history"]
            if "guard_event" in r]
    ev_h = [r["epoch"] for r in outs["host"]["history"]
            if "guard_event" in r]
    assert ev_d == ev_h == [2]
    pd = jax.tree_util.tree_leaves(outs["device"]["state"]["params"])
    ph = jax.tree_util.tree_leaves(outs["host"]["state"]["params"])
    for a, b in zip(pd, ph):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_guard_snapshot_bad_value_rejected(tiny_npz, tmp_path):
    from unet_convlstm_tpu.train.loop import fit

    cfg = _tiny_cfg(tiny_npz, tmp_path, guard=True,
                    guard_snapshot="hbm")
    with pytest.raises(ValueError, match="guard_snapshot"):
        fit(cfg, verbose=False)
