"""Dataset contract + training-step integration tests (8-device CPU mesh)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
from unet_convlstm_tpu.data.pipeline import SequenceLoader
from unet_convlstm_tpu.ops.normalize import (
    compute_mask, normalize_x, normalize_y, denormalize_y,
)
from unet_convlstm_tpu.parallel.mesh import make_mesh, batch_sharding
from unet_convlstm_tpu.models.registry import build_model
from unet_convlstm_tpu.train import (
    make_optimizer, make_train_step, make_eval_step,
    ReduceLROnPlateau, set_learning_rate,
    save_checkpoint, restore_checkpoint,
)
from unet_convlstm_tpu.train.optim import get_learning_rate
from unet_convlstm_tpu.train.metrics import metric_sums_finalize


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "mm.npz"
    save_moving_mnist_npz(str(path), seq_len=4, num_samples=12,
                          image_size=32, num_digits=1, seed=0, as_xy=True)
    return str(path)


@pytest.fixture(scope="module")
def dataset(npz_path):
    return NPZSequenceDataset(npz_path)


def test_dataset_getitem_matches_device_normalize(dataset):
    """Host __getitem__ (the reference per-sample contract, train/unet.py:
    273-304) must agree with the fused on-device normalize path."""
    x_host, y_host, mask_host = dataset[3]  # NCHW
    x_raw, y_raw = dataset.get_batch_raw(np.array([3]))  # NHWC
    s = dataset.stats
    x_dev = np.moveaxis(np.asarray(normalize_x(jnp.asarray(x_raw), s))[0], -1, 1)
    y_dev = np.moveaxis(np.asarray(normalize_y(jnp.asarray(y_raw), s))[0], -1, 1)
    m_dev = np.moveaxis(np.asarray(compute_mask(jnp.asarray(x_raw), s))[0], -1, 1)
    np.testing.assert_allclose(x_host, x_dev, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(y_host, y_dev, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(mask_host, m_dev)


def test_denormalize_roundtrip_through_dataset(dataset):
    _, y_norm, _ = dataset[0]
    y_raw_back = dataset.denormalize(y_norm)
    # raw Y within clip bounds must round-trip
    y_clip = np.clip(dataset.Y[0], dataset.stats.min_vel, dataset.stats.max_vel)
    np.testing.assert_allclose(y_raw_back, y_clip, rtol=1e-4, atol=1e-4)
    # device version agrees with host version
    dev = np.asarray(denormalize_y(jnp.asarray(y_norm), dataset.stats))
    np.testing.assert_allclose(dev, y_raw_back, rtol=1e-5, atol=1e-5)


def test_split_deterministic(dataset):
    a1, b1 = dataset.train_val_split(0.8, 42)
    a2, b2 = dataset.train_val_split(0.8, 42)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
    assert len(a1) == int(0.8 * len(dataset))
    assert set(a1) | set(b1) == set(range(len(dataset)))


def test_loader_covers_all_indices(dataset):
    idx = np.arange(len(dataset))
    loader = SequenceLoader(dataset, idx, batch_size=5, shuffle=True, seed=1)
    seen = 0
    for x, y in loader:
        assert x.shape[1:] == (dataset.T, dataset.H, dataset.W, 2)
        assert y.shape[1:] == (dataset.T, dataset.H, dataset.W, 1)
        seen += x.shape[0]
    assert seen == len(dataset)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # all 8 virtual devices on 'data'


@pytest.fixture(scope="module")
def tiny_model():
    cfg_dict = {"type": "custom", "base_ch": 4, "use_skip_lstm": True,
                "use_attention": True, "lstm_layers": 1}
    cfg, init_fn, apply_fn, init_state = build_model(cfg_dict)
    variables = init_fn(jax.random.PRNGKey(0))
    return cfg, variables, apply_fn


def test_train_step_runs_and_learns(dataset, mesh, tiny_model):
    _, variables, apply_fn = tiny_model
    # the step donates its state buffers — copy so the module-scoped
    # fixture stays alive for later tests
    variables = jax.tree_util.tree_map(jnp.copy, variables)
    tx = make_optimizer(1e-2)
    state = {"params": variables["params"], "stats": variables["stats"],
             "opt_state": tx.init(variables["params"])}
    step = make_train_step(apply_fn, tx, dataset.stats, use_mask=False,
                           mesh=mesh)
    x_raw, y_raw = dataset.get_batch_raw(np.arange(8))
    shard = batch_sharding(mesh)
    x_raw = jax.device_put(x_raw, shard)
    y_raw = jax.device_put(y_raw, shard)
    losses = []
    for _ in range(4):
        state, loss, sums = step(state, x_raw, y_raw)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # one batch repeated must improve
    m = metric_sums_finalize(jax.device_get(sums))
    assert m["rmse"] >= m["mae"] >= 0


def test_eval_step_and_metrics(dataset, mesh, tiny_model):
    _, variables, apply_fn = tiny_model
    eval_step = make_eval_step(apply_fn, dataset.stats, use_mask=False,
                               mesh=mesh)
    x_raw, y_raw = dataset.get_batch_raw(np.arange(8))
    loss, sums = eval_step(variables, x_raw, y_raw, 8)
    assert np.isfinite(float(loss))
    m = metric_sums_finalize(jax.device_get(sums))
    assert m["mae"] > 0
    # padded rows carry zero weight: zero out the last row and mark 7 valid
    x_pad = np.concatenate([x_raw[:7], np.zeros_like(x_raw[:1])])
    y_pad = np.concatenate([y_raw[:7], np.zeros_like(y_raw[:1])])
    loss7, sums7 = eval_step(variables, x_pad, y_pad, 7)
    eval7 = make_eval_step(apply_fn, dataset.stats, use_mask=False)
    loss_ref, sums_ref = eval7(variables, x_raw[:7], y_raw[:7], 7)
    assert float(loss7) == pytest.approx(float(loss_ref), rel=2e-2)
    m7 = metric_sums_finalize(jax.device_get(sums7))
    mref = metric_sums_finalize(jax.device_get(sums_ref))
    assert m7["mae"] == pytest.approx(mref["mae"], rel=2e-2)
    assert m7["rmse"] == pytest.approx(mref["rmse"], rel=2e-2)


def test_plateau_scheduler_torch_semantics():
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
    assert s.step(1.0) == 1.0       # first: improvement vs inf
    assert s.step(1.0) == 1.0       # bad 1
    assert s.step(1.0) == 1.0       # bad 2
    assert s.step(1.0) == 0.5       # bad 3 > patience → decay
    assert s.step(0.5) == 0.5       # improvement resets
    assert s.step(0.6) == 0.5
    assert s.step(0.6) == 0.5
    assert s.step(0.6) == 0.25


def test_set_learning_rate_no_retrace(dataset, mesh, tiny_model):
    _, variables, apply_fn = tiny_model
    tx = make_optimizer(1e-3)
    opt_state = tx.init(variables["params"])
    assert get_learning_rate(opt_state) == pytest.approx(1e-3)
    opt_state2 = set_learning_rate(opt_state, 5e-4)
    assert get_learning_rate(opt_state2) == pytest.approx(5e-4)
    # same treedef → no recompilation of a jitted step
    assert (jax.tree_util.tree_structure(opt_state)
            == jax.tree_util.tree_structure(opt_state2))


def test_checkpoint_roundtrip(tmp_path, dataset, tiny_model):
    _, variables, apply_fn = tiny_model
    tx = make_optimizer(1e-3)
    state = {"params": variables["params"], "stats": variables["stats"],
             "opt_state": tx.init(variables["params"])}
    meta = {"config": {"type": "custom", "base_ch": 4}, "val_loss": 0.5,
            "epoch": 3, "norm_stats": dataset.stats.to_dict()}
    path = save_checkpoint(str(tmp_path), "custom_best", state, meta,
                           wait=True)
    restored, meta2 = restore_checkpoint(path, state_template=state)
    assert meta2["epoch"] == 3
    assert meta2["config"]["base_ch"] == 4
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state, restored)


def test_frozen_mask_zeroes_updates(dataset, mesh):
    """multi_transform freeze: 'encoder'-labelled params must not move."""
    from unet_convlstm_tpu.train.loop import _trainable_mask
    params = {"encoder": {"w": jnp.ones((3,))}, "head": {"w": jnp.ones((3,))}}
    mask = _trainable_mask(params, {"freeze_encoder": True})
    tx = make_optimizer(1e-1, trainable_mask=mask)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    np.testing.assert_array_equal(np.asarray(updates["encoder"]["w"]), 0.0)
    assert np.all(np.asarray(updates["head"]["w"]) != 0.0)


def test_mmap_dataset_matches_inmemory(npz_path):
    ds_mem = NPZSequenceDataset(npz_path)
    ds_map = NPZSequenceDataset(npz_path, mmap=True)
    assert ds_map.X.__class__.__name__ == "memmap"
    x1, y1 = ds_mem.get_batch_raw(np.array([0, 3]))
    x2, y2 = ds_map.get_batch_raw(np.array([0, 3]))
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)
    a, b, c = ds_mem[2]
    d, e, f = ds_map[2]
    np.testing.assert_array_equal(a, d)
    np.testing.assert_array_equal(b, e)


def test_manifest_ignored_when_norm_args_change(npz_path, tmp_path):
    """Regression: a cached stats manifest must not override changed
    normalization arguments."""
    import shutil
    p = str(tmp_path / "copy.npz")
    shutil.copy(npz_path, p)
    ds1 = NPZSequenceDataset(p)                      # writes manifest
    ds2 = NPZSequenceDataset(p, min_y=-2.0, max_y=2.0)
    assert ds2.stats.min_vel == -2.0 and ds2.stats.max_vel == 2.0
    ds3 = NPZSequenceDataset(p)                      # defaults again
    assert ds3.stats.min_vel == ds1.stats.min_vel


def test_override_none_fields():
    from unet_convlstm_tpu.train.config import TrainConfig
    cfg = TrainConfig().apply_overrides({"mesh_data": "4", "min_y": "-2.5",
                                         "max_y": "none"})
    assert cfg.mesh_data == 4 and isinstance(cfg.mesh_data, int)
    assert cfg.min_y == -2.5
    assert cfg.max_y is None


def test_grain_loader_covers_all_indices(dataset):
    pytest.importorskip("grain")
    from unet_convlstm_tpu.data.pipeline import make_grain_loader
    it = make_grain_loader(dataset, np.arange(len(dataset)), batch_size=5,
                           shuffle=True, seed=0)
    seen = 0
    for x, y in it:
        assert x.shape[1:] == (dataset.T, dataset.H, dataset.W, 2)
        assert y.shape[1:] == (dataset.T, dataset.H, dataset.W, 1)
        seen += x.shape[0]
    assert seen == len(dataset)


def test_tensorboard_logging(tmp_path, npz_path):
    pytest.importorskip("torch.utils.tensorboard")
    from unet_convlstm_tpu.train.config import TrainConfig
    from unet_convlstm_tpu.train.loop import fit
    ds = NPZSequenceDataset(npz_path)
    cfg = TrainConfig(batch_size=8, epochs=1, checkpoint_dir="",
                      tensorboard_dir=str(tmp_path / "tb"),
                      model={"type": "custom", "base_ch": 4,
                             "use_skip_lstm": False, "lstm_layers": 1})
    fit(cfg, dataset=ds, verbose=False)
    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_multi_step_matches_single_steps(dataset, mesh, tiny_model):
    """K fused steps must produce the same state/losses as K single steps.

    This pins the multi-step *mechanism* (scan threading of params/BN/opt
    state), so the comparison must not amplify compiled-program rounding
    noise: (a) f32 policy — the single-step and scan-of-steps programs fuse
    differently, so bf16 rounding differs between them; (b) SGD instead of
    AdamW — Adam's m̂/(√v̂+ε) normalization turns ~1e-7 gradient rounding
    differences into O(lr) update flips wherever gradients are near zero
    (measured: identical losses/moments to 1e-6 but params off by 1e-3).
    With SGD the equivalence is tight, and any real mechanism bug (dropped
    step, stale state) still shows up at O(lr·|g|) ≫ tolerance."""
    import functools

    import optax

    from unet_convlstm_tpu.core.dtypes import FP32_POLICY
    from unet_convlstm_tpu.train.steps import make_multi_train_step
    _, variables, apply_fn = tiny_model
    apply32 = functools.partial(apply_fn, policy=FP32_POLICY)
    x_raw, y_raw = dataset.get_batch_raw(np.arange(8))
    K = 3
    xs = np.stack([x_raw] * K)
    ys = np.stack([y_raw] * K)

    def fresh_state(tx):
        v = jax.tree_util.tree_map(jnp.copy, variables)
        return {"params": v["params"], "stats": v["stats"],
                "opt_state": tx.init(v["params"])}

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-2))
    single = make_train_step(apply32, tx, dataset.stats, use_mask=False,
                             donate=False)
    s1 = fresh_state(tx)
    losses1 = []
    for _ in range(K):
        s1, loss, _ = single(s1, jnp.asarray(x_raw), jnp.asarray(y_raw))
        losses1.append(float(loss))

    # unsharded + f32: identical math → tight match with single steps
    multi = make_multi_train_step(apply32, tx, dataset.stats,
                                  use_mask=False, mesh=None)
    s2 = fresh_state(tx)
    s2, losses2, sums = multi(s2, jnp.asarray(xs), jnp.asarray(ys))
    np.testing.assert_allclose(np.asarray(losses2), losses1,
                               rtol=1e-5, atol=1e-6)
    a = jax.tree_util.tree_leaves(s1["params"])[0]
    b = jax.tree_util.tree_leaves(s2["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)

    # sharded variant runs and converges (bf16 reduction order differs
    # slightly across shards — finite check only)
    multi_dp = make_multi_train_step(apply_fn, tx, dataset.stats,
                                     use_mask=False, mesh=mesh)
    s3 = fresh_state(tx)
    s3, losses3, _ = multi_dp(s3, jnp.asarray(xs), jnp.asarray(ys))
    assert np.isfinite(np.asarray(losses3)).all()
    assert float(losses3[-1]) < float(losses3[0])


def test_mmap_sidecars_invalidate_on_regenerated_npz(tmp_path):
    """Regenerating the npz must invalidate the .npy sidecars (mtime
    check) — stale sidecars used to silently serve the OLD arrays."""
    import os

    from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz

    npz = str(tmp_path / "d.npz")
    save_moving_mnist_npz(npz, seq_len=2, num_samples=4, image_size=32,
                          num_digits=1, seed=0, as_xy=True)
    ds1 = NPZSequenceDataset(npz, mmap=True)
    old0 = np.array(ds1.X[0])
    del ds1
    save_moving_mnist_npz(npz, seq_len=2, num_samples=4, image_size=32,
                          num_digits=1, seed=7, as_xy=True)
    # force the npz STRICTLY newer than the sidecars — a coarse-mtime
    # filesystem could stamp them equal, which counts as fresh
    newer = max(os.path.getmtime(npz + ".X.npy"),
                os.path.getmtime(npz + ".Y.npy")) + 2.0
    os.utime(npz, (newer, newer))
    os.remove(npz + ".stats.json")        # stats follow the new data too
    ds2 = NPZSequenceDataset(npz, mmap=True)
    assert not np.array_equal(np.array(ds2.X[0]), old0)


def test_grain_source_pickles_paths_not_arrays(npz_path):
    """Grain workers receive the npz PATH + stats, not the full X/Y
    arrays (pickling the dataset would copy tens of GB per worker)."""
    import pickle as _pickle

    from unet_convlstm_tpu.data.pipeline import _GrainSource

    ds = NPZSequenceDataset(npz_path)
    src = _GrainSource(ds, np.arange(4))
    blob = _pickle.dumps(src)
    # the payload must be tiny — a pickled X alone would be ~100 KB here
    assert len(blob) < 4096
    clone = _pickle.loads(blob)
    a = src[1]
    b = clone[1]
    np.testing.assert_array_equal(a["x"], b["x"])
    np.testing.assert_array_equal(a["y"], b["y"])


def test_torn_stats_manifest_recovers(tmp_path):
    """A crash mid-manifest-write must not poison every later dataset
    construction: a torn JSON is recomputed, not re-raised."""
    from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz

    npz = str(tmp_path / "d.npz")
    save_moving_mnist_npz(npz, seq_len=2, num_samples=4, image_size=32,
                          num_digits=1, seed=0, as_xy=True)
    with open(npz + ".stats.json", "w") as f:
        f.write('{"args": {"trunc')           # torn write
    ds = NPZSequenceDataset(npz)              # must not raise
    assert ds.stats.norm_const > 0


def test_zero_y_scale_falls_back_to_unit(tmp_path):
    """>99%-zero targets give percentile-99 |Y| = 0; asinh(y/0) would NaN
    every normalized target."""
    import numpy as _np

    from unet_convlstm_tpu.ops.normalize import compute_norm_stats

    X = _np.random.default_rng(0).uniform(0, 2, (4, 2, 2, 8, 8)).astype(
        _np.float32)
    Y = _np.zeros((4, 2, 1, 8, 8), _np.float32)
    Y[0, 0, 0, 0, 0] = 3.0                   # a single nonzero pixel
    stats = compute_norm_stats(X, Y)
    assert stats.y_scale == 1.0
    assert _np.isfinite(stats.trans_min) and _np.isfinite(stats.trans_max)


def test_history_csv_append_keeps_columns_aligned_across_schema_change(
        tmp_path):
    """A resume whose row schema differs (e.g. skip_nonfinite_updates
    toggled adds/removes the nonfinite_steps column) must not append
    misaligned columns: the existing header stays authoritative —
    extra keys dropped, missing keys blank."""
    import csv

    from unet_convlstm_tpu.train.loop import _append_history_csv

    d = str(tmp_path)
    _append_history_csv(d, {"epoch": 1, "train_loss": 0.5,
                            "nonfinite_steps": 0})
    # resumed run without the guard column, plus a brand-new key
    _append_history_csv(d, {"epoch": 2, "train_loss": 0.4,
                            "new_metric": 7.0})
    with open(f"{d}/history.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["1", "2"]
    assert rows[1]["train_loss"] == "0.4"
    assert rows[1]["nonfinite_steps"] == ""      # blank, not shifted
    assert "new_metric" not in rows[0] and "new_metric" not in rows[1]


def test_remat_matches_no_remat_exactly():
    """remat=True (encoder+decoder jax.checkpoint — the HBM knob that
    unlocks B=64 on the production config) must recompute the SAME ops:
    loss and gradients identical to the stored-activation path."""
    import jax
    import jax.numpy as jnp

    from unet_convlstm_tpu.core.dtypes import FP32_POLICY
    from unet_convlstm_tpu.models.temporal_unet import (
        TemporalUNetConfig, temporal_unet_apply, temporal_unet_init)

    cfg = TemporalUNetConfig(base_ch=4, use_skip_lstm=True)
    variables = temporal_unet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32, 2))
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32, 1))

    def loss(params, remat):
        out, _, _ = temporal_unet_apply(
            {"params": params, "stats": variables["stats"]}, x, cfg,
            train=True, policy=FP32_POLICY, remat=remat)
        return jnp.mean((out - y) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(
        variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(
        variables["params"])
    assert float(l0) == float(l1)
    # XLA reschedules the recomputed ops, so f32 reassociation shifts the
    # low-order bits; atol covers near-zero grads where rtol is meaningless
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)
