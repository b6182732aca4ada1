"""Gradient accumulation (``accum_steps``) — effective batch B at the HBM
footprint of B/K. The reference has no equivalent (fixed BATCH_SIZE=32,
main.py:215); this is the framework's third answer to the B=64 HBM question
(docs/PERF.md: resident B=64 OOMs, remat fits-but-loses)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from unet_convlstm_tpu.core.dtypes import FP32_POLICY
from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
from unet_convlstm_tpu.models.registry import build_model
from unet_convlstm_tpu.ops.losses import compute_loss
from unet_convlstm_tpu.ops.normalize import (compute_mask, normalize_x,
                                             normalize_y)
from unet_convlstm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                             replicated_sharding)
from unet_convlstm_tpu.train import make_optimizer, make_train_step
from unet_convlstm_tpu.train.metrics import metric_sums_finalize


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "mm.npz"
    save_moving_mnist_npz(str(path), seq_len=3, num_samples=8,
                          image_size=32, num_digits=1, seed=7, as_xy=True)
    return str(path)


@pytest.fixture(scope="module")
def dataset(npz_path):
    return NPZSequenceDataset(npz_path)


@pytest.fixture(scope="module")
def tiny_model():
    cfg_dict = {"type": "custom", "base_ch": 4, "use_skip_lstm": False,
                "use_attention": False, "lstm_layers": 1}
    _, init_fn, apply_fn, _ = build_model(cfg_dict)
    variables = init_fn(jax.random.PRNGKey(0))
    apply32 = functools.partial(apply_fn, policy=FP32_POLICY)
    return variables, apply32


def _fresh_state(variables, tx):
    v = jax.tree_util.tree_map(jnp.copy, variables)
    return {"params": v["params"], "stats": v["stats"],
            "opt_state": tx.init(v["params"])}


def test_accum_step_matches_manual_grad_average(dataset, tiny_model):
    """accum_steps=2 must equal the hand-rolled definition: two microbatch
    gradients at the SAME params (BN running stats threaded sequentially),
    averaged, then ONE optimizer update. Microbatch k = STRIDED rows
    {k, k+K, …} — the sharding-stable grouping ``to_micro`` documents
    (device-count-independent, so this manual reference is exact on any
    mesh too). f32 + SGD so the match is exact-ish rather than bf16-loose
    (rtol 1e-4 like the DP/TP equivalence tests: the scanned body
    schedules f32 reductions differently from the unscanned reference)."""
    variables, apply32 = tiny_model
    tx = optax.sgd(1e-2)
    x_raw, y_raw = dataset.get_batch_raw(np.arange(4))
    stats = dataset.stats

    step = make_train_step(apply32, tx, stats, use_mask=False,
                           accum_steps=2, donate=False)
    state = _fresh_state(variables, tx)
    new_state, loss, sums = step(state, jnp.asarray(x_raw),
                                 jnp.asarray(y_raw))

    # manual reference
    def loss_fn(params, bn, x, y, mask):
        y_pred, _, new_bn = apply32({"params": params, "stats": bn},
                                    x, train=True)
        return compute_loss(y_pred, y, mask, use_mask=False), new_bn

    ref = _fresh_state(variables, tx)
    bn = ref["stats"]
    gsum, losses = None, []
    for mb in (slice(0, None, 2), slice(1, None, 2)):
        x = normalize_x(jnp.asarray(x_raw[mb]), stats)
        y = normalize_y(jnp.asarray(y_raw[mb]), stats)
        mask = compute_mask(jnp.asarray(x_raw[mb]), stats)
        (mb_loss, bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ref["params"], bn, x, y, mask)
        losses.append(float(mb_loss))
        gsum = grads if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, grads)
    grads = jax.tree_util.tree_map(lambda g: g / 2.0, gsum)
    updates, _ = tx.update(grads, ref["opt_state"], ref["params"])
    p_ref = optax.apply_updates(ref["params"], updates)

    assert float(loss) == pytest.approx(np.mean(losses), rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-5),
        jax.device_get(new_state["params"]), jax.device_get(p_ref))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-5),
        jax.device_get(new_state["stats"]), jax.device_get(bn))
    m = metric_sums_finalize(jax.device_get(sums))
    assert m["rmse"] >= m["mae"] > 0


def test_accum_step_dp_matches_single_device(dataset, tiny_model):
    """The accumulation scan composes with DP batch sharding: the strided
    microbatch split keeps the 'data'-sharded batch axis intact (no
    resharding) and the gradient psum fires per microbatch. 2-device
    mesh ≡ single device — exact, because the strided grouping is
    device-count-independent (same microbatch contents and order)."""
    variables, apply32 = tiny_model
    tx = optax.sgd(1e-2)
    x_raw, y_raw = dataset.get_batch_raw(np.arange(4))
    stats = dataset.stats

    def run(mesh):
        state = _fresh_state(variables, tx)
        if mesh is not None:
            state = jax.device_put(state, replicated_sharding(mesh))
            x = jax.device_put(x_raw, batch_sharding(mesh))
            y = jax.device_put(y_raw, batch_sharding(mesh))
        else:
            x, y = jnp.asarray(x_raw), jnp.asarray(y_raw)
        step = make_train_step(apply32, tx, stats, use_mask=False,
                               mesh=mesh, accum_steps=2)
        state, loss, _ = step(state, x, y)
        return jax.device_get(state["params"]), float(loss)

    p_one, loss_one = run(None)
    p_dp, loss_dp = run(make_mesh(data=2, devices=jax.devices()[:2]))
    assert loss_dp == pytest.approx(loss_one, rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-6),
        p_dp, p_one)


def test_accum_guard_skips_nonfinite_microbatch_batch(dataset, tiny_model):
    """A NaN batch under skip_nonfinite + accumulation must leave params,
    moments AND BatchNorm running stats untouched (the accumulated gradient
    is non-finite whenever any microbatch's is)."""
    variables, apply32 = tiny_model
    tx = make_optimizer(1e-2, skip_nonfinite=10)
    x_raw, y_raw = dataset.get_batch_raw(np.arange(4))
    y_bad = np.asarray(y_raw).copy()
    y_bad[3] = np.nan  # poisons the second microbatch only

    step = make_train_step(apply32, tx, dataset.stats, use_mask=False,
                           accum_steps=2, donate=False,
                           guard_nonfinite_stats=True)
    state = _fresh_state(variables, tx)
    new_state, loss, _ = step(state, jnp.asarray(x_raw), jnp.asarray(y_bad))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)),
        jax.device_get(new_state["params"]),
        jax.device_get(jax.tree_util.tree_map(jnp.copy,
                                              variables)["params"]))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)),
        jax.device_get(new_state["stats"]),
        jax.device_get(variables["stats"]))


def test_fit_with_accum_steps(npz_path, tmp_path):
    """End-to-end: the config knob through fit() — 2 epochs with
    accum_steps=2 train to finite losses and write checkpoints."""
    from unet_convlstm_tpu.train.config import TrainConfig
    from unet_convlstm_tpu.train.loop import fit

    cfg = TrainConfig(npz_path=npz_path, epochs=2, batch_size=4,
                      accum_steps=2, lr=1e-3, mesh_data=1,
                      checkpoint_dir=str(tmp_path / "ck"),
                      model={"type": "custom", "base_ch": 4,
                             "use_skip_lstm": False,
                             "use_attention": False, "lstm_layers": 1})
    result = fit(cfg)
    assert np.isfinite(result["best_val_loss"])
    assert (tmp_path / "ck").exists()


def test_accum_config_validation(npz_path, tmp_path):
    from unet_convlstm_tpu.train.config import TrainConfig
    from unet_convlstm_tpu.train.loop import fit

    cfg = TrainConfig(npz_path=npz_path, epochs=1, batch_size=4,
                      accum_steps=3, mesh_data=1,
                      checkpoint_dir=str(tmp_path / "ck2"))
    with pytest.raises(ValueError, match="accum_steps"):
        fit(cfg)


def test_multi_step_composes_with_accum(dataset, tiny_model):
    """make_multi_train_step(accum_steps=2) ≡ K sequential accumulation
    steps (ADVICE r3: K-step dispatch and gradient accumulation must
    compose, not silently exclude each other)."""
    variables, apply32 = tiny_model
    from unet_convlstm_tpu.train.steps import make_multi_train_step

    tx = optax.sgd(1e-2)
    x_raw, y_raw = dataset.get_batch_raw(np.arange(4))
    stats = dataset.stats
    K = 2

    single = make_train_step(apply32, tx, stats, use_mask=False,
                             accum_steps=2, donate=False)
    s1 = _fresh_state(variables, tx)
    losses1 = []
    for _ in range(K):
        s1, loss, _ = single(s1, jnp.asarray(x_raw), jnp.asarray(y_raw))
        losses1.append(float(loss))

    multi = make_multi_train_step(apply32, tx, stats, use_mask=False,
                                  accum_steps=2)
    s2 = _fresh_state(variables, tx)
    xs = jnp.asarray(np.stack([x_raw] * K))
    ys = jnp.asarray(np.stack([y_raw] * K))
    s2, losses2, _ = multi(s2, xs, ys)
    np.testing.assert_allclose(np.asarray(losses2), losses1,
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-5),
        jax.device_get(s1["params"]), jax.device_get(s2["params"]))


def test_accum_dp_mesh_no_involuntary_replication(dataset, tiny_model,
                                                  capfd):
    """VERDICT r4 #1 'done' criterion: compiling the accumulation step on
    the full 8-device mesh must produce (a) no SPMD 'Involuntary full
    rematerialization' warning — the partitioner fallback that all-gathers
    the whole input batch every step, recorded in MULTICHIP_r04.json for
    the old contiguous microbatch split — and (b) an optimized HLO with no
    all-gather of the batch: in pure-DP accumulation the only collectives
    are the gradient/metric all-reduces.

    Two fixes compose to get there: the strided microbatch split
    (steps.py to_micro) and the batch-major sequence flatten
    (models/layout.py, flat_layout="batch" — what fit() auto-selects on
    a data mesh; the time-major flatten interleaves the sharded batch
    axis at the [T,B]→[T·B] merge and forces XLA to gather)."""
    variables, apply32 = tiny_model
    apply_b = functools.partial(apply32, flat_layout="batch")
    tx = optax.sgd(1e-2)
    # B=16 over D=8 devices with K=2 → microbatch rows-per-device m=1,
    # the driver's dryrun geometry.
    x_raw, y_raw = dataset.get_batch_raw(np.arange(16) % 8)
    mesh = make_mesh(data=8)
    state = jax.device_put(_fresh_state(variables, tx),
                           replicated_sharding(mesh))
    x = jax.device_put(np.asarray(x_raw), batch_sharding(mesh))
    y = jax.device_put(np.asarray(y_raw), batch_sharding(mesh))
    step = make_train_step(apply_b, tx, dataset.stats, use_mask=False,
                           mesh=mesh, accum_steps=2, donate=False)
    capfd.readouterr()  # drain anything prior
    compiled = step.lower(state, x, y).compile()
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err
    hlo = compiled.as_text()
    assert "all-gather" not in hlo, (
        "optimized HLO contains an all-gather — the batch (or state) is "
        "being replicated somewhere in the accumulation step")
    _, loss, _ = compiled(state, x, y)
    assert np.isfinite(float(loss))


def test_accum_indivisible_batch_raises_clearly(dataset, tiny_model):
    """ADVICE r3: a batch not divisible by accum_steps must raise a clear
    ValueError at trace time, not an opaque XLA reshape error."""
    variables, apply32 = tiny_model
    tx = optax.sgd(1e-2)
    x_raw, y_raw = dataset.get_batch_raw(np.arange(3))
    step = make_train_step(apply32, tx, dataset.stats, use_mask=False,
                           accum_steps=2, donate=False)
    state = _fresh_state(variables, tx)
    with pytest.raises(ValueError, match="not divisible by"):
        step(state, jnp.asarray(x_raw), jnp.asarray(y_raw))
