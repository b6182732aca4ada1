"""Parallelism tests on the 8-device virtual CPU mesh: DP batch sharding,
TP channel sharding of conv kernels (the scale-up seam), mixed (4x2) meshes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unet_convlstm_tpu.core.dtypes import FP32_POLICY
from unet_convlstm_tpu.models.registry import build_model
from unet_convlstm_tpu.ops.conv import conv2d, conv2d_init
from unet_convlstm_tpu.parallel.mesh import (
    MeshRules, batch_sharding, make_mesh, replicated_sharding,
)


def test_mesh_construction():
    mesh = make_mesh()                      # all devices on 'data'
    assert mesh.shape == {"data": 8, "model": 1}
    mesh42 = make_mesh(data=4, model=2)
    assert mesh42.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=16, model=1)


def test_channel_sharded_conv_matches_replicated(rng):
    """TP seam: output-channel-sharded conv kernel computes the same
    function (XLA inserts the gathers)."""
    mesh = make_mesh(data=4, model=2)
    p = conv2d_init(jax.random.PRNGKey(0), 8, 256, 3)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 8), dtype=np.float32))

    y_ref = conv2d(p, x, policy=FP32_POLICY)

    p_sharded = {
        "w": jax.device_put(p["w"],
                            NamedSharding(mesh, P(None, None, None,
                                                  "model"))),
        "b": jax.device_put(p["b"], NamedSharding(mesh, P("model"))),
    }
    x_sharded = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def f(p, x):
        return conv2d(p, x, policy=FP32_POLICY)

    y = f(p_sharded, x_sharded)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_mesh_rules_sharding_tree():
    mesh = make_mesh(data=4, model=2)
    rules = MeshRules(mesh, shard_model_channels=True)
    params = {"conv": {"w": jnp.zeros((3, 3, 8, 256)),
                       "b": jnp.zeros((256,))},
              "bn": {"scale": jnp.ones((256,))}}
    tree = rules.params_sharding(params)
    assert tree["conv"]["w"].spec == P(None, None, None, "model")
    assert tree["conv"]["b"].spec == P()    # 1-D leaves stay replicated
    assert tree["bn"]["scale"].spec == P()


def test_tp_model_forward_matches_replicated(rng):
    """Full tiny model forward with every conv kernel channel-sharded over
    'model' — same outputs as the replicated run."""
    mesh = make_mesh(data=4, model=2)
    cfg_dict = {"type": "custom", "base_ch": 4, "use_skip_lstm": True,
                "lstm_layers": 1}
    _, init_fn, apply_fn, _ = build_model(cfg_dict)
    variables = init_fn(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((4, 2, 32, 32, 2),
                                        dtype=np.float32))

    y_ref, _, _ = apply_fn(variables, x, train=False)

    rules = MeshRules(mesh, shard_model_channels=True)
    v_sharded = {
        "params": jax.device_put(variables["params"],
                                 rules.params_sharding(variables["params"])),
        "stats": jax.device_put(variables["stats"],
                                replicated_sharding(mesh)),
    }
    x_sharded = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def fwd(v, x):
        y, _, _ = apply_fn(v, x, train=False)
        return y

    y = fwd(v_sharded, x_sharded)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_dp_gradients_are_synchronized(rng):
    """Replicated params + batch-sharded inputs: the gradient under jit is
    the global-batch gradient (XLA's psum), equal to the single-device one."""
    mesh = make_mesh()
    p = conv2d_init(jax.random.PRNGKey(1), 2, 4, 3)
    x = rng.standard_normal((8, 8, 8, 2)).astype(np.float32)

    def loss(p, x):
        return jnp.mean(conv2d(p, jnp.asarray(x), policy=FP32_POLICY) ** 2)

    g_single = jax.grad(loss)(p, x)
    p_rep = jax.device_put(p, replicated_sharding(mesh))
    x_shard = jax.device_put(x, batch_sharding(mesh))
    g_dp = jax.jit(jax.grad(loss))(p_rep, x_shard)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        g_single, g_dp)


def test_tree_sharding_covers_whole_train_state():
    """MeshRules.tree_sharding: conv kernels AND their AdamW moments get
    the channel rule; scalars/biases/BN stats replicate."""
    from unet_convlstm_tpu.train import make_optimizer

    mesh = make_mesh(data=4, model=2)
    rules = MeshRules(mesh, shard_model_channels=True)
    params = {"conv": {"w": jnp.zeros((3, 3, 8, 16)), "b": jnp.zeros((16,))}}
    tx = make_optimizer(1e-3)
    state = {"params": params, "stats": {"bn": jnp.zeros((16,))},
             "opt_state": tx.init(params)}
    tree = rules.tree_sharding(state)
    assert tree["params"]["conv"]["w"].spec == P(None, None, None, "model")
    assert tree["params"]["conv"]["b"].spec == P()
    assert tree["stats"]["bn"].spec == P()
    # adam mu mirrors the param tree -> kernel moment sharded identically
    mu_shardings = [s for s in jax.tree_util.tree_leaves(tree["opt_state"])
                    if s.spec == P(None, None, None, "model")]
    assert len(mu_shardings) == 2  # mu and nu of the kernel


def test_tp_train_step_matches_replicated(rng):
    """Full TENSOR-PARALLEL training: conv kernels + optimizer state sharded
    over 'model' on a (2,2) mesh — three optimizer steps produce the same
    params as the unsharded single-device step.

    Conditions (same as the multi-step-trainer equivalence test): f32
    policy and SGD — adaptive optimizers divide by sqrt(nu), amplifying
    f32 reduction-order noise into lr-scale param deltas, which would test
    float-noise amplification rather than TP correctness (verified: AdamW
    losses still match to 1e-5 here, only params drift)."""
    import functools

    import optax

    from unet_convlstm_tpu.ops.normalize import NormStats
    from unet_convlstm_tpu.train import make_train_step

    cfg_dict = {"type": "custom", "base_ch": 4, "use_skip_lstm": True,
                "lstm_layers": 1}
    _, init_fn, apply_fn, _ = build_model(cfg_dict)
    apply32 = functools.partial(apply_fn, policy=FP32_POLICY)
    stats = NormStats(norm_const=2.0, min_vel=-5.0, max_vel=5.0,
                      y_scale=2.0, trans_min=-2.0, trans_max=2.0)
    x = rng.random((4, 2, 32, 32, 2), dtype=np.float64).astype(np.float32)
    y = rng.standard_normal((4, 2, 32, 32, 1)).astype(np.float32)

    def run(mesh, state_sharding):
        variables = init_fn(jax.random.PRNGKey(0))
        tx = optax.sgd(1e-2)
        state = {"params": variables["params"],
                 "stats": variables["stats"],
                 "opt_state": tx.init(variables["params"])}
        if mesh is not None:
            state = jax.device_put(state, state_sharding)
            xd = jax.device_put(x, batch_sharding(mesh))
            yd = jax.device_put(y, batch_sharding(mesh))
        else:
            xd, yd = jnp.asarray(x), jnp.asarray(y)
        step = make_train_step(apply32, tx, stats, use_mask=False,
                               mesh=mesh, state_sharding=state_sharding)
        losses = []
        for _ in range(3):
            state, loss, _ = step(state, xd, yd)
            losses.append(float(loss))
        return jax.device_get(state["params"]), losses

    p_ref, losses_ref = run(None, None)

    mesh = make_mesh(data=2, model=2)
    rules = MeshRules(mesh, shard_model_channels=True)
    variables = init_fn(jax.random.PRNGKey(0))
    tx = optax.sgd(1e-2)
    template = {"params": variables["params"], "stats": variables["stats"],
                "opt_state": tx.init(variables["params"])}
    tp_shard = rules.tree_sharding(template)
    # the seam is real: at least one conv kernel is channel-sharded
    assert any(s.spec == P(None, None, None, "model")
               for s in jax.tree_util.tree_leaves(tp_shard["params"]))
    p_tp, losses_tp = run(mesh, tp_shard)

    np.testing.assert_allclose(losses_tp, losses_ref, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-6),
        p_tp, p_ref)


def test_fit_with_tensor_parallel_mesh(tmp_path):
    """End-to-end fit() on a (2,2) DP x TP mesh: mesh_model=2 channel-shards
    the state via the config path alone; training converges and the
    checkpoint restores on a plain single-device mesh."""
    from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
    from unet_convlstm_tpu.train.config import TrainConfig
    from unet_convlstm_tpu.train.loop import fit

    npz = str(tmp_path / "mm.npz")
    save_moving_mnist_npz(npz, seq_len=2, num_samples=8, image_size=32,
                          num_digits=1, seed=0, as_xy=True)
    cfg = TrainConfig(
        npz_path=npz, batch_size=4, epochs=2, lr=1e-3,
        model={"type": "custom", "base_ch": 4, "use_skip_lstm": False,
               "lstm_layers": 1},
        checkpoint_dir=str(tmp_path / "ck"), unroll=1,
        mesh_data=2, mesh_model=2, zero1=True, train_frac=0.75)
    out = fit(cfg, verbose=False)
    assert np.isfinite(out["best_val_loss"])
    hist = out["history"]
    assert len(hist) == 2 and all(np.isfinite(r["val_loss"]) for r in hist)
    # state leaves really are sharded over 'model'
    kernels = [v for v in jax.tree_util.tree_leaves(out["state"]["params"])
               if getattr(v, "ndim", 0) == 4]
    assert any(
        any(ax == "model" for axes in k.sharding.spec for ax in
            ((axes,) if isinstance(axes, str) else (axes or ())))
        for k in kernels)


def test_zero1_train_step_matches_replicated(rng):
    """ZeRO-1: AdamW moments sharded over 'data' (params replicated) on the
    8-device mesh — three optimizer steps match the replicated-state DP
    run on the SAME mesh. Momentum-SGD (a real moment tree for ZeRO to
    shard) rather than AdamW, for the same reason as the TP test above:
    re-jitting with different output shardings changes fusion order, and
    adaptive rsqrt(nu) amplifies that f32 noise to lr-scale param deltas
    (measured: AdamW losses match to 7e-6, params drift to 2e-4 — noise
    amplification, not a sharding bug)."""
    import functools

    import optax

    from unet_convlstm_tpu.ops.normalize import NormStats
    from unet_convlstm_tpu.train import make_train_step

    cfg_dict = {"type": "custom", "base_ch": 4, "use_skip_lstm": True,
                "lstm_layers": 1}
    _, init_fn, apply_fn, _ = build_model(cfg_dict)
    apply32 = functools.partial(apply_fn, policy=FP32_POLICY)
    stats = NormStats(norm_const=2.0, min_vel=-5.0, max_vel=5.0,
                      y_scale=2.0, trans_min=-2.0, trans_max=2.0)
    x = rng.random((8, 2, 32, 32, 2), dtype=np.float64).astype(np.float32)
    y = rng.standard_normal((8, 2, 32, 32, 1)).astype(np.float32)
    mesh = make_mesh(data=8)

    def run(state_sharding):
        variables = init_fn(jax.random.PRNGKey(0))
        tx = optax.sgd(1e-2, momentum=0.9)
        state = {"params": variables["params"],
                 "stats": variables["stats"],
                 "opt_state": tx.init(variables["params"])}
        state = jax.device_put(state, state_sharding)
        xd = jax.device_put(x, batch_sharding(mesh))
        yd = jax.device_put(y, batch_sharding(mesh))
        step = make_train_step(apply32, tx, stats, use_mask=False,
                               mesh=mesh, state_sharding=state_sharding)
        losses = []
        for _ in range(3):
            state, loss, _ = step(state, xd, yd)
            losses.append(float(loss))
        return jax.device_get(state), losses

    variables = init_fn(jax.random.PRNGKey(0))
    import optax as _optax
    template = {"params": variables["params"], "stats": variables["stats"],
                "opt_state": _optax.sgd(1e-2, momentum=0.9).init(
                    variables["params"])}

    rules0 = MeshRules(mesh)                      # replicated baseline
    state_ref, losses_ref = run(rules0.tree_sharding(template))

    rules1 = MeshRules(mesh, shard_opt_state_data=True)
    z_shard = rules1.tree_sharding(template)
    # params stay replicated; the moments really are 'data'-sharded
    assert all(s.spec == P()
               for s in jax.tree_util.tree_leaves(z_shard["params"]))
    opt_specs = [s.spec for s in
                 jax.tree_util.tree_leaves(z_shard["opt_state"])]
    n_sharded = sum("data" in tuple(ax for ax in sp if ax) for sp in opt_specs)
    n_params = sum(1 for _ in jax.tree_util.tree_leaves(template["params"]))
    # the momentum trace mirrors the param tree; most of it must shard
    assert n_sharded >= n_params // 2, (n_sharded, n_params)
    state_z, losses_z = run(z_shard)

    np.testing.assert_allclose(losses_z, losses_ref, rtol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-6),
        state_z["params"], state_ref["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-6),
        state_z["opt_state"], state_ref["opt_state"])


def test_zero1_composes_with_tp():
    """On a (4,2) DP x TP mesh the two rules compose per leaf: a conv-kernel
    moment carries BOTH 'model' (channel rule) and 'data' (ZeRO rule) on
    different axes; the kernel param itself carries only 'model'."""
    import optax

    cfg_dict = {"type": "custom", "base_ch": 4, "use_skip_lstm": False,
                "lstm_layers": 1}
    _, init_fn, _, _ = build_model(cfg_dict)
    variables = init_fn(jax.random.PRNGKey(0))
    template = {"params": variables["params"], "stats": variables["stats"],
                "opt_state": optax.adamw(1e-3).init(variables["params"])}
    mesh = make_mesh(data=4, model=2)
    rules = MeshRules(mesh, shard_model_channels=True,
                      shard_opt_state_data=True)
    shard = rules.tree_sharding(template)

    def axes(spec):
        return {ax for entry in spec for ax in
                ((entry,) if isinstance(entry, str) else (entry or ()))}

    opt_axes = [axes(s.spec) for s in
                jax.tree_util.tree_leaves(shard["opt_state"])
                if len(s.spec) == 4]
    assert any({"model", "data"} <= a for a in opt_axes), \
        "no moment leaf carries both TP and ZeRO axes"
    param_axes = [axes(s.spec) for s in
                  jax.tree_util.tree_leaves(shard["params"])]
    assert not any("data" in a for a in param_axes), \
        "ZeRO must not shard params"


def test_flat_layouts_agree(rng):
    """models/layout.py contract: "time" and "batch" flatten layouts
    compute the same function (BN batch stats reduce over all T·B frames
    either way), for both model families, train and eval mode."""
    x = jnp.asarray(rng.standard_normal((3, 2, 32, 32, 2),
                                        dtype=np.float32))
    for cfg_dict in ({"type": "custom", "base_ch": 4, "use_skip_lstm": True,
                      "lstm_layers": 1},
                     {"type": "resnet18", "lstm_layers": 1,
                      "freeze_encoder": False}):
        _, init_fn, apply_fn, _ = build_model(dict(cfg_dict))
        variables = init_fn(jax.random.PRNGKey(0))
        for train in (False, True):
            y_t, _, bn_t = apply_fn(variables, x, train=train,
                                    policy=FP32_POLICY, flat_layout="time")
            y_b, _, bn_b = apply_fn(variables, x, train=train,
                                    policy=FP32_POLICY, flat_layout="batch")
            # eval mode is per-row-deterministic (running BN stats, no
            # batch reduction) → near-exact; train mode reduces BN batch
            # statistics in a different order → f32 reassociation noise,
            # amplified through the normalize/divide chain (measured
            # ~1e-5..1e-4 abs on this geometry). A layout BUG (row
            # permutation mismatch) would show as O(1) errors.
            tol = dict(rtol=1e-4, atol=2e-4) if train else \
                dict(rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_b),
                                       **tol)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
                jax.device_get(bn_t), jax.device_get(bn_b))


def test_dp_train_step_batch_layout_no_all_gather(rng):
    """A pure-DP train step with flat_layout="batch" (fit()'s auto pick on
    a data mesh) must compile to an HLO with NO all-gather: the time-major
    flatten used to force XLA to gather the full input (fwd) and
    output-grad (bwd) every step — full-batch replication traffic that
    MULTICHIP_r04.json's warnings only exposed on the accum leg."""
    import functools
    import optax
    from unet_convlstm_tpu.train import make_train_step
    from unet_convlstm_tpu.ops.normalize import NormStats

    cfg_dict = {"type": "custom", "base_ch": 4, "use_skip_lstm": True,
                "lstm_layers": 1}
    _, init_fn, apply_fn, _ = build_model(cfg_dict)
    variables = init_fn(jax.random.PRNGKey(0))
    apply_b = functools.partial(apply_fn, policy=FP32_POLICY,
                                flat_layout="batch")
    mesh = make_mesh(data=8)
    tx = optax.sgd(1e-2)
    stats = NormStats(norm_const=1.0, min_vel=-5.0, max_vel=5.0,
                      y_scale=1.0, trans_min=-1.0, trans_max=1.0)
    state = {"params": variables["params"], "stats": variables["stats"],
             "opt_state": tx.init(variables["params"])}
    state = jax.device_put(state, replicated_sharding(mesh))
    x = jax.device_put(
        rng.standard_normal((16, 2, 32, 32, 2)).astype(np.float32),
        batch_sharding(mesh))
    y = jax.device_put(
        rng.standard_normal((16, 2, 32, 32, 1)).astype(np.float32),
        batch_sharding(mesh))
    step = make_train_step(apply_b, tx, stats, use_mask=False, mesh=mesh,
                           donate=False)
    hlo = step.lower(state, x, y).compile().as_text()
    assert "all-gather" not in hlo, (
        "DP step with batch-major flatten should shard every reshape "
        "locally — found an all-gather in the optimized HLO")


def test_mesh_parallel_offline_eval_matches_single_device(tmp_path):
    """VERDICT r4 #3: evaluate_model(mesh=...) — batch sharded on 'data',
    reductions psummed, per-row scatter sampling device-local — must
    produce the same EvalReport as the single-device pass (same seed →
    same sample indices)."""
    import functools
    from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.eval.metrics import evaluate_model

    npz = str(tmp_path / "mm.npz")
    save_moving_mnist_npz(npz, seq_len=2, num_samples=16, image_size=32,
                          num_digits=1, seed=5, as_xy=True)
    ds = NPZSequenceDataset(npz)
    cfg_dict = {"type": "custom", "base_ch": 4, "use_skip_lstm": False,
                "lstm_layers": 1}
    _, init_fn, apply_fn, _ = build_model(cfg_dict)
    variables = init_fn(jax.random.PRNGKey(0))
    apply32 = functools.partial(apply_fn, policy=FP32_POLICY,
                                flat_layout="batch")
    idx = np.arange(len(ds))

    mesh = make_mesh(data=8)
    rep_m = evaluate_model(apply32, variables, ds, indices=idx,
                           batch_size=8, use_mask=False, mesh=mesh)
    rep_1 = evaluate_model(apply32, variables, ds, indices=idx,
                           batch_size=8, use_mask=False)
    assert rep_m.n_pixels == rep_1.n_pixels
    np.testing.assert_allclose(rep_m.mae, rep_1.mae, rtol=1e-5)
    np.testing.assert_allclose(rep_m.rmse, rep_1.rmse, rtol=1e-5)
    np.testing.assert_allclose(rep_m.bias, rep_1.bias, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(rep_m.mae_over_time, rep_1.mae_over_time,
                               rtol=1e-5)
    np.testing.assert_allclose(rep_m.gt_hist, rep_1.gt_hist)
    np.testing.assert_allclose(rep_m.pred_hist, rep_1.pred_hist)
    np.testing.assert_allclose(rep_m.err_hist, rep_1.err_hist)
    # same per-row sample indices → same scatter pool
    np.testing.assert_allclose(np.sort(rep_m.scatter_gt),
                               np.sort(rep_1.scatter_gt), rtol=1e-6)
    # eval batch must divide the mesh
    with pytest.raises(ValueError, match="not divisible"):
        evaluate_model(apply32, variables, ds, indices=idx,
                       batch_size=6, use_mask=False, mesh=mesh)


def test_mesh_parallel_rollout_matches_single_device(rng):
    """rollout_scan(mesh=...): batch of sequences + recurrent carries
    sharded on 'data' — identical outputs to the single-device scan."""
    import functools
    from unet_convlstm_tpu.eval.rollout import rollout_scan

    cfg_dict = {"type": "custom", "base_ch": 4, "use_skip_lstm": True,
                "lstm_layers": 1}
    _, init_fn, apply_fn, init_state_fn = build_model(cfg_dict)
    variables = init_fn(jax.random.PRNGKey(0))
    apply32 = functools.partial(apply_fn, policy=FP32_POLICY,
                                flat_layout="batch")
    x = np.asarray(rng.standard_normal((8, 3, 32, 32, 2)), np.float32)

    mesh = make_mesh(data=8)
    y_m, st_m = rollout_scan(apply32, variables, jnp.asarray(x),
                             init_state_fn, mesh=mesh)
    y_1, st_1 = rollout_scan(apply32, variables, jnp.asarray(x),
                             init_state_fn)
    np.testing.assert_allclose(np.asarray(y_m, np.float32),
                               np.asarray(y_1, np.float32),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-5), jax.device_get(st_m),
        jax.device_get(st_1))
    with pytest.raises(ValueError, match="not divisible"):
        rollout_scan(apply32, variables, jnp.asarray(x[:6]), init_state_fn,
                     mesh=mesh)
