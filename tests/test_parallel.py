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
