"""Parity tests for the fused conv3x3+BN-prologue+stats kernel
(ops/pallas/doubleconv_fused.py) against the unfused XLA chain
(ops/conv.py conv2d + batchnorm) — forward values, stats, and gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_convlstm_tpu.core.dtypes import FP32_POLICY
from unet_convlstm_tpu.ops.conv import conv2d, conv2d_init
from unet_convlstm_tpu.ops.pallas.doubleconv_fused import (
    fits_fused_conv3x3, fused_conv3x3)


def _ref_chain(x, w, b, inv, shift):
    """relu(x*inv+shift) → conv3x3 SAME → (y, sum, sumsq) in f32."""
    z = jax.nn.relu(x * inv + shift) if inv is not None else x
    y = conv2d({"w": w, "b": b}, z, policy=FP32_POLICY)
    return y, jnp.sum(y, axis=(0, 1, 2)), jnp.sum(y * y, axis=(0, 1, 2))


@pytest.mark.parametrize("cin,cout,prologue", [
    (2, 8, False),     # L0 conv1 shape family (raw input, no prologue)
    (8, 8, True),      # conv2-of-DoubleConv family
    (16, 8, True),     # channel-asymmetric
])
def test_fused_conv3x3_forward_parity(cin, cout, prologue):
    key = jax.random.PRNGKey(0)
    kx, kw, ki, ks = jax.random.split(key, 4)
    N, H, W = 4, 12, 12
    x = jax.random.normal(kx, (N, H, W, cin), jnp.float32)
    p = conv2d_init(kw, cin, cout, 3)
    inv = jax.random.uniform(ki, (cin,), jnp.float32, 0.5, 1.5) \
        if prologue else None
    shift = jax.random.normal(ks, (cin,)) * 0.1 if prologue else None

    y_ref, s_ref, q_ref = _ref_chain(x, p["w"], p["b"], inv, shift)
    y, s, q = fused_conv3x3(x, p["w"], p["b"], pre_inv=inv,
                            pre_shift=shift, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref),
                               rtol=1e-4, atol=1e-3)


def test_fused_conv3x3_gradients_match_reference():
    key = jax.random.PRNGKey(1)
    kx, kw, ki, ks, kg = jax.random.split(key, 5)
    N, H, W, cin, cout = 2, 8, 8, 8, 8
    x = jax.random.normal(kx, (N, H, W, cin), jnp.float32)
    p = conv2d_init(kw, cin, cout, 3)
    inv = jax.random.uniform(ki, (cin,), jnp.float32, 0.5, 1.5)
    shift = jax.random.normal(ks, (cin,)) * 0.1

    # scalar objective touching y, sum and sumsq so every cotangent flows
    gy = jax.random.normal(kg, (N, H, W, cout))

    def loss_fused(x, w, b, inv, shift):
        y, s, q = fused_conv3x3(x, w, b, pre_inv=inv, pre_shift=shift,
                                interpret=True)
        return (jnp.sum(y * gy) + 0.1 * jnp.sum(s) + 0.01 * jnp.sum(q))

    def loss_ref(x, w, b, inv, shift):
        y, s, q = _ref_chain(x, w, b, inv, shift)
        return (jnp.sum(y * gy) + 0.1 * jnp.sum(s) + 0.01 * jnp.sum(q))

    args = (x, p["w"], p["b"], inv, shift)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gr, name in zip(g_fused, g_ref,
                            ["dx", "dw", "db", "dinv", "dshift"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=name)


def test_fused_conv3x3_no_prologue_grads():
    key = jax.random.PRNGKey(2)
    kx, kw = jax.random.split(key)
    N, H, W, cin, cout = 2, 6, 6, 4, 8
    x = jax.random.normal(kx, (N, H, W, cin), jnp.float32)
    p = conv2d_init(kw, cin, cout, 3)

    def loss_fused(x, w):
        y, s, q = fused_conv3x3(x, w, p["b"], interpret=True)
        return jnp.sum(y ** 2) + jnp.sum(s) + 0.01 * jnp.sum(q)

    def loss_ref(x, w):
        y, s, q = _ref_chain(x, w, p["b"], None, None)
        return jnp.sum(y ** 2) + jnp.sum(s) + 0.01 * jnp.sum(q)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, p["w"])
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, p["w"])
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=2e-4, atol=2e-4)


def test_fits_guard():
    # bench L0 family fits (bn=1); a single enormous image cannot be
    # blocked below one sample and must fall back to the XLA path
    assert fits_fused_conv3x3((64, 64, 64, 32), 32)
    assert not fits_fused_conv3x3((1, 4096, 4096, 64), 64)
    # the production cloud L0 (128², C=64) exceeds the per-sample budget
    # too — spatial tiling is future work; the block falls back
    assert not fits_fused_conv3x3((768, 128, 128, 64), 64)


@pytest.mark.parametrize("cin", [16, 2])
def test_double_conv_fused_matches_unfused_train_mode(cin):
    """Full block: values, new running stats, and grads THROUGH the batch
    statistics must match the unfused path (f32, interpret kernel).
    cin=16 fuses both convs; cin=2 (the network-input case) keeps conv1 on
    XLA — narrow lanes pad catastrophically in VMEM — and fuses conv2."""
    from unet_convlstm_tpu.ops.blocks import double_conv, double_conv_init

    key = jax.random.PRNGKey(3)
    kp, kx = jax.random.split(key)
    params, stats = double_conv_init(kp, cin, 16)
    x = jax.random.normal(kx, (2, 8, 8, cin), jnp.float32)

    y_ref, ns_ref = double_conv(params, stats, x, train=True,
                                policy=FP32_POLICY)
    y_fus, ns_fus = double_conv(params, stats, x, train=True,
                                policy=FP32_POLICY, fused=True)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    for k in ("bn1", "bn2"):
        for s in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(ns_fus[k][s]),
                                       np.asarray(ns_ref[k][s]),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"{k}.{s}")

    def loss(p, fused):
        y, _ = double_conv(p, stats, x, train=True, policy=FP32_POLICY,
                           fused=fused)
        return jnp.sum(y ** 2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_fus = jax.grad(lambda p: loss(p, True))(params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fus)
    for (path, gr), (_, gf) in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_double_conv_fused_eval_mode():
    from unet_convlstm_tpu.ops.blocks import double_conv, double_conv_init

    key = jax.random.PRNGKey(4)
    kp, kx = jax.random.split(key)
    params, stats = double_conv_init(kp, 16, 16)
    # non-trivial running stats
    stats = jax.tree_util.tree_map(
        lambda s: s + 0.3 * jnp.arange(s.shape[0], dtype=s.dtype) /
        s.shape[0], stats)
    x = jax.random.normal(kx, (2, 8, 8, 16), jnp.float32)
    y_ref, _ = double_conv(params, stats, x, train=False,
                           policy=FP32_POLICY)
    y_fus, _ = double_conv(params, stats, x, train=False,
                           policy=FP32_POLICY, fused=True)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
