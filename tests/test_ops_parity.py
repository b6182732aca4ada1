"""Numerical parity of core ops against independently-built torch golden ops.

Each golden model here is constructed in torch from the op's mathematical
spec (conv→BN→ReLU, gate equations, etc.) with weights copied from our JAX
params, then outputs are compared to fp32 tolerance. This validates that the
TPU-native implementations compute the same functions as the reference
design (train/unet.py) without sharing any code with it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unet_convlstm_tpu.core.dtypes import FP32_POLICY
from unet_convlstm_tpu.ops import (
    conv2d_init, conv2d, conv_transpose2d_init, conv_transpose2d,
    max_pool2d, batchnorm_init, batchnorm,
    double_conv_init, double_conv, up_init, up,
    spatial_attention_init, spatial_attention,
    convlstm_cell_init, convlstm_cell_step, convlstm_init, convlstm,
    convlstm_zero_state,
    compute_loss, masked_mse,
)

TOL = dict(rtol=2e-5, atol=2e-5)


def nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.moveaxis(x_nchw, 1, -1))


def nchw(x_nhwc: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1))


def torch_w(params_w: jnp.ndarray) -> torch.Tensor:
    # HWIO -> OIHW
    return torch.from_numpy(np.transpose(np.asarray(params_w), (3, 2, 0, 1)).copy())


# ---------------------------------------------------------------------------
# Conv2d / ConvTranspose2d / MaxPool
# ---------------------------------------------------------------------------

def test_conv2d_matches_torch(rng):
    p = conv2d_init(jax.random.PRNGKey(0), 3, 8, 3)
    x = rng.standard_normal((2, 3, 16, 16), dtype=np.float32)
    y = conv2d(p, jnp.asarray(nhwc(x)), policy=FP32_POLICY)
    yt = F.conv2d(torch.from_numpy(x), torch_w(p["w"]),
                  torch.from_numpy(np.asarray(p["b"])), padding=1)
    np.testing.assert_allclose(nchw(np.asarray(y)), yt.numpy(), **TOL)


def test_conv_transpose2d_matches_torch(rng):
    p = conv_transpose2d_init(jax.random.PRNGKey(0), 8, 4, 2)
    x = rng.standard_normal((2, 8, 7, 7), dtype=np.float32)
    y = conv_transpose2d(p, jnp.asarray(nhwc(x)), stride=2, policy=FP32_POLICY)
    # ours (kh, kw, out, in) -> torch ConvTranspose2d (in, out, kh, kw)
    w_t = torch.from_numpy(np.transpose(np.asarray(p["wt"]), (3, 2, 0, 1)).copy())
    yt = F.conv_transpose2d(torch.from_numpy(x), w_t,
                            torch.from_numpy(np.asarray(p["b"])), stride=2)
    assert y.shape == (2, 14, 14, 4)
    np.testing.assert_allclose(nchw(np.asarray(y)), yt.numpy(), **TOL)


def test_max_pool(rng):
    x = rng.standard_normal((2, 3, 16, 16), dtype=np.float32)
    y = max_pool2d(jnp.asarray(nhwc(x)), 2)
    yt = F.max_pool2d(torch.from_numpy(x), 2)
    np.testing.assert_allclose(nchw(np.asarray(y)), yt.numpy(), **TOL)


def test_batchnorm_train_and_eval(rng):
    p, s = batchnorm_init(6)
    x = rng.standard_normal((4, 6, 8, 8), dtype=np.float32)
    bn = torch.nn.BatchNorm2d(6)
    bn.train()
    xt = torch.from_numpy(x)
    with torch.no_grad():
        yt = bn(xt)
    y, s1 = batchnorm(p, s, jnp.asarray(nhwc(x)), train=True)
    np.testing.assert_allclose(nchw(np.asarray(y)), yt.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1["mean"]),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)
    # eval mode uses running stats
    bn.eval()
    with torch.no_grad():
        yt2 = bn(xt)
    y2, _ = batchnorm(p, s1, jnp.asarray(nhwc(x)), train=False)
    np.testing.assert_allclose(nchw(np.asarray(y2)), yt2.numpy(), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# ConvLSTM cell/stack — gate equations i,f,g,o per the reference spec
# ---------------------------------------------------------------------------

class TorchConvLSTMCell(torch.nn.Module):
    """Golden cell per spec: conv(cat[x,h]) → chunk 4 → σ,σ,tanh,σ."""

    def __init__(self, input_dim, hidden_dim, k=3):
        super().__init__()
        self.hidden_dim = hidden_dim
        self.conv = torch.nn.Conv2d(input_dim + hidden_dim, 4 * hidden_dim,
                                    k, padding=k // 2)

    def forward(self, x, h, c):
        gates = self.conv(torch.cat([x, h], dim=1))
        i, f, g, o = torch.chunk(gates, 4, dim=1)
        i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
        g = torch.tanh(g)
        c2 = f * c + i * g
        h2 = o * torch.tanh(c2)
        return h2, c2


def _sync_cell(tcell, params):
    with torch.no_grad():
        tcell.conv.weight.copy_(torch_w(params["conv"]["w"]))
        tcell.conv.bias.copy_(torch.from_numpy(np.asarray(params["conv"]["b"])))


def test_convlstm_cell_step(rng):
    params = convlstm_cell_init(jax.random.PRNGKey(0), 4, 8)
    tcell = TorchConvLSTMCell(4, 8)
    _sync_cell(tcell, params)

    x = rng.standard_normal((2, 4, 12, 12), dtype=np.float32)
    h = rng.standard_normal((2, 8, 12, 12), dtype=np.float32)
    c = rng.standard_normal((2, 8, 12, 12), dtype=np.float32)

    h2, (h2b, c2) = convlstm_cell_step(
        params, jnp.asarray(nhwc(x)), (jnp.asarray(nhwc(h)), jnp.asarray(nhwc(c))),
        policy=FP32_POLICY)
    with torch.no_grad():
        ht, ct = tcell(torch.from_numpy(x), torch.from_numpy(h), torch.from_numpy(c))
    np.testing.assert_allclose(nchw(np.asarray(h2)), ht.numpy(), **TOL)
    np.testing.assert_allclose(nchw(np.asarray(c2)), ct.numpy(), **TOL)


def test_convlstm_stack_scan_matches_loop(rng):
    """Multi-layer scan ≡ reference-style nested python loop (zero init)."""
    T, B, H, W, Cin, Chid, L = 5, 2, 8, 8, 3, 6, 2
    params = convlstm_init(jax.random.PRNGKey(1), Cin, Chid, num_layers=L)
    cells = [TorchConvLSTMCell(Cin if l == 0 else Chid, Chid) for l in range(L)]
    for l in range(L):
        _sync_cell(cells[l], params[f"layer{l}"])

    x = rng.standard_normal((T, B, Cin, H, W), dtype=np.float32)
    out, states = convlstm(params, jnp.asarray(np.moveaxis(x, 2, -1)),
                           policy=FP32_POLICY)

    seq = [torch.from_numpy(x[t]) for t in range(T)]
    with torch.no_grad():
        for cell in cells:
            h = torch.zeros(B, cell.hidden_dim, H, W)
            c = torch.zeros_like(h)
            new_seq = []
            for t in range(T):
                h, c = cell(seq[t], h, c)
                new_seq.append(h)
            seq = new_seq
    golden = torch.stack(seq).numpy()  # [T,B,Chid,H,W]
    np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 2), golden, **TOL)
    # final carry of last layer == last h, c
    np.testing.assert_allclose(np.moveaxis(np.asarray(states[-1][0]), -1, 1),
                               h.numpy(), **TOL)


def test_convlstm_streaming_equals_full(rng):
    """Carrying state over a split sequence ≡ one full pass (rollout API)."""
    T, B, H, W, C = 6, 1, 8, 8, 4
    params = convlstm_init(jax.random.PRNGKey(2), C, C)
    x = jnp.asarray(rng.standard_normal((T, B, H, W, C), dtype=np.float32))
    full, _ = convlstm(params, x, policy=FP32_POLICY)
    out1, st = convlstm(params, x[:3], policy=FP32_POLICY)
    out2, _ = convlstm(params, x[3:], state=st, policy=FP32_POLICY)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([out1, out2])),
                               np.asarray(full), **TOL)


# ---------------------------------------------------------------------------
# Composite blocks
# ---------------------------------------------------------------------------

def test_double_conv_eval_matches_torch(rng):
    p, s = double_conv_init(jax.random.PRNGKey(3), 3, 8)
    seq = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1), torch.nn.BatchNorm2d(8), torch.nn.ReLU(),
        torch.nn.Conv2d(8, 8, 3, padding=1), torch.nn.BatchNorm2d(8), torch.nn.ReLU())
    with torch.no_grad():
        seq[0].weight.copy_(torch_w(p["conv1"]["w"]))
        seq[0].bias.copy_(torch.from_numpy(np.asarray(p["conv1"]["b"])))
        seq[3].weight.copy_(torch_w(p["conv2"]["w"]))
        seq[3].bias.copy_(torch.from_numpy(np.asarray(p["conv2"]["b"])))
    seq.eval()
    x = rng.standard_normal((2, 3, 16, 16), dtype=np.float32)
    y, _ = double_conv(p, s, jnp.asarray(nhwc(x)), train=False, policy=FP32_POLICY)
    with torch.no_grad():
        yt = seq(torch.from_numpy(x))
    np.testing.assert_allclose(nchw(np.asarray(y)), yt.numpy(), rtol=1e-4, atol=1e-4)


def test_spatial_attention(rng):
    p = spatial_attention_init(jax.random.PRNGKey(4))
    x = rng.standard_normal((2, 5, 16, 16), dtype=np.float32)
    y = spatial_attention(p, jnp.asarray(nhwc(x)), policy=FP32_POLICY)
    xt = torch.from_numpy(x)
    avg = xt.mean(dim=1, keepdim=True)
    mx, _ = xt.max(dim=1, keepdim=True)
    att = torch.sigmoid(F.conv2d(torch.cat([avg, mx], 1), torch_w(p["w"]), padding=3))
    np.testing.assert_allclose(nchw(np.asarray(y)), (xt * att).numpy(), **TOL)


def test_up_padding_on_odd_shapes(rng):
    """Up must center-pad when the skip is larger (odd input sizes)."""
    p, s = up_init(jax.random.PRNGKey(5), 8, 4)
    deep = jnp.asarray(rng.standard_normal((1, 7, 7, 8), dtype=np.float32))
    skip = jnp.asarray(rng.standard_normal((1, 15, 15, 4), dtype=np.float32))
    y, _ = up(p, s, deep, skip, train=False, policy=FP32_POLICY)
    assert y.shape == (1, 15, 15, 4)


# ---------------------------------------------------------------------------
# Losses — golden values computed with torch per the reference formula
# ---------------------------------------------------------------------------

def _torch_ref_loss(y_pred, y, mask, use_mask):
    abs_diff = (y_pred - y).abs()
    weight = 1.0 + 4.0 * (y.abs() ** 3)
    if use_mask and mask is not None:
        weighted_l1 = (abs_diff * mask * weight).sum() / ((mask * weight).sum() + 1e-8)
    else:
        weighted_l1 = (abs_diff * weight).mean()
    dx_p = y_pred[..., :, 1:] - y_pred[..., :, :-1]
    dy_p = y_pred[..., 1:, :] - y_pred[..., :-1, :]
    dx_g = y[..., :, 1:] - y[..., :, :-1]
    dy_g = y[..., 1:, :] - y[..., :-1, :]
    H_min = min(dx_p.shape[3], dy_p.shape[3])
    W_min = min(dx_p.shape[4], dy_p.shape[4])
    grad_diff = ((dx_p[..., :H_min, :W_min] - dx_g[..., :H_min, :W_min]).abs()
                 + (dy_p[..., :H_min, :W_min] - dy_g[..., :H_min, :W_min]).abs())
    if use_mask and mask is not None:
        mask_c = mask[..., :H_min, :W_min]
        grad_loss = (grad_diff * mask_c).sum() / (mask_c.sum() + 1e-8)
    else:
        grad_loss = grad_diff.mean()
    return (weighted_l1 + 0.005 * grad_loss).item()


@pytest.mark.parametrize("use_mask", [True, False])
def test_compute_loss(rng, use_mask):
    B, T, C, H, W = 2, 3, 1, 10, 12
    y_pred = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    y = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    mask = (rng.random((B, T, C, H, W)) > 0.5).astype(np.float32)
    golden = _torch_ref_loss(torch.from_numpy(y_pred), torch.from_numpy(y),
                             torch.from_numpy(mask), use_mask)
    ours = compute_loss(jnp.asarray(np.moveaxis(y_pred, 2, -1)),
                        jnp.asarray(np.moveaxis(y, 2, -1)),
                        jnp.asarray(np.moveaxis(mask, 2, -1)),
                        use_mask=use_mask)
    np.testing.assert_allclose(float(ours), golden, rtol=1e-5, atol=1e-6)


def test_masked_mse(rng):
    y_pred = rng.standard_normal((2, 3, 4, 4, 1)).astype(np.float32)
    y = rng.standard_normal((2, 3, 4, 4, 1)).astype(np.float32)
    mask = (rng.random((2, 3, 4, 4, 1)) > 0.3).astype(np.float32)
    golden = float(((y_pred - y) ** 2 * mask).sum() / (mask.sum() + 1e-6))
    np.testing.assert_allclose(float(masked_mse(jnp.asarray(y_pred),
                                                jnp.asarray(y),
                                                jnp.asarray(mask))),
                               golden, rtol=1e-6)


def test_stacked_payload_gather_identity(rng):
    """ops/gather.py is a pure lowering trick: values must be identical
    to the plain per-field gathers it replaces (incl. the dead-padded
    single-field form)."""
    from unet_convlstm_tpu.ops.gather import payload_lookup, stack_volume

    a = rng.standard_normal((5, 6, 7)).astype(np.float32)
    b = rng.standard_normal((5, 6, 7)).astype(np.float32)
    gz = rng.integers(0, 5, size=(4, 3))
    gy = rng.integers(0, 6, size=(4, 3))
    gx = rng.integers(0, 7, size=(4, 3))
    out = np.asarray(payload_lookup(stack_volume(jnp.asarray(a),
                                                 jnp.asarray(b)),
                                    gz, gy, gx))
    assert out.shape == (4, 3, 2)
    np.testing.assert_array_equal(out[..., 0], a[gz, gy, gx])
    np.testing.assert_array_equal(out[..., 1], b[gz, gy, gx])
    one = payload_lookup(stack_volume(jnp.asarray(a)), gz, gy, gx)
    np.testing.assert_array_equal(np.asarray(one)[..., 0], a[gz, gy, gx])
