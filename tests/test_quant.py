"""int8 post-training quantization (ops/quant.py).

The reference has no quantized path; this is a TPU-native inference
feature (v5e int8 MXU = 2x bf16 peak; the production forward pass is
FLOP-bound, docs/PERF.md). Correctness contract: per-channel int8
weights + dynamic per-tensor int8 activations track the float path to
quantization noise, through single ops and the full model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_convlstm_tpu.core.dtypes import FP32_POLICY
from unet_convlstm_tpu.ops.conv import (conv2d, conv2d_init,
                                        conv_transpose2d,
                                        conv_transpose2d_init)
from unet_convlstm_tpu.ops.quant import quantize_conv_params, quantize_tree


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


def test_conv2d_int8_tracks_float():
    rng = jax.random.PRNGKey(0)
    p = conv2d_init(rng, 8, 16, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 8))
    ref = conv2d(p, x, policy=FP32_POLICY)
    q = conv2d(quantize_conv_params(p), x, policy=FP32_POLICY)
    assert q.dtype == ref.dtype
    assert _rel_l2(q, ref) < 0.02          # int8 noise, not a wrong op


def test_conv_transpose2d_int8_tracks_float():
    rng = jax.random.PRNGKey(0)
    p = conv_transpose2d_init(rng, 16, 8, 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, 16))
    ref = conv_transpose2d(p, x, policy=FP32_POLICY)
    q = conv_transpose2d(quantize_conv_params(p), x,  # axis from 'wt' tag
                         policy=FP32_POLICY)
    assert q.shape == ref.shape
    assert _rel_l2(q, ref) < 0.02


def test_conv_transpose2d_accepts_pre_rename_int8_checkpoint():
    """int8 checkpoints written before the structural 'wt' rename hold up
    blocks as {'w_q','w_s','b'} with axis-2 scales; they must keep
    dispatching to the int8 path (round-3 review: the 'wt_q'-only check
    crashed them with KeyError 'w')."""
    rng = jax.random.PRNGKey(0)
    p = conv_transpose2d_init(rng, 16, 8, 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, 16))
    qp = quantize_conv_params(p)
    legacy = {"w_q": qp["wt_q"], "w_s": qp["wt_s"], "b": qp["b"]}
    np.testing.assert_array_equal(
        np.asarray(conv_transpose2d(legacy, x, policy=FP32_POLICY)),
        np.asarray(conv_transpose2d(qp, x, policy=FP32_POLICY)))


def test_per_channel_scales_beat_per_tensor():
    """The point of per-output-channel scales: a kernel whose channels
    differ by 100x in magnitude must still quantize each one finely."""
    rng = jax.random.PRNGKey(0)
    p = conv2d_init(rng, 4, 8, 3)
    w = np.array(p["w"])
    w[..., ::2] *= 100.0                   # half the channels huge
    p = {"w": jnp.asarray(w), "b": p["b"]}
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 10, 10, 4))
    ref = conv2d(p, x, policy=FP32_POLICY)
    q = conv2d(quantize_conv_params(p), x, policy=FP32_POLICY)
    # small channels keep their own resolution
    assert _rel_l2(q[..., 1::2], ref[..., 1::2]) < 0.02


def test_quantize_tree_full_model_forward():
    """quantize_tree rewrites every conv kernel (incl. the 'up' transposed
    kernels on their axis-2 layout) and the untouched model apply runs the
    int8 path end-to-end, tracking the float forward."""
    rng = jax.random.PRNGKey(0)
    from unet_convlstm_tpu.models.temporal_unet import (
        TemporalUNetConfig, temporal_unet_apply, temporal_unet_init)

    cfg = TemporalUNetConfig(base_ch=4, use_skip_lstm=True,
                             use_attention=True)
    variables = temporal_unet_init(rng, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 2, 32, 32, 2))
    ref, _, _ = temporal_unet_apply(variables, x, cfg, train=False,
                                    policy=FP32_POLICY)
    qv = quantize_tree(variables)
    q, _, _ = temporal_unet_apply(qv, x, cfg, train=False,
                                  policy=FP32_POLICY)
    assert q.shape == ref.shape
    # tanh/sigmoid gates + BN keep ranges benign; int8 noise stays small
    assert _rel_l2(q, ref) < 0.06

    # every conv kernel was rewritten; originals untouched
    leaves = jax.tree_util.tree_leaves_with_path(qv["params"])
    n_q = sum(1 for path, leaf in leaves
              if path[-1].key in ("w_q", "wt_q") and leaf.dtype == jnp.int8)
    n_w4 = sum(1 for path, leaf in
               jax.tree_util.tree_leaves_with_path(variables["params"])
               if path[-1].key in ("w", "wt") and leaf.ndim == 4)
    assert n_q == n_w4 > 0
    assert not any(path[-1].key in ("w", "wt") and leaf.ndim == 4
                   for path, leaf in leaves)
    # transposed kernels ('wt' structural tag) scale along their axis-2
    # out channel
    def find(node, key):
        if isinstance(node, dict):
            if key in node:
                yield node[key]
            for v in node.values():
                yield from find(v, key)
    up = next(iter(find(qv["params"], "up")))
    assert up["wt_s"].shape == (up["wt_q"].shape[2],)


@pytest.mark.slow
def test_quantize_tree_resnet_family_forward():
    """The reference DRIVER's default family (PretrainedTemporalUNet,
    main.py:213) through the int8 path: quantize_tree must rewrite every
    resnet kernel — the 7x7 stride-2 stem with explicit padding, the
    strided BasicBlock downsample 1x1s, the decoder convs — and the
    untouched apply must dispatch them all to the int8 MXU path while
    tracking the float forward. Streaming carry included (the serve
    --int8 path on a resnet checkpoint)."""
    from unet_convlstm_tpu.models.resnet_unet import (
        ResNetUNetConfig, resnet_unet_apply, resnet_unet_init,
        resnet_unet_init_state)

    cfg = ResNetUNetConfig(freeze_encoder=False)
    variables = resnet_unet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 2, 32, 32, 2))
    ref, _, _ = resnet_unet_apply(variables, x, cfg, train=False,
                                  policy=FP32_POLICY)
    qv = quantize_tree(variables)
    q, _, _ = resnet_unet_apply(qv, x, cfg, train=False, policy=FP32_POLICY)
    assert q.shape == ref.shape
    assert _rel_l2(q, ref) < 0.08          # int8 noise through 20+ convs

    # every 4-D conv kernel was rewritten (stem, blocks, downsamples,
    # lstms, decoder, head), none left in float
    leaves = jax.tree_util.tree_leaves_with_path(qv["params"])
    n_q = sum(1 for path, leaf in leaves
              if path[-1].key == "w_q" and leaf.dtype == jnp.int8)
    n_w4 = sum(1 for path, leaf in
               jax.tree_util.tree_leaves_with_path(variables["params"])
               if path[-1].key == "w" and leaf.ndim == 4)
    assert n_q == n_w4 > 20
    assert not any(path[-1].key == "w" and leaf.ndim == 4
                   for path, leaf in leaves)

    # streaming carry on the quantized resnet (serve --int8): dynamic
    # activation scales differ per dispatch, so requantization noise only
    state = resnet_unet_init_state(cfg, 1, 32, 32)
    outs = []
    for t in range(2):
        y, state, _ = resnet_unet_apply(qv, x[:, t:t + 1], cfg,
                                        train=False, state=state,
                                        policy=FP32_POLICY)
        outs.append(y)
    np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(q),
                               rtol=6e-2, atol=6e-3)


def test_quantized_streaming_matches_quantized_full():
    """The O(1)-per-frame streaming carry works unchanged on a quantized
    model (the serving path, serve.py). NOTE the tolerance: activation
    scales are DYNAMIC per dispatched tensor, so the batched-over-T full
    pass shares one scale across frames while streaming rescales per
    frame — outputs agree to requantization noise (≲1e-3 rel, well under
    the int8 step 1/127), not bitwise like the float path."""
    rng = jax.random.PRNGKey(0)
    from unet_convlstm_tpu.models.temporal_unet import (
        TemporalUNetConfig, temporal_unet_apply, temporal_unet_init,
        temporal_unet_init_state)

    cfg = TemporalUNetConfig(base_ch=4, use_skip_lstm=True)
    qv = quantize_tree(temporal_unet_init(rng, cfg))
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 16, 16, 2))
    full, _, _ = temporal_unet_apply(qv, x, cfg, train=False,
                                     policy=FP32_POLICY)
    state = temporal_unet_init_state(cfg, 1, 16, 16)
    outs = []
    for t in range(3):
        y, state, _ = temporal_unet_apply(qv, x[:, t:t + 1], cfg,
                                          train=False, state=state,
                                          policy=FP32_POLICY)
        outs.append(y)
    np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(full),
                               rtol=6e-3, atol=6e-4)


def test_quantized_eval_metrics_close_to_float(tmp_path):
    """User surface: evaluate a (tiny, briefly trained) checkpoint with
    --int8 — physical-unit metrics must track the float metrics."""
    rng = jax.random.PRNGKey(0)
    from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.eval.metrics import evaluate_model
    from unet_convlstm_tpu.models.temporal_unet import (
        TemporalUNetConfig, temporal_unet_apply, temporal_unet_init)

    npz = save_moving_mnist_npz(str(tmp_path / "mm.npz"), seq_len=3,
                                num_samples=12, image_size=32,
                                num_digits=1, seed=0, as_xy=True)
    ds = NPZSequenceDataset(npz)
    cfg = TemporalUNetConfig(base_ch=4)
    variables = temporal_unet_init(rng, cfg)

    def apply_fn(v, x, train=False, state=None, mutable=False):
        return temporal_unet_apply(v, x, cfg, train=train, state=state,
                                   policy=FP32_POLICY)

    ref = evaluate_model(apply_fn, variables, ds, batch_size=4)
    q = evaluate_model(apply_fn, quantize_tree(variables), ds, batch_size=4)
    # untrained net: outputs are small; quantized metrics stay in family
    assert abs(q.mae - ref.mae) < 0.05 * max(ref.mae, 1.0)
    assert abs(q.rmse - ref.rmse) < 0.05 * max(ref.rmse, 1.0)


def test_quantized_model_under_default_bf16_policy():
    """The production inference path (--int8 under the default bf16
    policy): the ConvLSTM stack must keep the f32 dequant scales intact
    (skipping the layer-wide compute-dtype cast) and the fused-DoubleConv
    flag must fall through to the unfused int8 path instead of KeyError."""
    from unet_convlstm_tpu.core.dtypes import DEFAULT_POLICY
    from unet_convlstm_tpu.models.temporal_unet import (
        TemporalUNetConfig, temporal_unet_apply, temporal_unet_init)

    cfg = TemporalUNetConfig(base_ch=4, use_skip_lstm=True)
    variables = temporal_unet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 2, 32, 32, 2))
    ref, _, _ = temporal_unet_apply(variables, x, cfg, train=False,
                                    policy=FP32_POLICY)
    qv = quantize_tree(variables)
    q, _, _ = temporal_unet_apply(qv, x, cfg, train=False,
                                  policy=DEFAULT_POLICY)
    assert _rel_l2(q, ref) < 0.08          # int8 + bf16-activation noise
    qf, _, _ = temporal_unet_apply(qv, x, cfg, train=False,
                                   policy=DEFAULT_POLICY,
                                   use_fused_doubleconv=True)
    np.testing.assert_array_equal(np.asarray(qf), np.asarray(q))


def test_quantized_wrong_axis_fails_loudly():
    """A transposed (HWOI) kernel quantized on the wrong axis must raise,
    not silently dequantize with wrong per-channel factors. The API can
    no longer produce this by default (the 'wt' tag fixes the axis), so
    force it with an explicit override."""
    p = conv_transpose2d_init(jax.random.PRNGKey(0), 16, 8, 2)
    bad = quantize_conv_params(p, out_axis=3)  # wrong: axis 3 = input chans
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, 16))
    with pytest.raises(ValueError, match="'wt' leaf"):
        conv_transpose2d(bad, x, policy=FP32_POLICY)


def test_quantize_tree_refuses_legacy_untagged_transposed_kernel():
    """A pre-rename checkpoint holding a transposed kernel as 'w' under an
    'up' block must be refused loudly — quantizing it as HWIO would skew
    every per-channel scale silently (its O==I shape would even pass the
    length check)."""
    w = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 8, 8))  # O == I
    legacy = {"params": {"up3": {"up": {"w": w}}}}
    with pytest.raises(ValueError, match="legacy checkpoint"):
        quantize_tree(legacy)


def test_chunked_mc_sum_balances_compile_shapes():
    """Chunk sizes are balanced so the jitted tracer sees at most two key
    shapes — often one (12@8 → 6+6, not 8+4 which would recompile for
    the remainder)."""
    from unet_convlstm_tpu.datagen.mc_reference import chunked_mc_sum

    calls = []

    def run(c, n):
        calls.append((c, n))
        return n

    assert chunked_mc_sum(run, 12, 8) == 12
    assert [n for _, n in calls] == [6, 6]
    assert [c for c, _ in calls] == [0, 6]
    calls.clear()
    chunked_mc_sum(run, 20, 8)
    assert [n for _, n in calls] == [7, 7, 6]
    calls.clear()
    chunked_mc_sum(run, 8, 0)
    assert [n for _, n in calls] == [8]


def test_calibrated_static_activation_scales():
    """VERDICT r4 #2 — the calibrated static-activation path: (a)
    calibration records a range for every conv site that executes,
    INCLUDING the scan-resident ConvLSTM cell conv (io_callback through
    lax.scan); (b) the calibrated forward tracks the float forward as
    closely as dynamic quant on in-distribution data; (c) a conv with a
    static scale compiles with NO reduction (the dynamic amax pass —
    the activation-byte cost this path removes — is gone)."""
    import functools

    from unet_convlstm_tpu.core.dtypes import FP32_POLICY
    from unet_convlstm_tpu.models.registry import build_model
    from unet_convlstm_tpu.ops.quant import (
        SiteTag, act_calibration, attach_act_scales, calibrate_tree,
        conv2d_int8, quantize_conv_params, quantize_tree)

    cfg = {"type": "custom", "base_ch": 8, "use_skip_lstm": True,
           "lstm_layers": 1}
    _, init_fn, apply_fn, _ = build_model(cfg)
    variables = init_fn(jax.random.PRNGKey(0))
    apply32 = functools.partial(apply_fn, policy=FP32_POLICY)
    rng = np.random.default_rng(0)
    batches = [rng.uniform(0, 1, (2, 3, 32, 32, 2)).astype(np.float32)
               for _ in range(3)]

    qvars = quantize_tree(variables)
    qcal = calibrate_tree(apply32, qvars, batches)

    # every site executed → every quantized leaf got a static scale
    n_sites = n_static = 0

    def count(node):
        nonlocal n_sites, n_static
        if isinstance(node, dict):
            if isinstance(node.get("site"), SiteTag):
                n_sites += 1
                n_static += int("x_s" in node)
            else:
                for v in node.values():
                    count(v)

    count(qcal["params"])
    assert n_sites > 10
    assert n_static == n_sites, (n_static, n_sites)

    x = jnp.asarray(batches[0])
    y_f, _, _ = apply32(variables, x, train=False)
    y_dyn, _, _ = apply32(qvars, x, train=False)
    y_cal, _, _ = apply32(qcal, x, train=False)

    def rel_l2(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))

    e_dyn, e_cal = rel_l2(y_dyn, y_f), rel_l2(y_cal, y_f)
    assert e_cal < max(2.0 * e_dyn, 0.10), (e_cal, e_dyn)

    # (c) single conv: static scale → reduce-free HLO; dynamic → has one
    p = quantize_conv_params(
        {"w": np.asarray(rng.standard_normal((3, 3, 4, 8)), np.float32)})
    xs = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    hlo_dyn = jax.jit(lambda x: conv2d_int8(p, x)).lower(xs).compile()
    p_cal = dict(p, x_s=jnp.float32(0.05))
    hlo_cal = jax.jit(lambda x: conv2d_int8(p_cal, x)).lower(xs).compile()
    assert " reduce(" in hlo_dyn.as_text()
    assert " reduce(" not in hlo_cal.as_text()

    # unexecuted sites stay dynamic
    with act_calibration() as ranges:
        pass
    qnone = attach_act_scales(qvars, ranges)
    leaves_with_xs = []

    def scan_xs(node):
        if isinstance(node, dict):
            if "x_s" in node:
                leaves_with_xs.append(node)
            for v in node.values():
                scan_xs(v)

    scan_xs(qnone["params"])
    assert leaves_with_xs == []


def test_act_calibration_does_not_nest():
    from unet_convlstm_tpu.ops.quant import act_calibration

    with act_calibration():
        with pytest.raises(RuntimeError, match="do not nest"):
            with act_calibration():
                pass
