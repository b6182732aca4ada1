"""Reference-checkpoint interop: convert a real reference model's
state_dict and verify FULL-MODEL numerical parity of the forward pass.

The oracle is the reference TemporalUNetDualView itself, executed as a black
box from /root/reference (torch CPU). This is the strongest parity evidence:
same weights, same input → same output sequence.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from unet_convlstm_tpu.core.dtypes import FP32_POLICY
from unet_convlstm_tpu.models.temporal_unet import (
    TemporalUNetConfig, temporal_unet_apply,
)
from unet_convlstm_tpu.utils.torch_weights import (
    convert_temporal_unet_checkpoint,
    convert_pretrained_temporal_unet_checkpoint,
)


def _load_ref_unet():
    spec = importlib.util.spec_from_file_location(
        "ref_unet", "/root/reference/train/unet.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_unet"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("use_attention,use_skip_lstm",
                         [(False, True), (True, False)])
def test_full_model_parity_with_reference(rng, use_attention, use_skip_lstm):
    ref = _load_ref_unet()
    torch.manual_seed(0)
    model = ref.TemporalUNetDualView(
        in_channels_per_sat=1, out_channels=1, base_ch=8, lstm_layers=1,
        use_skip_lstm=use_skip_lstm, use_attention=use_attention)
    model.eval()

    x = rng.standard_normal((1, 3, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out, _ = model(torch.from_numpy(x))
        y_ref = torch.stack(out, dim=1).numpy()  # [1,3,1,32,32]

    variables = convert_temporal_unet_checkpoint(model.state_dict())
    cfg = TemporalUNetConfig(base_ch=8, lstm_layers=1,
                             use_skip_lstm=use_skip_lstm,
                             use_attention=use_attention)
    x_nhwc = jnp.asarray(np.moveaxis(x, 2, -1))
    y, _, _ = temporal_unet_apply(variables, x_nhwc, cfg, train=False,
                                  policy=FP32_POLICY)
    y_ours = np.moveaxis(np.asarray(y), -1, 2)
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-3, atol=1e-4)


def _synthetic_resnet_sd():
    """Synthetic state_dict with the exact reference PretrainedTemporalUNet
    naming (resnet18.py module attributes + smp internals) — smp isn't
    installed, so this is the naming oracle for both converter directions."""
    sd = {}
    # encoder (torchvision resnet18 layout, in_channels=2)
    sd["encoder.conv1.weight"] = torch.randn(64, 2, 7, 7)
    for bn in ("encoder.bn1",):
        sd[f"{bn}.weight"] = torch.ones(64)
        sd[f"{bn}.bias"] = torch.zeros(64)
        sd[f"{bn}.running_mean"] = torch.zeros(64)
        sd[f"{bn}.running_var"] = torch.ones(64)
    plan = [(1, 64, 64, False), (2, 64, 128, True), (3, 128, 256, True),
            (4, 256, 512, True)]
    for li, cin, cout, down in plan:
        for bi in range(2):
            pre = f"encoder.layer{li}.{bi}"
            c1in = cin if bi == 0 else cout
            sd[f"{pre}.conv1.weight"] = torch.randn(cout, c1in, 3, 3)
            sd[f"{pre}.conv2.weight"] = torch.randn(cout, cout, 3, 3)
            for bn in ("bn1", "bn2"):
                sd[f"{pre}.{bn}.weight"] = torch.ones(cout)
                sd[f"{pre}.{bn}.bias"] = torch.zeros(cout)
                sd[f"{pre}.{bn}.running_mean"] = torch.zeros(cout)
                sd[f"{pre}.{bn}.running_var"] = torch.ones(cout)
            if down and bi == 0:
                sd[f"{pre}.downsample.0.weight"] = torch.randn(cout, cin, 1, 1)
                sd[f"{pre}.downsample.1.weight"] = torch.ones(cout)
                sd[f"{pre}.downsample.1.bias"] = torch.zeros(cout)
                sd[f"{pre}.downsample.1.running_mean"] = torch.zeros(cout)
                sd[f"{pre}.downsample.1.running_var"] = torch.ones(cout)
    # smp decoder blocks + head
    in_chs = (512, 256, 128, 64, 32)
    skip_chs = (256, 128, 64, 64, 0)
    out_chs = (256, 128, 64, 32, 16)
    for i, (ci, cs, co) in enumerate(zip(in_chs, skip_chs, out_chs)):
        sd[f"decoder.blocks.{i}.conv1.0.weight"] = torch.randn(co, ci + cs, 3, 3)
        sd[f"decoder.blocks.{i}.conv2.0.weight"] = torch.randn(co, co, 3, 3)
        for c in ("conv1", "conv2"):
            sd[f"decoder.blocks.{i}.{c}.1.weight"] = torch.ones(co)
            sd[f"decoder.blocks.{i}.{c}.1.bias"] = torch.zeros(co)
            sd[f"decoder.blocks.{i}.{c}.1.running_mean"] = torch.zeros(co)
            sd[f"decoder.blocks.{i}.{c}.1.running_var"] = torch.ones(co)
    sd["segmentation_head.0.weight"] = torch.randn(1, 16, 3, 3)
    sd["segmentation_head.0.bias"] = torch.zeros(1)
    # bottleneck lstm + skip lstms for features 0..4 (0 = identity, dropped)
    for pre, cin in [("lstm", 512)] + [
            (f"lstm_skips.{i}", ch) for i, ch in
            enumerate((2, 64, 64, 128, 256))]:
        hid = cin
        sd[f"{pre}.layers.0.conv.weight"] = torch.randn(4 * hid, 2 * cin, 3, 3)
        sd[f"{pre}.layers.0.conv.bias"] = torch.zeros(4 * hid)
    return sd


def test_pretrained_checkpoint_converter_structure():
    sd = _synthetic_resnet_sd()
    variables = convert_pretrained_temporal_unet_checkpoint(sd)
    p = variables["params"]
    assert p["encoder"]["conv1"]["w"].shape == (7, 7, 2, 64)
    assert p["decoder"]["block0"]["conv1"]["w"].shape == (3, 3, 768, 256)
    assert p["decoder"]["head"]["w"].shape == (3, 3, 16, 1)
    assert p["temporal"]["layer0"]["conv"]["w"].shape == (3, 3, 1024, 2048)
    # skip{i} ← lstm_skips.{i+1}: our skip0 is the 64-ch level, not 2-ch
    assert p["skip0"]["layer0"]["conv"]["w"].shape == (3, 3, 128, 256)
    assert p["skip3"]["layer0"]["conv"]["w"].shape == (3, 3, 512, 1024)

    # converted tree drops into the model and runs
    import jax
    from unet_convlstm_tpu.models.resnet_unet import (
        ResNetUNetConfig, resnet_unet_apply)
    cfg = ResNetUNetConfig(lstm_layers=1)
    x = jnp.zeros((1, 1, 64, 64, 2))
    y, _, _ = resnet_unet_apply(variables, x, cfg, train=False)
    assert y.shape == (1, 1, 64, 64, 1)


def test_convert_checkpoint_cli(tmp_path, rng):
    """Save a reference-format .pt, convert via CLI, evaluate-load it."""
    ref = _load_ref_unet()
    torch.manual_seed(1)
    model = ref.TemporalUNetDualView(in_channels_per_sat=1, out_channels=1,
                                     base_ch=4, lstm_layers=1,
                                     use_skip_lstm=False,
                                     use_attention=False)
    pt = str(tmp_path / "ref.pt")
    torch.save({"model_state": model.state_dict(),
                "config": {"type": "custom", "base_ch": 4,
                           "use_skip_lstm": False, "use_attention": False},
                "val_loss": 0.1, "epoch": 7}, pt)
    from unet_convlstm_tpu.cli import main
    main(["convert-checkpoint", "--torch-ckpt", pt,
          "--out-dir", str(tmp_path / "ck")])
    out = tmp_path / "ck" / "custom_converted"
    assert out.is_dir()
    from unet_convlstm_tpu.cli import _load_checkpoint_for_eval
    variables, apply_fn, init_state, meta, _ = _load_checkpoint_for_eval(
        str(out))
    assert meta["epoch"] == 7
    y, _, _ = apply_fn(variables, jnp.zeros((1, 2, 32, 32, 2)), train=False)
    assert y.shape == (1, 2, 32, 32, 1)


def test_convert_checkpoint_cli_infers_flags_from_weights(tmp_path):
    """A .pt whose config omits the architecture flags (hand-rolled or a
    raw state_dict) must still convert to a checkpoint that APPLIES: the
    registry would otherwise back-fill use_skip_lstm=True/base_ch=64
    (its production defaults) against skip-LSTM-less base_ch-8 weights
    and fail with KeyError 'skip3' at eval (observed live 2026-08-18)."""
    ref = _load_ref_unet()
    torch.manual_seed(2)
    model = ref.TemporalUNetDualView(in_channels_per_sat=1, out_channels=1,
                                     base_ch=8)  # reference defaults:
    # use_skip_lstm=False, use_attention=False (unet.py:132)
    pt = str(tmp_path / "ref_minimal.pt")
    torch.save({"model_state": model.state_dict(),
                "config": {"in_channels_per_sat": 1, "out_channels": 1,
                           "base_ch": 8}}, pt)
    from unet_convlstm_tpu.cli import main
    main(["convert-checkpoint", "--torch-ckpt", pt,
          "--out-dir", str(tmp_path / "ck")])
    from unet_convlstm_tpu.cli import _load_checkpoint_for_eval
    variables, apply_fn, init_state, meta, _ = _load_checkpoint_for_eval(
        str(tmp_path / "ck" / "custom_converted"))
    assert meta["config"]["use_skip_lstm"] is False
    assert meta["config"]["base_ch"] == 8
    y, _, _ = apply_fn(variables, jnp.zeros((1, 2, 32, 32, 2)), train=False)
    assert y.shape == (1, 2, 32, 32, 1)


def test_convert_checkpoint_cli_infers_channels_from_weights(tmp_path):
    """Round-3 review finding: the structural inference must also derive
    out_channels (the wvu 3-channel family) and in_channels_per_sat — a
    RAW multi-channel state_dict (no config blob at all) otherwise gets
    the registry's 1-channel defaults embedded and every downstream
    consumer (init_state, serve validation, evaluate) mismatches the
    actual weights."""
    ref = _load_ref_unet()
    torch.manual_seed(3)
    model = ref.TemporalUNetDualView(in_channels_per_sat=2, out_channels=3,
                                     base_ch=8)
    pt = str(tmp_path / "ref_raw_wvu.pt")
    torch.save(model.state_dict(), pt)  # raw state_dict, no config at all
    from unet_convlstm_tpu.cli import main
    main(["convert-checkpoint", "--torch-ckpt", pt,
          "--out-dir", str(tmp_path / "ck")])
    from unet_convlstm_tpu.cli import _load_checkpoint_for_eval
    variables, apply_fn, init_state, meta, _ = _load_checkpoint_for_eval(
        str(tmp_path / "ck" / "custom_converted"))
    assert meta["config"]["out_channels"] == 3
    assert meta["config"]["in_channels_per_sat"] == 2
    y, _, _ = apply_fn(variables, jnp.zeros((1, 2, 32, 32, 4)), train=False)
    assert y.shape == (1, 2, 32, 32, 3)


@pytest.mark.parametrize("use_attention,use_skip_lstm",
                         [(False, True), (True, True)])
def test_export_to_reference_strict_load_and_parity(rng, use_attention,
                                                    use_skip_lstm):
    """Reverse direction: init OUR model, export to the reference's
    state_dict naming, strict-load into the reference TemporalUNetDualView
    (black-box oracle), and check forward parity — users can train here
    and switch BACK to the reference's torch tooling."""
    from unet_convlstm_tpu.models.temporal_unet import temporal_unet_init
    from unet_convlstm_tpu.utils.torch_weights import (
        export_temporal_unet_checkpoint)

    import jax

    cfg = TemporalUNetConfig(base_ch=8, lstm_layers=1,
                             use_skip_lstm=use_skip_lstm,
                             use_attention=use_attention)
    variables = temporal_unet_init(jax.random.PRNGKey(7), cfg)
    sd = export_temporal_unet_checkpoint(variables)

    ref = _load_ref_unet()
    model = ref.TemporalUNetDualView(
        in_channels_per_sat=1, out_channels=1, base_ch=8, lstm_layers=1,
        use_skip_lstm=use_skip_lstm, use_attention=use_attention)
    # strict=True raises on any key/shape mismatch — that IS the assert
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    model.eval()

    x = rng.standard_normal((1, 3, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out, _ = model(torch.from_numpy(x))
        y_ref = torch.stack(out, dim=1).numpy()
    y, _, _ = temporal_unet_apply(variables,
                                  jnp.asarray(np.moveaxis(x, 2, -1)),
                                  cfg, train=False, policy=FP32_POLICY)
    y_ours = np.moveaxis(np.asarray(y), -1, 2)
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-3, atol=1e-4)


def test_export_roundtrip_is_identity(rng):
    """export → convert must reproduce the original variables exactly."""
    from unet_convlstm_tpu.models.temporal_unet import temporal_unet_init
    from unet_convlstm_tpu.utils.torch_weights import (
        export_temporal_unet_checkpoint)

    import jax

    cfg = TemporalUNetConfig(base_ch=4, lstm_layers=2, use_skip_lstm=True,
                             use_attention=True)
    variables = temporal_unet_init(jax.random.PRNGKey(8), cfg)
    sd = export_temporal_unet_checkpoint(variables)
    back = convert_temporal_unet_checkpoint(sd)

    flat_a, _ = jax.tree_util.tree_flatten_with_path(
        {"params": variables["params"], "stats": variables["stats"]})
    flat_b, _ = jax.tree_util.tree_flatten_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(va, np.float32),
                                      np.asarray(vb, np.float32),
                                      err_msg=jax.tree_util.keystr(pa))


def test_export_accepts_pre_rename_checkpoint(rng):
    """Float checkpoints written before the structural 'wt' rename store
    transposed kernels as 'w'; --to-torch export must still work (round-3
    review: the unconditional ['wt'] read crashed them)."""
    from unet_convlstm_tpu.models.temporal_unet import temporal_unet_init
    from unet_convlstm_tpu.train.checkpoint import _rename_to_legacy_keys
    from unet_convlstm_tpu.utils.torch_weights import (
        export_temporal_unet_checkpoint)

    import jax

    cfg = TemporalUNetConfig(base_ch=4, lstm_layers=1, use_skip_lstm=False)
    variables = temporal_unet_init(jax.random.PRNGKey(9), cfg)
    legacy, n = _rename_to_legacy_keys(variables)
    assert n > 0
    sd_new = export_temporal_unet_checkpoint(variables)
    sd_old = export_temporal_unet_checkpoint(legacy)
    assert sd_new.keys() == sd_old.keys()
    for k in sd_new:
        np.testing.assert_array_equal(sd_new[k], sd_old[k], err_msg=k)


def test_resnet_export_roundtrip_and_naming():
    """ResNet-family reverse export: key set must equal the reference's
    naming oracle (+ num_batches_tracked, which torch BN state_dicts carry),
    and import(export(v)) must reproduce every mapped weight exactly.
    lstm_skips.0 (the identity-stage LSTM whose output the smp decoder
    drops) is zero-filled with the oracle's shapes."""
    import jax

    from unet_convlstm_tpu.utils.torch_weights import (
        export_pretrained_temporal_unet_checkpoint)

    sd = _synthetic_resnet_sd()
    variables = convert_pretrained_temporal_unet_checkpoint(sd)
    out = export_pretrained_temporal_unet_checkpoint(variables)

    want = {k for k in sd}
    got = {k for k in out if not k.endswith("num_batches_tracked")}
    assert got == want, (sorted(got - want), sorted(want - got))
    for k in sd:
        ref = np.asarray(sd[k].numpy() if hasattr(sd[k], "numpy") else sd[k],
                         np.float32)
        if k.startswith("lstm_skips.0."):
            assert out[k].shape == ref.shape, k
            assert not out[k].any()
            continue
        np.testing.assert_array_equal(out[k], ref, err_msg=k)

    back = convert_pretrained_temporal_unet_checkpoint(out)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(variables)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(va, np.float32),
                                      np.asarray(vb, np.float32),
                                      err_msg=jax.tree_util.keystr(pa))
