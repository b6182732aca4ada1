"""End-to-end CLI integration: gen-mnist → train → evaluate → rollout,
entirely through the command surface (the reference's main.py →
get_metrics.py → test.py workflow)."""

import json
import os

import numpy as np
import pytest

from unet_convlstm_tpu.cli import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


@pytest.fixture(scope="module")
def npz_path(workdir):
    path = str(workdir / "mm.npz")
    main(["gen-mnist", "--out", path, "--seq-len", "3",
          "--num-samples", "12", "--image-size", "32",
          "--num-digits", "1", "--seed", "0", "--xy"])
    return path


def test_gen_mnist_layout(npz_path):
    data = np.load(npz_path)
    assert data["X"].shape == (12, 3, 2, 32, 32)
    assert data["Y"].shape == (12, 3, 1, 32, 32)


@pytest.fixture(scope="module")
def trained(workdir, npz_path):
    ckpt_dir = str(workdir / "ckpts")
    cfg = {"npz_path": npz_path, "batch_size": 8, "epochs": 1,
           "lr": 1e-3, "checkpoint_dir": ckpt_dir,
           "model": {"type": "custom", "base_ch": 4,
                     "use_skip_lstm": False, "lstm_layers": 1}}
    cfg_path = str(workdir / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    main(["train", "--config", cfg_path])
    return ckpt_dir


def test_train_writes_checkpoints(trained):
    names = os.listdir(trained)
    assert "custom_best" in names and "custom_last" in names
    with open(os.path.join(trained, "custom_best", "meta.json")) as f:
        meta = json.load(f)
    assert meta["config"]["model"]["base_ch"] == 4
    assert "norm_stats" in meta and "scheduler" in meta


def test_evaluate_cli(trained, npz_path, workdir):
    out_dir = str(workdir / "eval")
    main(["evaluate", "--checkpoint", os.path.join(trained, "custom_best"),
          "--npz", npz_path, "--out-dir", out_dir, "--batch-size", "4"])
    with open(os.path.join(out_dir, "report.json")) as f:
        report = json.load(f)
    assert report["mae"] > 0
    assert os.path.exists(os.path.join(out_dir, "metrics_summary_grid.png"))


def test_rollout_cli(trained, npz_path, workdir):
    out = str(workdir / "rollout.mp4")
    main(["rollout", "--checkpoint", os.path.join(trained, "custom_best"),
          "--npz", npz_path, "--sequence-idx", "1", "--out", out])
    assert os.path.getsize(out) > 5000


def test_evaluate_int8_cli(trained, npz_path, workdir):
    """--int8 quantized inference through the evaluate surface: runs end
    to end and the physical-unit metrics track the float run to int8
    noise (the trained checkpoint's MAE is O(0.5) m/s here)."""
    ref_dir, q_dir = str(workdir / "eval_f"), str(workdir / "eval_q")
    ckpt = os.path.join(trained, "custom_best")
    main(["evaluate", "--checkpoint", ckpt, "--npz", npz_path,
          "--out-dir", ref_dir, "--batch-size", "4"])
    main(["evaluate", "--checkpoint", ckpt, "--npz", npz_path,
          "--out-dir", q_dir, "--batch-size", "4", "--int8"])
    with open(os.path.join(ref_dir, "report.json")) as f:
        ref = json.load(f)
    with open(os.path.join(q_dir, "report.json")) as f:
        q = json.load(f)
    assert abs(q["mae"] - ref["mae"]) < 0.1 * max(ref["mae"], 0.1)


def test_evaluate_int8_calibrated_cli(trained, npz_path, workdir):
    """--int8 --int8-calib N: static activation scales calibrated on N
    train batches (VERDICT r4 #2). Same accuracy contract as dynamic
    int8 — calibration only changes WHERE the scale comes from, and the
    val split is in-distribution with the calibration data."""
    ref_dir = str(workdir / "eval_f2")
    c_dir = str(workdir / "eval_qc")
    ckpt = os.path.join(trained, "custom_best")
    main(["evaluate", "--checkpoint", ckpt, "--npz", npz_path,
          "--out-dir", ref_dir, "--batch-size", "4"])
    main(["evaluate", "--checkpoint", ckpt, "--npz", npz_path,
          "--out-dir", c_dir, "--batch-size", "4", "--int8",
          "--int8-calib", "2"])
    with open(os.path.join(ref_dir, "report.json")) as f:
        ref = json.load(f)
    with open(os.path.join(c_dir, "report.json")) as f:
        q = json.load(f)
    assert abs(q["mae"] - ref["mae"]) < 0.1 * max(ref["mae"], 0.1)


def test_convert_checkpoint_to_torch_cli(trained, workdir):
    """Reverse migration: export a trained checkpoint to the reference's
    .pt format; the file must load as {model_state, config} and round-trip
    through the forward converter to identical weights."""
    import numpy as np
    import torch

    from unet_convlstm_tpu.train.checkpoint import restore_checkpoint
    from unet_convlstm_tpu.utils.torch_weights import (
        convert_temporal_unet_checkpoint)

    out_pt = str(workdir / "exported.pt")
    main(["convert-checkpoint", "--checkpoint",
          os.path.join(trained, "custom_best"), "--to-torch", out_pt])
    ckpt = torch.load(out_pt, map_location="cpu", weights_only=True)
    assert ckpt["config"]["type"] == "custom"
    assert ckpt["config"]["base_ch"] == 4
    back = convert_temporal_unet_checkpoint(ckpt["model_state"])
    state, _ = restore_checkpoint(os.path.join(trained, "custom_best"))
    orig = np.asarray(state["params"]["outc"]["w"], np.float32)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["outc"]["w"], np.float32), orig)


def test_override_bool_for_untyped_model_keys():
    """model.freeze_encoder=false must become the BOOLEAN False even
    though the default model dict has no such key — a truthy 'false'
    string would freeze the encoder the user explicitly unfroze."""
    from unet_convlstm_tpu.train.config import TrainConfig

    cfg = TrainConfig().apply_overrides(
        {"model.type": "resnet18", "model.freeze_encoder": "false"})
    assert cfg.model["freeze_encoder"] is False
    cfg = TrainConfig().apply_overrides({"model.freeze_encoder": "true"})
    assert cfg.model["freeze_encoder"] is True


def test_registry_freeze_fallback_reaches_optimizer_mask():
    """When no ImageNet weights exist, the registry falls back to
    freeze_encoder=False — and the optimizer's trainable mask must see
    that RESOLVED decision, not re-derive 'freeze' from the raw request
    (which silently froze a random encoder)."""
    from unet_convlstm_tpu.models.registry import build_model
    from unet_convlstm_tpu.train.loop import _trainable_mask

    cfg_dict = {"type": "resnet18", "lstm_layers": 1}
    build_model(cfg_dict)      # resolves freeze (no .pth in this image)
    assert cfg_dict["freeze_encoder"] is False
    assert _trainable_mask({"encoder": {"w": None}}, cfg_dict) is None


def test_quantized_checkpoint_roundtrip(trained, npz_path, workdir):
    """convert-checkpoint --quantize writes an int8 checkpoint that
    evaluate loads DIRECTLY (the conv ops dispatch on the quantized
    leaves — no --int8 flag needed) with metrics at int8 noise."""
    qdir = str(workdir / "qckpt")
    main(["convert-checkpoint", "--checkpoint",
          os.path.join(trained, "custom_best"), "--quantize", qdir])
    out_dir = str(workdir / "eval_qckpt")
    main(["evaluate", "--checkpoint", qdir, "--npz", npz_path,
          "--out-dir", out_dir, "--batch-size", "4"])
    # float reference produced HERE (not borrowed from another test's
    # output dir — the test must stand alone under -k selection)
    ref_dir = str(workdir / "eval_qref")
    main(["evaluate", "--checkpoint", os.path.join(trained, "custom_best"),
          "--npz", npz_path, "--out-dir", ref_dir, "--batch-size", "4"])
    with open(os.path.join(out_dir, "report.json")) as f:
        q = json.load(f)
    with open(os.path.join(ref_dir, "report.json")) as f:
        ref = json.load(f)
    assert abs(q["mae"] - ref["mae"]) < 0.1 * max(ref["mae"], 0.1)
    # int8 kernels on disk: the quantized state is ~4x smaller
    import subprocess
    qs = int(subprocess.check_output(["du", "-sb", qdir]).split()[0])
    fs = int(subprocess.check_output(
        ["du", "-sb", os.path.join(trained, "custom_best")]).split()[0])
    assert qs < 0.6 * fs


def test_doctor_cpu(capsys):
    """The environment self-check passes on the CPU platform (the
    test-suite configuration) and exercises every probe."""
    main(["doctor", "--platform", "cpu", "--device-timeout", "120"])
    out = capsys.readouterr().out
    assert "doctor: all checks passed" in out
    assert "PROBE_OK cpu" in out
    assert "MESH_OK 8" in out
