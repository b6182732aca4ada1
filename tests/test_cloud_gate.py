"""Automated cloud-pipeline acceptance gate (VERDICT round-1 #10).

Promotes the ad-hoc round-1 golden run into a thresholded test: synthetic
structured clouds → stage B/C/D → training → val MAE gate. Marked slow
(~3-4 min on the CI CPU); the production-geometry variant runs via
``python -m unet_convlstm_tpu cloud-gate --production`` on a TPU.
"""

import os

import numpy as np
import pytest

from unet_convlstm_tpu.train.cloud_gate import (
    CloudGateConfig, run_cloud_gate, synthesize_cloud_patches)


def test_synthetic_clouds_have_learnable_structure(tmp_path):
    """W must be tied to β (cores updraft) — otherwise the gate would be
    measuring noise-fitting."""
    import os
    import pickle

    cfg = CloudGateConfig(n_folders=1, n_samples=2)
    synthesize_cloud_patches(str(tmp_path), cfg)
    folder = sorted(os.listdir(tmp_path))[0]
    f = sorted(os.listdir(tmp_path / folder))[0]
    with open(tmp_path / folder / f, "rb") as fh:
        p = pickle.load(fh)
    beta, w = p["beta_ext"], p["W"]
    assert beta.max() > 0.01 and (beta == 0).any()
    in_cloud = beta > 0.5 * beta.max()
    out_cloud = beta == 0
    assert w[in_cloud].mean() > 1.0          # cores rise
    assert abs(w[out_cloud]).max() < 1e-6    # clear air is quiet
    # correlation between the radiating medium and the target field
    r = np.corrcoef(beta.ravel(), w.ravel())[0, 1]
    assert r > 0.5


def test_cloud_gate_mc_renders_plumb(tmp_path):
    """--mc-spp: stage B renders with the unbiased MC path tracer (the
    volpath-class training distribution) and the rest of the gate
    composes unchanged. Tiny geometry — this checks the plumbing and that
    MC renders carry learnable signal, not convergence (the production MC
    golden is results/cloud_synth_golden_r2_mc.json)."""
    import dataclasses

    cfg = dataclasses.replace(
        CloudGateConfig(), nz=8, nxy=16, n_folders=2, n_samples=4,
        render_res=16, out_size=16, base_ch=4, epochs=2, batch_size=2,
        mc_spp=4, mc_majorant_cell=4, render_batch_size=2,
        mae_threshold=50.0)
    res = run_cloud_gate(str(tmp_path / "gate"), cfg, verbose=False)
    assert res["config"]["mc_spp"] == 4
    assert res["config"]["render_batch_size"] == 2
    assert res["passed"]


def test_cloud_gate_resnet_family_plumbs(tmp_path):
    """--model-family resnet18: the gate trains the reference DRIVER's
    default family (PretrainedTemporalUNet, main.py:213 USE_PRETRAINED)
    on the cloud pipeline. Tiny geometry (32² — the ResNet encoder
    downsamples 32×), encoder trained (no ImageNet .pth in this image);
    checks plumbing + that the checkpoint-embedded config dispatches the
    resnet family, not convergence (the production golden is
    results/cloud_resnet_golden_r3_T12.json)."""
    import dataclasses

    cfg = dataclasses.replace(
        CloudGateConfig(), nz=8, nxy=32, n_folders=2, n_samples=4,
        render_res=32, out_size=32, epochs=2, batch_size=2,
        model_family="resnet18", mae_threshold=50.0)
    res = run_cloud_gate(str(tmp_path / "gate"), cfg, verbose=False)
    # plumbing assertions only: 2 epochs of an 11M-param resnet on 3
    # train sequences moves val MAE by ~0.3% — too thin to gate
    # "improved" on deterministically (convergence is the production
    # golden's job)
    assert res["config"]["model_family"] == "resnet18"
    epochs = [h for h in res["history"] if "val_mae" in h]
    assert len(epochs) == 2
    assert all(np.isfinite(h["val_mae"]) for h in epochs)
    assert res["best_val_mae"] < 50.0

    # the family knob is a TRAINING knob: a reuse_dataset run may switch
    # families on the same rendered corpus
    cfg2 = dataclasses.replace(cfg, model_family="custom", base_ch=4)
    res2 = run_cloud_gate(str(tmp_path / "gate"), cfg2, verbose=False,
                          reuse_dataset=True)
    assert res2["passed"] and res2["config"]["model_family"] == "custom"

    with pytest.raises(ValueError, match="model_family"):
        run_cloud_gate(str(tmp_path / "gate2"),
                       dataclasses.replace(cfg, model_family="nope"),
                       verbose=False)


@pytest.mark.slow
def test_cloud_gate_reduced_geometry(tmp_path):
    """The CI-runnable gate: full B/C/D + training at reduced geometry
    must reach val MAE < 1.3 (calibrated convergence ~1.1; a pipeline
    regression stalls at ~2.3+)."""
    res = run_cloud_gate(str(tmp_path / "gate"),
                         out_json=str(tmp_path / "gate.json"),
                         verbose=False)
    assert res["improved"], (
        f"training never improved: {res['first_epoch_val_mae']:.3f} -> "
        f"{res['best_val_mae']:.3f}")
    assert res["passed"], (
        f"best val MAE {res['best_val_mae']:.3f} above threshold "
        f"{res['mae_threshold']}")
    assert res["best_val_mae"] <= res["final_val_mae"] + 1e-9


def test_judge_history_survives_guard_rows():
    """Guard-event rows carry no val_mae (train/loop.py rollback rows);
    the gate verdict must judge completed epochs only instead of crashing
    on the exact event the guard exists to survive."""
    from unet_convlstm_tpu.train.cloud_gate import judge_history

    hist = [
        {"epoch": 1, "val_mae": 2.0, "val_rmse": 3.0},
        {"epoch": 2, "lr": 1e-3, "guard_event": "val spiked"},
        {"epoch": 3, "val_mae": 0.5, "val_rmse": 1.0},
        {"epoch": 4, "lr": 5e-4, "guard_event": "nan loss"},
    ]
    res = judge_history(hist, mae_threshold=1.0)
    assert res["best_epoch"] == 3
    assert res["best_val_mae"] == 0.5
    assert res["final_val_mae"] == 0.5      # last COMPLETED epoch
    assert res["passed"] and res["improved"]

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="guard"):
        judge_history([{"epoch": 1, "guard_event": "x"}], 1.0)


def test_cloud_gate_reuse_dataset(tmp_path, monkeypatch):
    """reuse_dataset=True retrains on the existing work-dir dataset
    without re-running stages B/C/D — and rebuilds when the
    dataset-shaping config differs (the sidecar guards against silently
    training on a stale corpus)."""
    import dataclasses
    import unet_convlstm_tpu.train.cloud_gate as cg

    cfg = dataclasses.replace(
        CloudGateConfig(), nz=8, nxy=16, n_folders=2, n_samples=4,
        render_res=16, out_size=16, base_ch=4, epochs=2, batch_size=2,
        mae_threshold=50.0)
    work = str(tmp_path / "gate")
    run_cloud_gate(work, cfg, verbose=False)

    def boom(*a, **k):
        raise AssertionError("stage B ran despite reuse_dataset")

    # same dataset config, more epochs -> stage B must NOT run
    monkeypatch.setattr(cg, "render_dataset", boom, raising=False)
    import unet_convlstm_tpu.datagen.render_batch as rb
    monkeypatch.setattr(rb, "render_dataset", boom)
    cfg2 = dataclasses.replace(cfg, epochs=3)
    res = run_cloud_gate(work, cfg2, verbose=False, reuse_dataset=True)
    assert len([h for h in res["history"] if "val_mae" in h]) == 3

    # sequence-only change (map_type w -> wvu) -> stage D rebuilds on the
    # EXISTING renders/maps, stage B must still not run (round-3 feature:
    # target-channel sweeps cost seconds, not a re-render)
    cfg_wvu = dataclasses.replace(cfg2, map_type="wvu")
    res = run_cloud_gate(work, cfg_wvu, verbose=False, reuse_dataset=True)
    assert len([h for h in res["history"] if "val_mae" in h]) == 3
    import json as _json
    side = _json.load(open(os.path.join(work, "gate_dataset.json")))
    assert side["config"]["map_type"] == "wvu"
    assert side["npz"].endswith("cloud_wvu.npz")
    assert np.load(side["npz"])["Y"].shape[2] == 3  # 3 target channels

    # and a full-config match on the NEW sidecar still reuses outright
    res = run_cloud_gate(work, cfg_wvu, verbose=False, reuse_dataset=True)
    assert res["history"]

    # render-shaping change -> rebuild is required (and here, loud)
    cfg3 = dataclasses.replace(cfg, seed=cfg.seed + 1)
    with pytest.raises(AssertionError, match="stage B ran"):
        run_cloud_gate(work, cfg3, verbose=False, reuse_dataset=True)


@pytest.mark.slow
def test_cloud_gate_rebuild_clears_stale_stages(tmp_path):
    """Shrinking n_folders on a rebuild-in-place must not blend the old
    corpus into the new dataset: the stage drivers only ADD folders and
    stage D scans all of them (sequences.py), so a config-mismatch
    rebuild clears every stale stage output first."""
    import dataclasses

    cfg = dataclasses.replace(
        CloudGateConfig(), nz=8, nxy=16, n_folders=3, n_samples=4,
        render_res=16, out_size=16, base_ch=4, epochs=1, batch_size=2,
        mae_threshold=50.0)
    work = str(tmp_path / "gate")
    run_cloud_gate(work, cfg, verbose=False)
    assert len(os.listdir(os.path.join(work, "renders"))) == 3

    cfg2 = dataclasses.replace(cfg, n_folders=2)
    run_cloud_gate(work, cfg2, verbose=False, reuse_dataset=True)
    for sub in ("patches", "renders", "maps"):
        assert len(os.listdir(os.path.join(work, sub))) == 2, sub


def test_cli_geometry_overrides_reach_config(monkeypatch):
    """--seq-len/--n-folders/--n-samples/--epochs/--batch-size must reach
    CloudGateConfig — the knobs that run the gate at the reference's
    temporal contract (T=12 × 49/chunk, build_sequences.py:15-16)."""
    import unet_convlstm_tpu.cli as cli

    seen = {}

    def fake_run(work_dir, cfg, out_json=None, reuse_dataset=False):
        seen.update(cfg.__dict__)
        return {"passed": True}

    monkeypatch.setattr("unet_convlstm_tpu.train.cloud_gate.run_cloud_gate",
                        fake_run)
    with pytest.raises(SystemExit) as e:
        cli.main(["cloud-gate", "--work-dir", "/tmp/x", "--production",
                  "--seq-len", "12", "--n-folders", "12",
                  "--n-samples", "16", "--epochs", "6",
                  "--batch-size", "8"])
    assert e.value.code == 0
    assert seen["seq_len"] == 12 and seen["n_folders"] == 12
    assert seen["n_samples"] == 16 and seen["epochs"] == 6
    assert seen["batch_size"] == 8
    assert seen["nxy"] == 128 and seen["base_ch"] == 64  # production base


def test_bomex_nc_stage_a_roundtrip(tmp_path):
    """from_nc stage A: the synthesized BOMEX-layout .nc files, ingested
    by the REAL lespatch tiling, must reproduce the intended cartoon
    cloud — β through the actual microphysics chain matches the puff
    target (QN inversion is exact up to f32 storage), patch counts match
    the tiling arithmetic, and W/U/V survive the slice path."""
    import dataclasses
    import pickle

    from unet_convlstm_tpu.datagen.lespatch import process_all_nc_files
    from unet_convlstm_tpu.train.cloud_gate import (_grid_factors,
                                                    _puff_fields,
                                                    synthesize_bomex_nc)

    cfg = dataclasses.replace(
        CloudGateConfig(), nz=8, nxy=16, n_folders=2, n_samples=6, seed=3)
    nc_dir, patches = str(tmp_path / "nc"), str(tmp_path / "patches")
    stride, (ny, nx) = synthesize_bomex_nc(nc_dir, cfg)

    ry, rx = _grid_factors(cfg.n_samples)
    assert (ry, rx) == (2, 3)
    assert (ny, nx) == (16 + stride, 16 + 2 * stride)

    counts = process_all_nc_files(nc_dir, patches, verbose=False,
                                  patch_size=cfg.nxy, stride=stride)
    assert list(counts.values()) == [cfg.n_samples] * cfg.n_folders

    # rebuild the intended full-grid fields from the ground-truth sidecar
    # (decoupled from synthesize_bomex_nc's RNG draw order)
    truth = np.load(os.path.join(nc_dir, "ground_truth.npz"))
    assert truth["centers"].shape[1] == 4 and truth["drift"].shape == (2,)
    target = _puff_fields(cfg, truth["centers"], (cfg.nz, ny, nx))

    folders = sorted(os.listdir(patches))
    assert folders == ["0000001000", "0000001020"]
    first = os.path.join(patches, folders[0])
    with open(os.path.join(first, "sample_000.pkl"), "rb") as f:
        p0 = pickle.load(f)
    ys, ye = p0["metadata"]["coords_y"]
    xs, xe = p0["metadata"]["coords_x"]
    want = target["beta_ext"][:, ys:ye, xs:xe]
    got = p0["beta_ext"]
    assert got.shape == (cfg.nz, cfg.nxy, cfg.nxy)
    # β restored through the real microphysics: f32-storage accuracy
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-6)
    np.testing.assert_allclose(p0["W"], target["W"][:, ys:ye, xs:xe],
                               rtol=1e-5, atol=1e-6)
    assert got.max() > 0.01  # a real cloud landed in patch 0 or stayed 0
    # every patch must carry SOME signal across the corpus
    total = 0.0
    for s in sorted(os.listdir(first)):
        with open(os.path.join(first, s), "rb") as f:
            total += pickle.load(f)["beta_ext"].sum()
    assert total > 0


def test_cloud_gate_from_nc(tmp_path):
    """The one-stage-earlier gate: .nc → lespatch → B/C/D → train runs
    end-to-end at tiny geometry, and the sidecar records from_nc so a
    reuse with the direct-patch config rebuilds."""
    import dataclasses
    import json

    cfg = dataclasses.replace(
        CloudGateConfig(), nz=8, nxy=16, n_folders=2, n_samples=4,
        render_res=16, out_size=16, base_ch=4, epochs=2, batch_size=2,
        from_nc=True, mae_threshold=50.0)
    work = str(tmp_path / "gate")
    res = run_cloud_gate(work, cfg, verbose=False)
    assert res["passed"]
    assert res["config"]["from_nc"] is True
    assert os.path.isdir(os.path.join(work, "nc"))
    with open(os.path.join(work, "gate_dataset.json")) as f:
        assert json.load(f)["config"]["from_nc"] is True


def test_cli_pretrain_freeze_knobs_reach_config(monkeypatch):
    """--seed/--checkpoint-dir/--pretrained-path/--freeze-encoder (the
    round-4 pretrain→freeze transfer flow) must reach CloudGateConfig."""
    import unet_convlstm_tpu.cli as cli

    seen = {}

    def fake_run(work_dir, cfg, out_json=None, reuse_dataset=False):
        seen.update(cfg.__dict__)
        return {"passed": True}

    monkeypatch.setattr("unet_convlstm_tpu.train.cloud_gate.run_cloud_gate",
                        fake_run)
    with pytest.raises(SystemExit) as e:
        cli.main(["cloud-gate", "--work-dir", "/tmp/x", "--production",
                  "--model-family", "resnet18", "--seed", "7",
                  "--checkpoint-dir", "/tmp/ck",
                  "--pretrained-path", "/tmp/enc.pth",
                  "--freeze-encoder"])
    assert e.value.code == 0
    assert seen["seed"] == 7
    assert seen["checkpoint_dir"] == "/tmp/ck"
    assert seen["pretrained_path"] == "/tmp/enc.pth"
    assert seen["freeze_encoder"] is True


def test_gate_frozen_pretrained_encoder_stays_frozen(tmp_path):
    """The full transfer mechanism at tiny geometry: a locally pretrained
    encoder exported to .pth, loaded via the gate's pretrained_path with
    freeze_encoder — the trained gate model must carry the EXACT frozen
    encoder weights (bit-unchanged through training) while non-encoder
    params move. (The production-scale result is
    results/cloud_resnet_frozen_r4_T12.json.)"""
    import dataclasses

    import jax

    from unet_convlstm_tpu.models.resnet_unet import (ResNetUNetConfig,
                                                      resnet_unet_init)
    from unet_convlstm_tpu.utils.torch_weights import (
        load_torch_resnet18, save_resnet18_encoder_pth)

    donor = resnet_unet_init(jax.random.PRNGKey(11),
                             ResNetUNetConfig(lstm_layers=1,
                                              freeze_encoder=False))
    pth = str(tmp_path / "enc.pth")
    save_resnet18_encoder_pth(jax.device_get(donor), pth)

    ckdir = str(tmp_path / "ck")
    cfg = dataclasses.replace(
        CloudGateConfig(), nz=8, nxy=32, n_folders=2, n_samples=4,
        render_res=32, out_size=32, epochs=2, batch_size=2,
        model_family="resnet18", mae_threshold=50.0,
        pretrained_path=pth, freeze_encoder=True, checkpoint_dir=ckdir)
    res = run_cloud_gate(str(tmp_path / "gate"), cfg, verbose=False)
    assert res["config"]["freeze_encoder"] is True

    from unet_convlstm_tpu.train.checkpoint import restore_checkpoint

    state, meta = restore_checkpoint(ckdir + "/resnet18_best")
    assert meta["config"]["model"]["freeze_encoder"] is True
    want = load_torch_resnet18(pth, in_channels=2)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)),
        jax.device_get(state["params"]["encoder"]), want)
