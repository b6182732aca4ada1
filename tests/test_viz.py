"""Smoke tests for the visualization layer (headless Agg/cv2)."""

import os
import pickle

import numpy as np
import pytest

from unet_convlstm_tpu.eval.metrics import EvalReport
from unet_convlstm_tpu.viz import (
    save_metrics_figures, divergence_check, dataset_stats, spot_check_maps,
    volume_check,
)
from unet_convlstm_tpu.viz.rollout_video import create_rollout_video
from unet_convlstm_tpu.viz.sequences_video import create_mask_tuning_video
from unet_convlstm_tpu.viz.viewers import (
    moving_mnist_video, show_sample_panel, describe_pkl,
)


@pytest.fixture
def report(rng):
    T, B = 5, 100
    return EvalReport(
        mae=0.5, rmse=0.8, bias=0.02, err_std=0.79, n_pixels=1e6,
        mae_over_time=rng.random(T),
        hist_bins=np.linspace(-10, 10, B + 1),
        gt_hist=rng.random(B) * 1e4, pred_hist=rng.random(B) * 1e4,
        err_bins=np.linspace(-5, 5, B + 1), err_hist=rng.random(B) * 1e4,
        scatter_gt=rng.standard_normal(500),
        scatter_pred=rng.standard_normal(500))


def test_metrics_figures(report, tmp_path):
    written = save_metrics_figures(report, str(tmp_path))
    assert "summary_grid.png" in written
    for path in written.values():
        assert os.path.getsize(path) > 1000


def test_divergence_check(tmp_path, rng):
    Z, Y, X = 10, 16, 16
    u = rng.standard_normal((Z, Y, X))
    v = rng.standard_normal((Z, Y, X))
    w = rng.standard_normal((Z, Y, X))
    beta = np.zeros((Z, Y, X))
    beta[4:7, 6:10, 6:10] = 0.1
    stats = divergence_check(u, v, w, beta, 20.0, str(tmp_path), "t")
    assert stats["mean_abs_divergence"] > 0
    assert os.path.exists(tmp_path / "t_divergence_maps.png")
    assert os.path.exists(tmp_path / "t_divergence_hist.png")
    # incompressible (constant) field → zero divergence
    ones = np.ones((Z, Y, X))
    s2 = divergence_check(ones, ones, ones, beta, 20.0)
    assert s2["mean_abs_divergence"] == pytest.approx(0.0, abs=1e-12)


def test_spot_check_and_volume_check(tmp_path, rng):
    maps = {f"{c}_map": rng.standard_normal((16, 16)).astype(np.float32)
            for c in "uvw"}
    maps["w_map"][0, 0] = np.nan
    mpath = tmp_path / "m.pkl"
    with open(mpath, "wb") as f:
        pickle.dump(maps, f)
    rpath = tmp_path / "r.pkl"
    with open(rpath, "wb") as f:
        pickle.dump({"render": rng.random((16, 16)).astype(np.float32)}, f)
    stats = spot_check_maps(str(mpath), str(rpath), str(tmp_path / "out"))
    assert stats["w_map"]["nan_frac"] > 0
    assert os.path.exists(tmp_path / "out" / "render.png")

    beta = np.zeros((10, 12, 14), np.float32)
    beta[3:6, 4:8, 5:9] = 0.1
    out = volume_check(beta, str(tmp_path / "vol.png"))
    assert os.path.getsize(out) > 1000


def test_dataset_stats(tmp_path, rng):
    Y = rng.standard_normal((4, 3, 1, 8, 8)).astype(np.float32)
    Y[Y < 0] = 0
    path = str(tmp_path / "d.npz")
    np.savez(path, X=Y, Y=Y)
    stats = dataset_stats(path, "Y", str(tmp_path))
    assert stats["max"] > 0 and stats["min"] == 0.0
    assert os.path.exists(tmp_path / "Y_hist.png")


def test_rollout_video(tmp_path, rng):
    T, H = 3, 24
    x = rng.random((T, 2, H, H)).astype(np.float32)
    gt = rng.standard_normal((T, H, H)).astype(np.float32)
    pred = gt + 0.1
    mask = np.ones((T, H, H), np.float32)
    out = str(tmp_path / "roll.mp4")
    stats = create_rollout_video(x, gt, pred, mask, out, fps=2)
    assert os.path.getsize(out) > 5000
    assert len(stats["mae"]) == T
    assert all(abs(m - 0.1) < 1e-5 for m in stats["mae"])


def test_mask_tuning_video(tmp_path, rng):
    x = (rng.random((3, 2, 24, 24)) * 3).astype(np.float32)
    out = create_mask_tuning_video(x, str(tmp_path / "mask.mp4"),
                                   threshold=1.1)
    assert os.path.getsize(out) > 5000


def test_viewers(tmp_path, rng):
    data = rng.random((2, 3, 2, 16, 16)).astype(np.float32)
    np.savez(tmp_path / "mm.npz", data=data)
    out = moving_mnist_video(str(tmp_path / "mm.npz"),
                             str(tmp_path / "mm.mp4"), sample_idx=1)
    assert os.path.getsize(out) > 5000

    np.savez(tmp_path / "xy.npz", X=data, Y=data[:, :, :1])
    panel = show_sample_panel(str(tmp_path / "xy.npz"),
                              str(tmp_path / "panel.png"))
    assert os.path.getsize(panel) > 1000

    with open(tmp_path / "p.pkl", "wb") as f:
        pickle.dump({"render": data[0, 0, 0], "timestamp": 3}, f)
    desc = describe_pkl(str(tmp_path / "p.pkl"))
    assert desc["render"]["shape"] == (16, 16)
    assert "timestamp" in desc


def test_describe_nc_and_inspect_cli(tmp_path, rng, capsys):
    """read_nc.py analog: dims/variables summary with coordinate values."""
    import json
    h5py = pytest.importorskip("h5py")
    from unet_convlstm_tpu.viz.viewers import describe_nc

    nc = str(tmp_path / "bomex_0000000100.nc")
    with h5py.File(nc, "w") as f:
        f["x"] = (20.0 * np.arange(32)).astype(np.float64)
        f["z"] = (20.0 * np.arange(6)).astype(np.float64)
        f["QN"] = rng.random((1, 6, 32, 32))
    desc = describe_nc(nc)
    assert desc["QN"]["shape"] == (1, 6, 32, 32)
    assert desc["z"]["values"][:2] == [0.0, 20.0]  # read_nc.py prints z
    assert desc["x"]["max"] == 20.0 * 31

    from unet_convlstm_tpu.cli import main
    main(["inspect", nc])
    out = json.loads(capsys.readouterr().out)
    assert out["QN"]["shape"] == [1, 6, 32, 32]

    with open(tmp_path / "p.pkl", "wb") as f:
        pickle.dump({"w_map": np.zeros((8, 8), np.float32)}, f)
    main(["inspect", str(tmp_path / "p.pkl")])
    out = json.loads(capsys.readouterr().out)
    assert out["w_map"]["shape"] == [8, 8]

    # review round 3: content-sniffed dispatch (an .nc4 spelling must hit
    # the nc branch) and non-numeric 1-D variables must not crash
    nc4 = str(tmp_path / "oddly_named.nc4")
    with h5py.File(nc4, "w") as f:
        f["z"] = np.arange(4.0)
        f["station"] = np.array([b"alpha", b"beta"])
    desc = describe_nc(nc4)
    assert "min" not in desc["station"] and "values" in desc["station"]
    main(["inspect", nc4])
    out = json.loads(capsys.readouterr().out)
    assert out["z"]["shape"] == [4]

    # classic NetCDF-3 gets a clear refusal, not an h5py traceback
    cdf = tmp_path / "classic.nc"
    cdf.write_bytes(b"CDF\x01" + b"\x00" * 16)
    with pytest.raises(SystemExit, match="NetCDF-3"):
        main(["inspect", str(cdf)])


def test_legacy_viewer(tmp_path, rng):
    import pickle
    from unet_convlstm_tpu.viz.legacy_viewer import (
        PKLSequenceDataset, animate_sequence)
    folder = tmp_path / "legacy"
    folder.mkdir()
    for t in range(4):
        payload = {
            "tensors": rng.random((1, 3, 16, 16)).astype(np.float32),
            "target": rng.standard_normal((16, 16)).astype(np.float32),
            "target_slice": rng.standard_normal((9, 1, 16, 16)
                                                ).astype(np.float32),
            "envelope": rng.random((16, 16)).astype(np.float32),
        }
        with open(folder / f"sample_{t}_3_7.pkl", "wb") as f:
            pickle.dump(payload, f)
    ds = PKLSequenceDataset(str(folder), seq_len=2, overlap=1)
    assert len(ds) == 3
    out = animate_sequence(ds, 0, str(tmp_path / "legacy.mp4"))
    assert os.path.getsize(out) > 5000


def test_dashboard3d_video(tmp_path, rng):
    import pickle
    from unet_convlstm_tpu.datagen.overpass import synthesize_overpass_csv
    from unet_convlstm_tpu.viz.dashboard3d import create_dashboard_3d
    csv = synthesize_overpass_csv(str(tmp_path / "op.csv"), n_times=2,
                                  n_satellites=2)
    for k in range(2):
        di = tmp_path / "img" / f"{100 + k}"
        dm = tmp_path / "map" / f"{100 + k}"
        di.mkdir(parents=True), dm.mkdir(parents=True)
        for v in range(2):
            with open(di / f"sample_000_time_{k}_view_{v}.pkl", "wb") as f:
                pickle.dump(
                    {"render": rng.random((16, 16)).astype(np.float32)}, f)
            if v == 0:  # view 1 has no map -> zero-map fallback (:283-289)
                maps = {f"{c}_map":
                        rng.standard_normal((16, 16)).astype(np.float32)
                        for c in "uvw"}
                with open(dm /
                          f"sample_000_time_{k}_view_{v}_slice_1000m.pkl",
                          "wb") as f:
                    pickle.dump(maps, f)
    out = str(tmp_path / "dash.mp4")
    n = create_dashboard_3d(str(tmp_path / "img"), str(tmp_path / "map"),
                            csv, sample_idx=0, out_path=out, verbose=False)
    assert n == 2
    assert os.path.getsize(out) > 2000


def test_dashboard3d_frame_layout(rng):
    """The padded layout contract (reference :317-378): per-view
    [render; W map] columns, 20-px separators, geometry panel at column
    height, 40-px dark border all around."""
    from unet_convlstm_tpu.viz.dashboard3d import compose_dashboard_frame

    renders = [rng.random((16, 20)).astype(np.float32) for _ in range(2)]
    wmap = rng.standard_normal((16, 20)).astype(np.float32)
    wmap[0, 0] = np.nan
    geo = (rng.random((30, 24, 3)) * 255).astype(np.uint8)
    frame = compose_dashboard_frame(renders, [wmap, None], geo,
                                    label="Folder: 1")
    h_col = 2 * 16
    geo_w = int(24 * h_col / 30)
    assert frame.shape == (h_col + 80, 2 * (20 + 20) + geo_w + 80, 3)
    assert frame.dtype == np.uint8
    # dark border + light separator actually present
    assert (frame[:40] == 50).all() and (frame[:, :40] == 50).all()
    # second separator spans content x 60..79; probe a pixel clear of the
    # text overlays (tiny test panels put labels over the first one)
    assert (frame[40 + 28, 40 + 78] == 230).all()
