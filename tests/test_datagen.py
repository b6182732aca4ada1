"""Datagen pipeline tests.

Where feasible the oracle is the REFERENCE code itself, executed as a black
box from /root/reference (never copied): microphysics and the ray caster are
pure numpy there, so outputs can be compared element-wise.
"""

import importlib.util
import os
import pickle
import struct
import sys

import numpy as np
import pytest

from unet_convlstm_tpu.datagen.microphysics import process_cloud_vars
from unet_convlstm_tpu.datagen.raycast import (
    VolumeGrid, first_hit_maps, z_slice_maps, make_rays,
)
from unet_convlstm_tpu.datagen.vol_format import write_vol, read_vol, vol_to_zyx
from unet_convlstm_tpu.datagen.overpass import (
    read_overpass_csv, camera_schedule, sun_direction,
)
from unet_convlstm_tpu.datagen.sequences import (
    build_trajectory_sequences, build_legacy_sequences,
)
from unet_convlstm_tpu.datagen.lespatch import generate_patches_from_nc

REF = "/root/reference"


def _load_ref_module(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def volume(tmp_path_factory):
    """Synthetic cloud: a beta-positive box floating in a 40³ grid."""
    rng = np.random.default_rng(0)
    nz, ny, nx = 40, 40, 40
    beta = np.zeros((nz, ny, nx), np.float32)
    beta[18:30, 12:28, 10:26] = rng.random((12, 16, 16), np.float32) + 0.1
    u = rng.standard_normal((nz, ny, nx)).astype(np.float32)
    v = rng.standard_normal((nz, ny, nx)).astype(np.float32)
    w = rng.standard_normal((nz, ny, nx)).astype(np.float32)
    d = {"beta_ext": beta, "U": u, "V": v, "W": w}
    path = tmp_path_factory.mktemp("vol") / "sample_000.pkl"
    with open(path, "wb") as f:
        pickle.dump(d, f)
    return d, str(path)


def test_microphysics_matches_reference():
    ref = _load_ref_module("mitsuba3/calc_beta.py", "ref_calc_beta")
    rng = np.random.default_rng(1)
    Z, X, Y = 6, 5, 4
    QN = rng.random((Z, X, Y)) * 2.0
    NC = rng.random((Z, X, Y)) * 100.0
    T = 270.0 + rng.random((Z, X, Y)) * 30.0
    p = 500.0 + rng.random(Z) * 500.0
    lwc_r, reff_r, beta_r = ref.process_cloud_vars(QN, NC, T, p)
    lwc, reff, beta = process_cloud_vars(QN, NC, T, p)
    np.testing.assert_allclose(lwc, lwc_r, rtol=1e-12)
    np.testing.assert_allclose(reff, reff_r, rtol=1e-12)
    np.testing.assert_allclose(beta, beta_r, rtol=1e-12)


@pytest.fixture(scope="module")
def ref_caster(volume):
    _, path = volume
    mod = _load_ref_module("preprocessing/build_W_map.py", "ref_build_w_map")
    return mod.CloudRayCaster(path, voxel_size=20.0)


def _grid(volume):
    d, _ = volume
    return VolumeGrid.from_patch_dict(d, voxel_size=20.0)


def test_rays_match_reference(volume, ref_caster):
    cam = np.array([0.0, 0.0, 600_000.0])
    look = np.array([0.0, 0.0, 1500.0])
    ro_r, rd_r = ref_caster.get_rays(cam, look, (16, 16), fov=0.25)
    ro, rd = make_rays(cam, look, (16, 16), fov=0.25)
    np.testing.assert_allclose(np.asarray(ro), ro_r, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rd), rd_r, rtol=1e-5, atol=1e-6)


def test_first_hit_matches_reference(volume, ref_caster):
    grid = _grid(volume)
    cam = np.array([150.0, -200.0, 5000.0])
    look = np.array([0.0, 0.0, 400.0])
    u_r, v_r, w_r = ref_caster.render_velocity_maps_first_hit(
        cam, look, resolution=(32, 32), step_size=20.0)
    u, v, w = first_hit_maps(grid, cam, look, (32, 32), step_size=20.0,
                             fov=0.25)
    for ours, refm in ((u, u_r), (v, v_r), (w, w_r)):
        ours = np.asarray(ours)
        # identical hit/miss pattern and identical sampled values
        assert np.array_equal(np.isnan(ours), np.isnan(refm))
        np.testing.assert_allclose(ours[~np.isnan(ours)],
                                   refm[~np.isnan(refm)], rtol=1e-6)
    assert np.isnan(np.asarray(u)).mean() < 1.0  # some rays hit


def test_z_slice_matches_reference(volume, ref_caster):
    grid = _grid(volume)
    cam = np.array([0.0, 0.0, 600_000.0])
    look = np.array([0.0, 0.0, 1500.0])
    target_z = 450.0
    u_r, v_r, w_r = ref_caster.render_z_slice(cam, look, target_z,
                                              resolution=(32, 32),
                                              reference_plane_z=750.0)
    u, v, w = z_slice_maps(grid, cam, look, target_z, (32, 32),
                           reference_plane_z=750.0, fov=0.25)
    for ours, refm in ((u, u_r), (v, v_r), (w, w_r)):
        ours = np.asarray(ours)
        assert np.array_equal(np.isnan(ours), np.isnan(refm))
        np.testing.assert_allclose(ours[~np.isnan(ours)],
                                   refm[~np.isnan(refm)], rtol=1e-6)


def test_vol_format_roundtrip_and_layout(tmp_path, volume):
    d, _ = volume
    beta = d["beta_ext"][:8, :6, :5]  # distinct dims to catch axis swaps
    path = str(tmp_path / "t.vol")
    write_vol(path, beta)
    with open(path, "rb") as f:
        raw = f.read()
    assert raw[:4] == b"VOL\x03"
    enc, nx, ny, nz, ch = struct.unpack("<5i", raw[4:24])
    assert (enc, ch) == (1, 1)
    # header dims are (Z, X, Y) of the [Z,Y,X] input — reference layout
    assert (nx, ny, nz) == (8, 5, 6)
    bbox = struct.unpack("<6f", raw[24:48])
    assert bbox == (0.0, 0.0, 0.0, 8.0, 5.0, 6.0)
    grid, meta = read_vol(path)
    np.testing.assert_array_equal(vol_to_zyx(grid), beta)


def test_overpass_csv_contract(tmp_path):
    csv_text = (
        "utc time,sun zenith [deg],sun azimuth [deg],sat zenith [deg],"
        "sat azimuth [deg],scattering angle [deg],"
        "sat ENU coordinates [km],lookat ENU coordinates [km]\n"
        '0,145.0,32.6,53.8,168.3,131.5,"[-747.0, 154.9, 558.6]","[0, 0, 0]"\n'
        '0,145.0,32.6,46.8,168.3,164.3,"[-598.1, 124.0, 573.4]","[0, 0, 0]"\n'
        '20,144.9,32.7,46.8,168.3,168.1,"[-598.0, 123.9, 573.4]","[0, 0, 0]"\n'
    )
    path = tmp_path / "overpass.csv"
    path.write_text(csv_text)
    views = read_overpass_csv(str(path))
    assert len(views) == 3
    times, schedule = camera_schedule(views)
    assert times == [0.0, 20.0]
    assert len(schedule[0.0]) == 2
    pos, look = views[0].caster_camera_m()
    np.testing.assert_allclose(pos, [-154.9e3, -747.0e3, 558.6e3])
    np.testing.assert_allclose(look, [0, 0, 1500])
    origin, target, up = views[0].renderer_camera_km(target_z_km=2.5)
    np.testing.assert_allclose(origin, [154.9, -747.0, 558.6])
    np.testing.assert_allclose(up, [1, 0, 0])
    d = sun_direction(145.0, 32.6)
    assert d[2] < 0  # zenith > 90° → downward travel
    np.testing.assert_allclose(np.linalg.norm(d), 1.0)


def _write_render_tree(root_img, root_map, n_folders=2, n_samples=2,
                       res=8, t0=2000):
    for k in range(n_folders):
        fi = os.path.join(root_img, f"{t0 + 20 * k}")
        fm = os.path.join(root_map, f"{t0 + 20 * k}")
        os.makedirs(fi), os.makedirs(fm)
        for s in range(n_samples):
            for view in (0, 1):
                r = np.full((res, res), float(s + view), np.float32)
                r[0, 0] = np.nan
                with open(os.path.join(
                        fi, f"sample_{s:03d}_time_{k}_view_{view}.pkl"),
                        "wb") as f:
                    pickle.dump({"render": r, "timestamp": k,
                                 "satellite_idx": view}, f)
            maps = {f"{c}_map": np.full((res, res), float(s + 7 * i),
                                        np.float32)
                    for i, c in enumerate("uvw")}
            maps["w_map"][0, 1] = np.nan
            with open(os.path.join(
                    fm, f"sample_{s:03d}_time_{k}_view_0_slice_1000m.pkl"),
                    "wb") as f:
                pickle.dump(maps, f)


def test_build_trajectory_sequences(tmp_path):
    root_img = str(tmp_path / "img")
    root_map = str(tmp_path / "map")
    _write_render_tree(root_img, root_map)
    out = build_trajectory_sequences(
        root_img, root_map, str(tmp_path / "ds.npz"), seq_len=2,
        num_samples=2, map_type="w", map_suffix="slice_1000m",
        out_size=(4, 4), verbose=False)
    assert out and out.endswith("_w.npz")
    data = np.load(out)
    assert data["X"].shape == (2, 2, 2, 4, 4)
    assert data["Y"].shape == (2, 2, 1, 4, 4)
    # NaN handling + box mean: the NaN corner became 0 before averaging
    s0 = data["X"][0, 0, 0]
    assert s0[0, 0] == pytest.approx(0.0 * 3 / 4)  # sample 0 view 0: value 0
    s1 = data["X"][1, 0, 0]   # sample 1 view 0: value 1 with one NaN→0
    assert s1[0, 0] == pytest.approx(3 / 4)
    assert np.all(np.isfinite(data["Y"]))


def test_build_trajectory_sequences_wvu_multichannel(tmp_path):
    """map_type='wvu' stacks one target channel per letter, in order —
    the 3-channel configuration (BASELINE.json configs[3])."""
    root_img = str(tmp_path / "img")
    root_map = str(tmp_path / "map")
    _write_render_tree(root_img, root_map)
    out = build_trajectory_sequences(
        root_img, root_map, str(tmp_path / "ds.npz"), seq_len=2,
        num_samples=2, map_type="wvu", map_suffix="slice_1000m",
        out_size=(4, 4), verbose=False)
    assert out and out.endswith("_wvu.npz")
    data = np.load(out)
    assert data["Y"].shape == (2, 2, 3, 4, 4)
    # channel order follows the map_type string: w, v, u
    # (helper writes u=s, v=s+7, w=s+14; pixel [1,1] is NaN-free)
    for s in (0, 1):
        assert data["Y"][s, 0, 0, 1, 1] == pytest.approx(s + 14)  # w
        assert data["Y"][s, 0, 1, 1, 1] == pytest.approx(s + 7)   # v
        assert data["Y"][s, 0, 2, 1, 1] == pytest.approx(s)       # u
    assert np.all(np.isfinite(data["Y"]))


def test_build_legacy_sequences(tmp_path):
    folder = tmp_path / "legacy"
    folder.mkdir()
    for t in range(4):
        payload = {
            "tensors": np.full((1, 3, 8, 8), float(t), np.float32),
            "target": np.zeros((8, 8), np.float32),
            "target_slice": np.arange(9 * 1 * 8 * 8, dtype=np.float32
                                      ).reshape(9, 1, 8, 8),
            "envelope": np.zeros((8, 8), np.float32),
        }
        with open(folder / f"sample_{t}_3_7.pkl", "wb") as f:
            pickle.dump(payload, f)
    out = build_legacy_sequences(str(folder), str(tmp_path / "legacy.npz"),
                                 seq_len=2, overlap=1, verbose=False)
    data = np.load(out)
    assert data["X"].shape == (3, 2, 2, 8, 8)   # stride 1 → 3 windows
    assert data["Y"].shape == (3, 2, 1, 8, 8)
    assert data["X"][0, 0, 0, 0, 0] == 0.0 and data["X"][0, 1, 0, 0, 0] == 1.0


def test_lespatch_h5py_ingest(tmp_path):
    h5py = pytest.importorskip("h5py")
    Z, YX = 6, 12
    rng = np.random.default_rng(0)
    nc_path = str(tmp_path / "bomex_0000001200.nc")
    with h5py.File(nc_path, "w") as f:
        f["x"] = np.arange(YX, dtype=np.float32)
        f["y"] = np.arange(YX, dtype=np.float32)
        f["p"] = (1000 - 50 * np.arange(Z)).astype(np.float64)
        for name, scale in (("QN", 1.0), ("NC", 100.0), ("TABS", 280.0),
                            ("U", 3.0), ("V", 3.0), ("W", 1.0)):
            f[name] = (rng.random((1, Z, YX, YX)) * scale).astype(np.float64)
    out_dir = str(tmp_path / "patches")
    n = generate_patches_from_nc(nc_path, out_dir, patch_size=8, stride=4,
                                 verbose=False)
    assert n == 4  # (12-8)/4+1 = 2 per axis
    with open(os.path.join(out_dir, "sample_000.pkl"), "rb") as f:
        patch = pickle.load(f)
    assert patch["beta_ext"].shape == (Z, 8, 8)
    assert patch["U"].dtype == np.float32
    assert patch["metadata"]["grid_idx"] == (0, 0)
    # beta consistent with the microphysics on the same slice
    with h5py.File(nc_path, "r") as f:
        qn = f["QN"][0, :, 0:8, 0:8]
        ncd = f["NC"][0, :, 0:8, 0:8]
        tabs = f["TABS"][0, :, 0:8, 0:8]
        p = f["p"][:]
    _, _, beta = process_cloud_vars(qn, ncd, tabs, p)
    np.testing.assert_allclose(patch["beta_ext"], beta.astype(np.float32),
                               rtol=1e-6)


def test_synthesize_overpass_csv(tmp_path):
    from unet_convlstm_tpu.datagen.overpass import synthesize_overpass_csv
    path = synthesize_overpass_csv(str(tmp_path / "synth.csv"),
                                   n_times=4, n_satellites=3)
    views = read_overpass_csv(path)
    assert len(views) == 12
    times, schedule = camera_schedule(views)
    assert len(times) == 4 and all(len(schedule[t]) == 3 for t in times)
    v = views[0]
    assert 0 < v.sat_zenith < 90
    assert v.sat_enu_km[2] > 500  # LEO altitude
    assert 0 < v.scattering_angle < 180
