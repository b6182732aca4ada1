"""Contract tests against the reference's REAL satellite-geometry CSVs.

The synthesized-CSV tests (test_datagen.py::test_overpass_csv_contract)
validate the parser against files we wrote ourselves — a column-order or
unit-convention slip there is self-consistent and invisible. These tests
read the actual measured assets the reference ships
(/root/reference/data/Dor_2satellites_overpass.csv,
/root/reference/data/Udi_3satellites_overpass.csv) and assert their known
geometry, then drive one gen-renders + gen-maps pass with the real
2-satellite constellation.
"""

import os
import pickle

import numpy as np
import pytest

from unet_convlstm_tpu.datagen.overpass import (
    camera_schedule, read_overpass_csv)

DOR = "/root/reference/data/Dor_2satellites_overpass.csv"
UDI = "/root/reference/data/Udi_3satellites_overpass.csv"

needs_assets = pytest.mark.skipif(
    not (os.path.exists(DOR) and os.path.exists(UDI)),
    reason="reference CSV assets not present")


@needs_assets
@pytest.mark.parametrize("path,n_sats", [(DOR, 2), (UDI, 3)])
def test_real_csv_geometry(path, n_sats):
    views = read_overpass_csv(path)
    assert len(views) == 12 * n_sats

    times, schedule = camera_schedule(views)
    # 12 UTC times, a 20 s cadence starting at 0, n_sats views per time
    assert times == [20.0 * i for i in range(12)]
    assert all(len(schedule[t]) == n_sats for t in times)

    for v in views:
        # LEO constellation: altitudes in the 500-600 km band,
        # all look-at targets at the ENU origin
        assert 500.0 < v.sat_enu_km[2] < 600.0
        np.testing.assert_array_equal(v.lookat_enu_km, [0.0, 0.0, 0.0])
        # the Sun sits below the +z horizon convention (zenith > 90° —
        # the renderer's spherical→cartesian formula relies on this,
        # reference render.py:204-211)
        assert 144.0 < v.sun_zenith < 146.0
        assert 0.0 <= v.scattering_angle <= 180.0
        # CSV's own zenith column must agree with the ENU coordinates
        ground = float(np.hypot(v.sat_enu_km[0], v.sat_enu_km[1]))
        zenith_from_enu = np.degrees(np.arctan2(ground, v.sat_enu_km[2]))
        assert abs(zenith_from_enu - v.sat_zenith) < 0.5

    # ENU→world conventions: the caster negates+swaps into meters, the
    # renderer swaps x/y in km (reference build_WVU_maps.py:29-41 /
    # render.py:108-117)
    v0 = schedule[0.0][0]
    pos_m, look_m = v0.caster_camera_m()
    np.testing.assert_allclose(
        pos_m, [-v0.sat_enu_km[1] * 1000.0, v0.sat_enu_km[0] * 1000.0,
                v0.sat_enu_km[2] * 1000.0])
    np.testing.assert_array_equal(look_m, [0.0, 0.0, 1500.0])
    origin, target, up = v0.renderer_camera_km(target_z_km=0.5)
    np.testing.assert_allclose(
        origin, [v0.sat_enu_km[1], v0.sat_enu_km[0], v0.sat_enu_km[2]])
    np.testing.assert_array_equal(up, [1.0, 0.0, 0.0])


@needs_assets
def test_dor_first_row_values_exact():
    """Spot-check actual numbers from the asset so a silent column swap
    (e.g. sun azimuth read as sat zenith) cannot pass."""
    v = read_overpass_csv(DOR)[0]
    assert v.utc_time == 0.0
    np.testing.assert_allclose(v.sun_zenith, 145.0096961)
    np.testing.assert_allclose(v.sun_azimuth, 32.66040686)
    np.testing.assert_allclose(v.sat_zenith, 53.79073986)
    np.testing.assert_allclose(v.sat_azimuth, 168.2845989)
    np.testing.assert_allclose(v.scattering_angle, 131.4565291)
    np.testing.assert_allclose(
        v.sat_enu_km,
        [-747.0192973519828, 154.90968187426196, 558.5566065715161])


@needs_assets
def test_stage_bc_run_with_real_dor_geometry(tmp_path):
    """One gen-renders + gen-maps pass driven by the real 2-satellite
    constellation (tiny synthetic volumes; the geometry — camera origins,
    sun directions, cyclic time assignment — is the real asset's)."""
    from unet_convlstm_tpu.datagen.render_batch import render_dataset
    from unet_convlstm_tpu.datagen.velocity_maps import build_velocity_maps

    patches = tmp_path / "patches"
    rng = np.random.default_rng(0)
    for k in range(2):                       # 2 folders → 2 cyclic times
        d = patches / f"{1200 + 20 * k:010d}"
        d.mkdir(parents=True)
        beta = np.zeros((12, 32, 32), np.float32)
        beta[4:9, 8:24, 8:24] = rng.random((5, 16, 16)) * 0.05
        payload = {
            "beta_ext": beta,
            "U": rng.standard_normal((12, 32, 32)).astype(np.float32),
            "V": rng.standard_normal((12, 32, 32)).astype(np.float32),
            "W": rng.standard_normal((12, 32, 32)).astype(np.float32),
        }
        with open(d / "sample_000.pkl", "wb") as f:
            pickle.dump(payload, f)

    n = render_dataset(str(patches), str(tmp_path / "renders"), DOR,
                       resolution=(16, 16), fov_deg=0.06, verbose=False)
    assert n == 2 * 2                        # 2 folders × 2 satellites
    folder = sorted(os.listdir(tmp_path / "renders"))[0]
    pkls = sorted(os.listdir(tmp_path / "renders" / folder))
    with open(tmp_path / "renders" / folder / pkls[0], "rb") as f:
        out = pickle.load(f)
    assert out["render"].shape == (16, 16)
    assert np.isfinite(out["render"]).all()
    assert float(np.max(out["render"])) > 0.0   # the sun lights the scene

    n = build_velocity_maps(str(patches), str(tmp_path / "maps"), DOR,
                            mode="slice", resolution=(16, 16),
                            slice_height_m=100.0, reference_plane_z=80.0,
                            fov=0.06, verbose=False)
    assert n == 2 * 2
    folder = sorted(os.listdir(tmp_path / "maps"))[0]
    f0 = sorted(os.listdir(tmp_path / "maps" / folder))[0]
    with open(tmp_path / "maps" / folder / f0, "rb") as fh:
        maps = pickle.load(fh)
    assert set(maps) == {"u_map", "v_map", "w_map"}
    assert np.isfinite(maps["w_map"]).any()
