"""Batched / mesh-sharded stage-B rendering (datagen/render_shard.py)."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from unet_convlstm_tpu.datagen.renderer import VolumeScene, render_radiance
from unet_convlstm_tpu.datagen.render_shard import render_views_batch


def _beta_batch(n=3, nz=24, nxy=16, seed=0):
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(np.arange(nz), np.arange(nxy), np.arange(nxy),
                          indexing="ij")
    vols = []
    for i in range(n):
        cz, cy, cx = rng.uniform([8, 4, 4], [16, 12, 12])
        blob = np.exp(-(((z - cz) / 6.0) ** 2 + ((y - cy) / 4.0) ** 2
                        + ((x - cx) / 4.0) ** 2))
        vols.append((0.02 * blob).astype(np.float32))
    return np.stack(vols)


_SAT = 573000.0
_VIEWS = [((0.0, 0.0, _SAT), (0.0, 0.0, 240.0), (1.0, 0.0, 0.0)),
          ((-120000.0, 50000.0, _SAT), (0.0, 0.0, 240.0), (1.0, 0.0, 0.0))]
_SUN = (0.2, 0.1, -0.97)
_KW = dict(voxel_size=20.0, fov_deg=0.04, resolution=(24, 24), g=0.85)


def _single_reference(beta_b, views, sun, camera_method="auto", **kw):
    """Stacked per-patch render_radiance calls — the batched path's oracle."""
    out = []
    for b in beta_b:
        scene = VolumeScene(jnp.asarray(b), kw.get("voxel_size", 20.0))
        imgs = [np.asarray(render_radiance(
            scene, o, t, u, kw.get("fov_deg", 0.04),
            kw.get("resolution", (24, 24)), sun, g=kw.get("g", 0.85),
            ms_orders=kw.get("ms_orders", 1),
            camera_method=camera_method)) for o, t, u in views]
        out.append(np.stack(imgs))
    return np.stack(out)


def test_batch_matches_single_ortho():
    beta_b = _beta_batch(3)
    got = render_views_batch(beta_b, _VIEWS, _SUN, **_KW)
    want = _single_reference(beta_b, _VIEWS, _SUN, **_KW)
    assert got.shape == (3, 2, 24, 24)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    assert want.max() > 0  # the comparison is not vacuous


def test_batch_matches_single_march():
    """camera_method='march' forces the per-sample march in the batch too."""
    beta_b = _beta_batch(2)
    got = render_views_batch(beta_b, _VIEWS, _SUN, camera_method="march",
                             **_KW)
    want = _single_reference(beta_b, _VIEWS, _SUN, camera_method="march",
                             **_KW)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_batch_matches_single_ms_and_grazing_sun():
    """ms_orders>1 (vmapped fluence sweeps) + grazing sun (t_sun falls
    back to the per-voxel march) both reproduce the single path."""
    beta_b = _beta_batch(2)
    sun = (0.95, 0.0, -0.2)   # below the 0.45 sweep threshold
    got = render_views_batch(beta_b, _VIEWS[:1], sun, ms_orders=2, **_KW)
    want = _single_reference(beta_b, _VIEWS[:1], sun, ms_orders=2, **_KW)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_batch_sharded_over_mesh_matches_unsharded():
    """B=5 over an 8-device mesh (zero-padding path) — same images."""
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    beta_b = _beta_batch(5)
    plain = render_views_batch(beta_b, _VIEWS, _SUN, **_KW)
    sharded = render_views_batch(beta_b, _VIEWS, _SUN, mesh=mesh, **_KW)
    assert sharded.shape == (5, 2, 24, 24)
    np.testing.assert_allclose(sharded, plain, rtol=1e-5, atol=1e-7)


def test_batch_input_validation():
    with pytest.raises(ValueError, match="beta_batch"):
        render_views_batch(np.zeros((4, 4, 4), np.float32), _VIEWS, _SUN)
    with pytest.raises(ValueError, match="unknown camera_method"):
        render_views_batch(_beta_batch(1), _VIEWS, _SUN,
                           camera_method="orthographic", **_KW)
    with pytest.raises(ValueError, match="not applicable"):
        render_views_batch(_beta_batch(1), _VIEWS, _SUN,
                           camera_method="ortho", fov_deg=8.0,
                           resolution=(24, 24))
    # deterministic-only knobs must fail loudly under MC transport, not
    # be silently dropped (the MC tracer has no ocean term and no ortho
    # camera composite)
    seeds = np.zeros((1, len(_VIEWS)), np.int32)
    with pytest.raises(ValueError, match="ocean_albedo"):
        render_views_batch(_beta_batch(1), _VIEWS, _SUN, mc_spp=2,
                           mc_seeds=seeds, ocean_albedo=3e-4, **_KW)
    with pytest.raises(ValueError, match="camera_method"):
        render_views_batch(_beta_batch(1), _VIEWS, _SUN, mc_spp=2,
                           mc_seeds=seeds, camera_method="march", **_KW)


def _write_patch_tree(root, n_folders=2, n_samples=3):
    rng = np.random.default_rng(1)
    for fi in range(n_folders):
        d = os.path.join(root, f"{fi + 1:010d}")
        os.makedirs(d)
        for si in range(n_samples):
            nz, nxy = 20, 12
            z, y, x = np.meshgrid(np.arange(nz), np.arange(nxy),
                                  np.arange(nxy), indexing="ij")
            blob = np.exp(-(((z - rng.uniform(6, 12)) / 5.0) ** 2
                            + ((y - 6) / 3.0) ** 2 + ((x - 6) / 3.0) ** 2))
            beta = (0.05 * blob).astype(np.float32)
            with open(os.path.join(d, f"sample_{si:03d}.pkl"), "wb") as f:
                pickle.dump({"beta_ext": beta, "U": beta, "V": beta,
                             "W": beta}, f)


_CSV = (
    "utc time,sun zenith [deg],sun azimuth [deg],sat zenith [deg],"
    "sat azimuth [deg],scattering angle [deg],"
    "sat ENU coordinates [km],lookat ENU coordinates [km]\n"
    '0,145.0,32.6,53.8,168.3,131.5,"[-747.0, 154.9, 558.6]","[0, 0, 0]"\n'
    '0,145.0,32.6,46.8,168.3,164.3,"[-598.1, 124.0, 573.4]","[0, 0, 0]"\n'
    '100,150.0,40.0,50.0,170.0,140.0,"[-700.0, 140.0, 560.0]","[0, 0, 0]"\n'
    '100,150.0,40.0,45.0,170.0,160.0,"[-600.0, 120.0, 570.0]","[0, 0, 0]"\n')


def test_driver_batched_matches_serial(tmp_path):
    """render_dataset(batch_size=2, mesh=...) writes the same files with
    the same images as the serial driver — including the odd-remainder
    chunk and the second folder's different timestamp/cameras."""
    from unet_convlstm_tpu.datagen.render_batch import render_dataset

    in_root = tmp_path / "patches"
    in_root.mkdir()
    _write_patch_tree(str(in_root))
    csv_path = tmp_path / "overpass.csv"
    csv_path.write_text(_CSV)

    kw = dict(resolution=(16, 16), fov_deg=0.01, verbose=False)
    n1 = render_dataset(str(in_root), str(tmp_path / "serial"),
                        str(csv_path), **kw)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    n2 = render_dataset(str(in_root), str(tmp_path / "batched"),
                        str(csv_path), batch_size=2, mesh=mesh, **kw)
    assert n1 == n2 == 2 * 3 * 2  # folders × samples × views

    for folder in sorted(os.listdir(tmp_path / "serial")):
        sdir = tmp_path / "serial" / folder
        bdir = tmp_path / "batched" / folder
        assert sorted(os.listdir(sdir)) == sorted(os.listdir(bdir))
        for name in sorted(os.listdir(sdir)):
            with open(sdir / name, "rb") as f:
                a = pickle.load(f)
            with open(bdir / name, "rb") as f:
                b = pickle.load(f)
            assert a["timestamp"] == b["timestamp"]
            assert a["satellite_idx"] == b["satellite_idx"]
            np.testing.assert_allclose(b["render"], a["render"],
                                       rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("mode", ["slice", "first_hit"])
def test_velocity_maps_batched_matches_serial(tmp_path, mode):
    """Stage C: build_velocity_maps(batch_size=2, mesh) ≡ the serial
    driver for both ray-cast modes (NaN pattern included)."""
    from unet_convlstm_tpu.datagen.velocity_maps import build_velocity_maps

    in_root = tmp_path / "patches"
    in_root.mkdir()
    _write_patch_tree(str(in_root), n_folders=2, n_samples=3)
    csv_path = tmp_path / "overpass.csv"
    csv_path.write_text(_CSV)

    kw = dict(mode=mode, resolution=(16, 16), fov=0.001, verbose=False)
    n1 = build_velocity_maps(str(in_root), str(tmp_path / "serial"),
                             str(csv_path), **kw)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    n2 = build_velocity_maps(str(in_root), str(tmp_path / "batched"),
                             str(csv_path), batch_size=2, mesh=mesh, **kw)
    assert n1 == n2 == 2 * 3 * 2

    compared = 0
    for folder in sorted(os.listdir(tmp_path / "serial")):
        sdir = tmp_path / "serial" / folder
        bdir = tmp_path / "batched" / folder
        assert sorted(os.listdir(sdir)) == sorted(os.listdir(bdir))
        for name in sorted(os.listdir(sdir)):
            with open(sdir / name, "rb") as f:
                a = pickle.load(f)
            with open(bdir / name, "rb") as f:
                b = pickle.load(f)
            for k in ("u_map", "v_map", "w_map"):
                np.testing.assert_array_equal(b[k], a[k])  # incl. NaNs
                compared += 1
    assert compared == 2 * 3 * 2 * 3


def test_driver_batched_isolates_corrupt_sample(tmp_path):
    """A corrupt pkl inside a chunk drops that sample only; a chunk whose
    loadable patches disagree on shape renders each shape as its own
    sub-chunk — every loadable patch renders, matching the serial path's
    per-sample isolation exactly."""
    from unet_convlstm_tpu.datagen.render_batch import render_dataset

    in_root = tmp_path / "patches"
    in_root.mkdir()
    _write_patch_tree(str(in_root), n_folders=1, n_samples=5)
    (in_root / "0000000001" / "sample_001.pkl").write_bytes(b"garbage")
    odd = np.zeros((20, 12, 13), np.float32)  # mismatched x-extent
    with open(in_root / "0000000001" / "sample_004.pkl", "wb") as f:
        pickle.dump({"beta_ext": odd, "U": odd, "V": odd, "W": odd}, f)
    csv_path = tmp_path / "overpass.csv"
    csv_path.write_text(_CSV)

    n = render_dataset(str(in_root), str(tmp_path / "out"), str(csv_path),
                       resolution=(16, 16), fov_deg=0.01, batch_size=3,
                       verbose=False)
    # chunk 1 = samples 0,2 (1 corrupt dropped); chunk 2 = samples 3,4
    # (mixed shapes -> two same-shape sub-chunks, both render)
    assert n == 4 * 2
    files = sorted(os.listdir(tmp_path / "out" / "0000000001"))
    assert not any("sample_001" in f for f in files)
    assert any("sample_003" in f for f in files)
    assert any("sample_004" in f for f in files)


def test_velocity_maps_batched_rejects_bad_mode_before_io(tmp_path):
    """Unknown mode fails on entry, before any chunk is loaded."""
    from unet_convlstm_tpu.datagen.velocity_maps import build_velocity_maps

    csv_path = tmp_path / "overpass.csv"
    csv_path.write_text(_CSV)
    with pytest.raises(ValueError, match="unknown mode"):
        build_velocity_maps(str(tmp_path), str(tmp_path / "o"),
                            str(csv_path), mode="slize", batch_size=2,
                            verbose=False)
