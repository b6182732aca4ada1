"""Monte-Carlo radiance oracle (datagen/mc_reference.py).

The MC path tracer is the unbiased anchor the deterministic renderer is
validated against (reference analog: Mitsuba volpath spp 8192,
render_all.py:28-30). The key test: the deterministic march converges TO
the MC estimate as its quadrature step shrinks — so the two agree up to
(a) march quadrature bias, first order in step, and (b) MC noise, 1/√spp.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unet_convlstm_tpu.datagen.renderer import (VolumeScene,
                                                render_radiance,
                                                sun_transmittance)
from unet_convlstm_tpu.datagen.mc_reference import mc_radiance


def _blob_scene():
    z, y, x = np.meshgrid(np.arange(24), np.arange(16), np.arange(16),
                          indexing="ij")
    blob = np.exp(-(((z - 12) / 6.0) ** 2 + ((y - 8) / 4.0) ** 2
                    + ((x - 7) / 4.0) ** 2))
    return VolumeScene(jnp.asarray((0.02 * blob).astype(np.float32)), 20.0)


_KW = dict(origin=(0, 0, 20000.0), target=(0, 0, 240.0), fov_deg=1.2,
           resolution=(24, 24), sun_dir=(0.2, 0.1, -0.97))


def test_mc_empty_volume_is_black():
    scene = VolumeScene(jnp.zeros((8, 8, 8), jnp.float32), 20.0)
    img = np.asarray(mc_radiance(scene, (0, 0, 5000.0), (0, 0, 0),
                                 resolution=(8, 8), fov_deg=4.0, spp=8))
    np.testing.assert_array_equal(img, 0.0)


def test_mc_albedo_zero_is_black():
    img = np.asarray(mc_radiance(_blob_scene(), **_KW, albedo=0.0,
                                 spp=16, max_depth=4))
    np.testing.assert_array_equal(img, 0.0)


def test_mc_deterministic_per_seed():
    scene = _blob_scene()
    a = np.asarray(mc_radiance(scene, **_KW, spp=8, seed=3))
    b = np.asarray(mc_radiance(scene, **_KW, spp=8, seed=3))
    c = np.asarray(mc_radiance(scene, **_KW, spp=8, seed=4))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_mc_rbg_rng_impl_same_estimator():
    """rng_impl='rbg' (RngBitGenerator HLO — HW-backed on TPU) is a
    different unbiased realization of the SAME estimator: deterministic
    per seed, chunk-invariant, and its mean agrees with threefry within
    MC noise."""
    scene = _blob_scene()
    a = np.asarray(mc_radiance(scene, **_KW, spp=64, seed=3,
                               rng_impl="rbg"))
    b = np.asarray(mc_radiance(scene, **_KW, spp=64, seed=3,
                               rng_impl="rbg"))
    np.testing.assert_array_equal(a, b)
    chunked = np.asarray(mc_radiance(scene, **_KW, spp=64, seed=3,
                                     rng_impl="rbg", spp_chunk=16))
    np.testing.assert_allclose(chunked, a, rtol=1e-6, atol=1e-9)
    tf = np.asarray(mc_radiance(scene, **_KW, spp=64, seed=3))
    assert np.abs(a - tf).max() > 0           # genuinely different stream
    # same estimator: scattering events are sparse, so per-seed image-mean
    # scatter is ~5-6% relative at spp 256 (measured across 4 seeds); a
    # 3σ-of-the-difference bound catches a broken scale without flaking
    a256 = np.asarray(mc_radiance(scene, **_KW, spp=256, seed=3,
                                  rng_impl="rbg"))
    tf256 = np.asarray(mc_radiance(scene, **_KW, spp=256, seed=3))
    rel = abs(a256.mean() - tf256.mean()) / max(tf256.mean(), 1e-12)
    assert rel < 0.25, rel


def test_mc_single_scatter_is_march_quadrature_limit():
    """max_depth=1 estimates the deterministic single-scatter integral:
    refining the march's step moves it TOWARD the MC mean (the residual
    at step=voxel is the march's rectangle-rule bias, ~4%), and at
    step=voxel/10 the two agree within MC noise."""
    scene = _blob_scene()
    sun = np.asarray(_KW["sun_dir"], np.float32)
    sun = sun / np.linalg.norm(sun)
    t_sun = sun_transmittance(scene, sun)   # shared: isolate camera side

    m20 = np.asarray(render_radiance(scene, **_KW, camera_method="march",
                                     step=20.0, t_sun=t_sun))
    m2 = np.asarray(render_radiance(scene, **_KW, camera_method="march",
                                    step=2.0, t_sun=t_sun))
    mc = np.asarray(mc_radiance(scene, **_KW, spp=512, max_depth=1,
                                seed=0, t_sun=t_sun))
    gap20 = abs(mc.mean() - m20.mean())
    gap2 = abs(mc.mean() - m2.mean())
    assert gap2 < gap20                      # refinement converges to MC
    assert gap2 / m2.mean() < 0.02           # within noise at fine step
    assert np.corrcoef(mc.ravel(), m2.ravel())[0, 1] > 0.99


def test_mc_majorant_grid_is_unbiased():
    """The super-voxel majorant grid (capped delta tracking under local
    max-pooled majorants) samples the SAME distribution as plain
    global-majorant tracking — two independent unbiased estimates of one
    integral must agree within MC noise, including with multi-bounce
    transport crossing macro-cell boundaries."""
    scene = _blob_scene()
    kw = dict(**_KW, spp=256, max_depth=8)
    # single-seed means carry ~4.6% noise at spp 256; average 4 seeds per
    # estimator (measured seed sd 0.010 on mean 0.22 → avg SE ~0.5%)
    grid = np.mean([np.asarray(mc_radiance(scene, **kw, seed=s,
                                           majorant_cell=4))
                    for s in range(4)], axis=0)
    flat = np.mean([np.asarray(mc_radiance(scene, **kw, seed=s,
                                           majorant_cell=0))
                    for s in range(4)], axis=0)
    assert abs(grid.mean() - flat.mean()) / flat.mean() < 0.06
    # structural agreement on 4×4 block means (per-pixel MC noise at this
    # spp still swamps a raw pixelwise correlation)
    block = lambda im: im.reshape(6, 4, 6, 4).mean(axis=(1, 3))
    assert np.corrcoef(block(grid).ravel(),
                       block(flat).ravel())[0, 1] > 0.98


def test_mc_depth_adds_nonnegative_energy_pixelwise():
    """Same seed ⇒ identical trajectories ⇒ a deeper run's image is the
    shallower run's image plus non-negative extra bounces, per pixel."""
    scene = _blob_scene()
    d1 = np.asarray(mc_radiance(scene, **_KW, spp=32, max_depth=1, seed=0))
    d4 = np.asarray(mc_radiance(scene, **_KW, spp=32, max_depth=4, seed=0))
    d16 = np.asarray(mc_radiance(scene, **_KW, spp=32, max_depth=16,
                                 seed=0))
    assert np.all(d4 >= d1 - 1e-7)
    assert np.all(d16 >= d4 - 1e-7)
    assert d4.mean() > d1.mean()             # order ≥ 2 light is real
    # shrinking tail: depth 4→16 adds less than 1→4
    assert (d16.mean() - d4.mean()) < (d4.mean() - d1.mean())


def test_mc_quantifies_sos_angular_bias_at_backscatter():
    """The deterministic ms_orders path approximates orders ≥ 2 with an
    ISOTROPIC phase. At backscatter geometry (sun behind the camera) the
    true HG chain keeps most multiply-scattered light flowing forward
    (away from the camera), so SOS must OVERESTIMATE the diffuse term
    there — the MC oracle pins the direction and rough size of that bias
    (docs/RENDERER.md table)."""
    scene = _blob_scene()
    mc_full = np.asarray(mc_radiance(scene, **_KW, spp=128, max_depth=64,
                                     seed=0))
    sos4 = np.asarray(render_radiance(scene, **_KW, camera_method="march",
                                      ms_orders=4))
    assert sos4.mean() > 2.0 * mc_full.mean()


def _patch_fixture(tmp_path):
    """One blob patch in one numeric folder + a 2-satellite overpass CSV."""
    import pickle

    in_root = tmp_path / "patches"
    (in_root / "0000000001").mkdir(parents=True)
    beta = np.zeros((10, 16, 16), np.float32)
    beta[4:8, 4:12, 4:12] = 0.05
    with open(in_root / "0000000001" / "sample_000.pkl", "wb") as f:
        pickle.dump({"beta_ext": beta}, f)
    csv_text = (
        "utc time,sun zenith [deg],sun azimuth [deg],sat zenith [deg],"
        "sat azimuth [deg],scattering angle [deg],"
        "sat ENU coordinates [km],lookat ENU coordinates [km]\n"
        '0,145.0,32.6,53.8,168.3,131.5,"[-747.0, 154.9, 558.6]","[0, 0, 0]"\n'
        '0,145.0,32.6,46.8,168.3,164.3,"[-598.1, 124.0, 573.4]","[0, 0, 0]"\n')
    csv_path = tmp_path / "overpass.csv"
    csv_path.write_text(csv_text)
    return in_root, csv_path


def test_mc_render_dataset_driver(tmp_path):
    """gen-renders --mc-spp: the stage-B driver's Monte-Carlo production
    path (reference production is volpath spp 8192, render_all.py:28-30)
    writes the same pkl contract as the deterministic path, with
    deterministic per-(folder, patch, view) seeding."""
    import os
    import pickle

    from unet_convlstm_tpu.datagen.render_batch import render_dataset

    in_root, csv_path = _patch_fixture(tmp_path)

    kw = dict(resolution=(12, 12), fov_deg=0.01, verbose=False,
              mc_spp=8, mc_max_depth=8)
    n = render_dataset(str(in_root), str(tmp_path / "a"), str(csv_path),
                       **kw)
    assert n == 2
    out = tmp_path / "a" / "0000000001"
    files = sorted(os.listdir(out))
    assert files == ["sample_000_time_0_view_0.pkl",
                     "sample_000_time_0_view_1.pkl"]
    imgs = []
    for fn in files:
        with open(out / fn, "rb") as f:
            d = pickle.load(f)
        assert d["render"].shape == (12, 12)
        assert np.isfinite(d["render"]).all() and (d["render"] >= 0).all()
        imgs.append(d["render"])
    assert imgs[0].max() > 0                  # the blob scatters light
    # the two views get different seeds -> different noise realizations
    assert np.abs(imgs[0] - imgs[1]).max() > 0

    # same mc_seed reproduces the dataset byte-for-byte
    render_dataset(str(in_root), str(tmp_path / "b"), str(csv_path), **kw)
    for fn in files:
        with open(out / fn, "rb") as f:
            a = pickle.load(f)["render"]
        with open(tmp_path / "b" / "0000000001" / fn, "rb") as f:
            b = pickle.load(f)["render"]
        np.testing.assert_array_equal(a, b)
    # a different mc_seed gives a different realization
    render_dataset(str(in_root), str(tmp_path / "c"), str(csv_path),
                   **{**kw, "mc_seed": 7})
    with open(out / files[0], "rb") as f:
        a = pickle.load(f)["render"]
    with open(tmp_path / "c" / "0000000001" / files[0], "rb") as f:
        c = pickle.load(f)["render"]
    assert np.abs(a - c).max() > 0

    # knob conflicts fail loudly
    with pytest.raises(ValueError):
        render_dataset(str(in_root), str(tmp_path / "x"), str(csv_path),
                       mc_spp=4, ms_orders=2, verbose=False)


def test_mc_batched_equals_serial(tmp_path):
    """mc_spp composes with the data-parallel driver: a chunk path-traces
    as ONE vmapped SPMD program over the mesh, and (seeds matching the
    serial derivation) the batched dataset equals the serial one."""
    import pickle

    import jax
    from jax.sharding import Mesh

    from unet_convlstm_tpu.datagen.render_batch import render_dataset

    in_root, csv_path = _patch_fixture(tmp_path)
    # second + third patches in the same folder: exercises within-folder
    # index bookkeeping (seeds) and non-divisible batch padding
    with open(in_root / "0000000001" / "sample_000.pkl", "rb") as f:
        beta = pickle.load(f)["beta_ext"]
    for i in (1, 2):
        with open(in_root / "0000000001" / f"sample_00{i}.pkl",
                  "wb") as f:
            pickle.dump({"beta_ext": np.roll(beta, i, axis=1)}, f)

    # mc_majorant_cell=4 exercises the super-voxel grid in BOTH paths
    # (it changes the RNG realization, so the knob must reach serial and
    # batched identically for the equality below to hold)
    kw = dict(resolution=(12, 12), fov_deg=0.01, verbose=False,
              mc_spp=8, mc_max_depth=8, mc_seed=3, mc_majorant_cell=4)
    n1 = render_dataset(str(in_root), str(tmp_path / "serial"),
                        str(csv_path), **kw)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    n2 = render_dataset(str(in_root), str(tmp_path / "batched"),
                        str(csv_path), **kw, batch_size=2, mesh=mesh)
    assert n1 == n2 == 6
    for i in range(3):
        for sat in range(2):
            fn = f"0000000001/sample_00{i}_time_0_view_{sat}.pkl"
            with open(tmp_path / "serial" / fn, "rb") as f:
                a = pickle.load(f)["render"]
            with open(tmp_path / "batched" / fn, "rb") as f:
                b = pickle.load(f)["render"]
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8,
                                       err_msg=fn)


def test_mc_cli_flags_reach_the_driver(tmp_path, capsys):
    """`gen-renders --mc-spp/--mc-max-depth/--mc-seed` plumb through the
    CLI to render_dataset."""
    import pickle

    from unet_convlstm_tpu.cli import main

    in_root, csv_path = _patch_fixture(tmp_path)
    main(["gen-renders", "--input", str(in_root),
          "--output", str(tmp_path / "out"), "--csv", str(csv_path),
          "--res", "12", "--fov", "0.01",
          "--mc-spp", "4", "--mc-max-depth", "4", "--mc-seed", "5",
          "--mc-majorant-cell", "4"])
    assert "wrote 2 render pkls" in capsys.readouterr().out
    with open(tmp_path / "out" / "0000000001"
              / "sample_000_time_0_view_0.pkl", "rb") as f:
        d = pickle.load(f)
    assert d["render"].shape == (12, 12)
    assert np.isfinite(d["render"]).all()


def test_calibrate_ms_scale_matches_mc_mean_exactly():
    """The diffuse term is linear in e_ms, so rendering with e_ms*s hits
    the MC mean exactly (by construction) — and at backscatter geometry,
    where isotropic SOS overestimates (docs/RENDERER.md table), the
    fitted scale must be < 1."""
    from unet_convlstm_tpu.datagen.mc_reference import calibrate_ms_scale
    from unet_convlstm_tpu.datagen.renderer import (
        multiple_scatter_fluence, SUN_IRRADIANCE)

    scene = _blob_scene()
    sun = np.asarray(_KW["sun_dir"], np.float32)
    sun = sun / np.linalg.norm(sun)
    t_sun = sun_transmittance(scene, sun)
    e_ms = multiple_scatter_fluence(scene.beta, t_sun, 20.0, 1.0,
                                    SUN_IRRADIANCE, 4)
    s, diag = calibrate_ms_scale(scene, **_KW, ms_orders=4, spp=64,
                                 t_sun=t_sun, e_ms=e_ms, seed=1)
    assert 0.0 < s < 1.0                      # SOS overestimates here
    calib = np.asarray(render_radiance(scene, **_KW, t_sun=t_sun,
                                       e_ms=e_ms * s))
    np.testing.assert_allclose(calib.mean(), diag["mean_mc"], rtol=1e-4)
    # sanity: the diag means are ordered as the domain-gap table says
    assert diag["mean_ss"] < diag["mean_mc"] < diag["mean_sos"]


def test_calibrate_ms_scale_empty_scene_is_noop():
    from unet_convlstm_tpu.datagen.mc_reference import calibrate_ms_scale

    scene = VolumeScene(jnp.zeros((8, 8, 8), jnp.float32), 20.0)
    s, _ = calibrate_ms_scale(scene, (0, 0, 5000.0), (0, 0, 0),
                              resolution=(8, 8), fov_deg=4.0,
                              ms_orders=2, spp=4)
    assert s == 1.0


def test_ms_calibration_in_render_dataset(tmp_path):
    """gen-renders --ms-orders N --ms-calibrate-spp K: renders stay
    deterministic/noise-free but the diffuse energy is MC-corrected —
    between the single-scatter and uncalibrated-SOS renders."""
    import pickle

    from unet_convlstm_tpu.datagen.render_batch import render_dataset

    in_root, csv_path = _patch_fixture(tmp_path)
    kw = dict(resolution=(12, 12), fov_deg=0.01, verbose=False)
    render_dataset(str(in_root), str(tmp_path / "ss"), str(csv_path), **kw)
    render_dataset(str(in_root), str(tmp_path / "sos"), str(csv_path),
                   **kw, ms_orders=4)
    render_dataset(str(in_root), str(tmp_path / "cal"), str(csv_path),
                   **kw, ms_orders=4, ms_calibrate_spp=32)
    fn = "0000000001/sample_000_time_0_view_0.pkl"

    def load(d):
        with open(tmp_path / d / fn, "rb") as f:
            return pickle.load(f)["render"]

    ss, sos, cal = load("ss"), load("sos"), load("cal")
    assert ss.mean() < cal.mean() < sos.mean()
    # determinism: same seed -> identical output
    render_dataset(str(in_root), str(tmp_path / "cal2"), str(csv_path),
                   **kw, ms_orders=4, ms_calibrate_spp=32)
    np.testing.assert_array_equal(cal, load("cal2"))

    with pytest.raises(ValueError):
        render_dataset(str(in_root), str(tmp_path / "x"), str(csv_path),
                       ms_calibrate_spp=8, verbose=False)
    with pytest.raises(ValueError):
        render_dataset(str(in_root), str(tmp_path / "x"), str(csv_path),
                       ms_orders=2, ms_calibrate_spp=8, batch_size=2,
                       verbose=False)


def test_max_events_is_not_a_compile_key():
    """max_events derives per patch from beta_max, so it must be a traced
    operand of the jitted tracer: if it were static, gen-renders --mc-spp
    would retrace + recompile for nearly every patch in a dataset sweep
    (tens of seconds each on TPU), dwarfing the render itself."""
    from unet_convlstm_tpu.datagen.mc_reference import _mc_radiance_impl

    scene = _blob_scene()
    _ = mc_radiance(scene, **_KW, spp=2, max_events=70, seed=0)
    n_compiles = _mc_radiance_impl._cache_size()
    _ = mc_radiance(scene, **_KW, spp=2, max_events=93, seed=1)
    assert _mc_radiance_impl._cache_size() == n_compiles


def test_mc_view_seed_contract():
    """The per-(folder, patch, view) seed is the dataset reproducibility
    contract shared by the serial and batched drivers; pin its values so
    an accidental formula change (which would silently re-realize every
    --mc-spp dataset) fails a test instead."""
    from unet_convlstm_tpu.datagen.mc_reference import mc_view_seed

    assert mc_view_seed(0, 0, 0, 0) == 0
    assert mc_view_seed(5, 3, 2, 1) == 5 * 1000003 + 3 * 8191 + 2 * 131 + 1
    assert 0 <= mc_view_seed(2**31 - 1, 10**6, 10**4, 3) <= 0x7FFFFFFF
    # distinct identities -> distinct seeds in a realistic dataset range
    seeds = {mc_view_seed(7, f, n, s)
             for f in range(40) for n in range(49) for s in range(2)}
    assert len(seeds) == 40 * 49 * 2


def test_spp_chunking_samples_the_same_realization():
    """spp_chunk splits the spp scan across dispatches but consumes the
    SAME per-round keys in the same order — the sampled paths are
    identical and only the final summation associates differently, so
    chunked and monolithic renders agree to float round-off (this is what
    makes it a kernel-duration knob rather than a dataset knob)."""
    scene = _blob_scene()
    mono = np.asarray(mc_radiance(scene, **_KW, spp=12, seed=7))
    for chunk in (1, 5, 12):
        part = np.asarray(mc_radiance(scene, **_KW, spp=12, seed=7,
                                      spp_chunk=chunk))
        np.testing.assert_allclose(part, mono, rtol=2e-6, atol=1e-8)
    # and through the batched driver (render_views_batch mc_spp_chunk)
    from unet_convlstm_tpu.datagen.render_shard import render_views_batch

    beta_b = np.stack([np.asarray(scene.beta)] * 2)
    views = [((0, 0, 20000.0), (0, 0, 240.0), (1.0, 0.0, 0.0))]
    seeds = np.array([[3], [9]], np.int32)
    kw = dict(voxel_size=20.0, fov_deg=1.2, resolution=(24, 24),
              mc_spp=8, mc_seeds=seeds)
    mono_b = render_views_batch(beta_b, views, _KW["sun_dir"], **kw)
    chunk_b = render_views_batch(beta_b, views, _KW["sun_dir"],
                                 mc_spp_chunk=3, **kw)
    np.testing.assert_allclose(chunk_b, mono_b, rtol=2e-6, atol=1e-8)
