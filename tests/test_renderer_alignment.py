"""Volumetric renderer + homography alignment tests."""

import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from unet_convlstm_tpu.datagen.renderer import (
    VolumeScene, hg_phase, make_camera_rays, sun_transmittance,
    render_radiance, make_synthetic_debug_volume,
)
from unet_convlstm_tpu.datagen.alignment import (
    warp_to_virtual_camera, _homography_from_points,
)


def test_hg_phase_normalizes():
    # ∫ p dΩ = 2π ∫ p(cosθ) dcosθ = 1
    mu = np.linspace(-1, 1, 20001)
    for g in (0.0, 0.5, 0.85):
        p = np.asarray(hg_phase(jnp.asarray(mu), g))
        integral = 2 * np.pi * np.trapezoid(p, mu)
        assert integral == pytest.approx(1.0, rel=1e-3)


def test_sun_transmittance_uniform_slab():
    """Uniform β slab under vertical sun: analytic Beer-Lambert."""
    beta_val, vox = 0.01, 20.0
    beta = np.full((10, 4, 4), beta_val, np.float32)
    scene = VolumeScene(jnp.asarray(beta), vox)
    t_sun = np.asarray(sun_transmittance(scene, (0.0, 0.0, -1.0), step=vox))
    # voxel at layer z (center) sees (nz - z - 0.5)*vox of medium above
    for z in (0, 5, 9):
        depth = (10 - z - 0.5) * vox
        assert t_sun[z, 2, 2] == pytest.approx(
            np.exp(-beta_val * depth), rel=0.05)


def test_render_empty_volume_is_black():
    scene = VolumeScene(jnp.zeros((8, 8, 8), jnp.float32), 20.0)
    img = np.asarray(render_radiance(scene, (0, 0, 5000.0), (0, 0, 0),
                                     resolution=(16, 16), fov_deg=4.0))
    np.testing.assert_array_equal(img, 0.0)


def test_render_slab_structure():
    """A centered cloud block renders brighter in the middle; nonzero only
    where rays cross the medium."""
    beta = np.zeros((16, 32, 32), np.float32)
    beta[6:12, 10:22, 10:22] = 0.05
    scene = VolumeScene(jnp.asarray(beta), 20.0)
    img = np.asarray(render_radiance(
        scene, (0, 0, 20000.0), (0, 0, 0), fov_deg=2.2,
        resolution=(32, 32), sun_dir=(0.2, 0.1, -0.97), g=0.85))
    assert img.max() > 0
    center = img[12:20, 12:20].mean()
    corner = img[:4, :4].mean()
    assert center > 10 * max(corner, 1e-9)
    assert np.isfinite(img).all()


def test_debug_volume_layout():
    vol = make_synthetic_debug_volume(width=64, depth=100)
    assert vol.shape == (100, 64, 64)  # [Z, Y, X]
    assert (vol > 0).mean() > 0.01
    assert vol.max() == pytest.approx(0.2)   # the cube density
    # border frame present on the x/y faces
    assert vol[50, 0, 10] == pytest.approx(0.005)


def test_homography_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    src = np.array([[0, 0], [64, 0], [64, 64], [0, 64]], np.float32)
    dst = (src + rng.uniform(-8, 8, src.shape).astype(np.float32))
    H_ours = _homography_from_points(src.astype(np.float64),
                                     dst.astype(np.float64))
    H_cv = cv2.getPerspectiveTransform(src, dst)
    np.testing.assert_allclose(H_ours, H_cv, rtol=1e-5, atol=1e-6)


def test_warp_identity():
    """Source camera == virtual camera → warp is (near-)identity."""
    rng = np.random.default_rng(0)
    img = rng.random((64, 64)).astype(np.float32)
    K = np.array([[800.0, 0, 32.0], [0, 800.0, 32.0], [0, 0, 1.0]])
    pose = np.array([0.0, 0.0, 600.0])
    out = warp_to_virtual_camera(img, pose, pose, K, 64, plane_height=0.0)
    np.testing.assert_allclose(out[8:-8, 8:-8], img[8:-8, 8:-8],
                               rtol=1e-3, atol=1e-3)


def _reference_project(points_w, pose, K):
    """The test's OWN pinhole projection, re-derived from the reference
    camera equations (image_alignment_utils.py:8-43: forward to target,
    right = forward x world_up[0,1,0], down = forward x right, R rows =
    [right, down, forward], t = -R p) — an oracle INDEPENDENT of
    datagen/alignment.py, so a sign/axis bug there fails this test."""
    target = np.array([0.0, 0.0, 0.0])
    forward = target - pose
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, np.array([0.0, 1.0, 0.0]))
    right = right / np.linalg.norm(right)
    down = np.cross(forward, right)
    down = down / np.linalg.norm(down)
    R = np.vstack([right, down, forward])
    t = -R @ pose.reshape(3, 1)
    cam = (R @ points_w.T + t).T
    uvw = (K @ cam.T).T
    return (uvw[:, :2] / uvw[:, 2:3]).astype(np.float32)


def test_warp_aligns_two_views():
    """Two DIFFERENT cameras viewing the same plane pattern must align to
    the SAME virtual-camera image after warp_to_virtual_camera. The
    source views are synthesized with the test's independent projection
    oracle (cv2 homography of reference-equation corner projections) —
    not with the code under test — so this is not a round-trip identity."""
    cv2 = pytest.importorskip("cv2")
    base = np.zeros((64, 64), np.float32)
    base[24:40, 24:40] = 1.0
    K = np.array([[400.0, 0, 32.0], [0, 400.0, 32.0], [0, 0, 1.0]])
    virt = np.array([0.0, 0.0, 500.0])
    poses = [np.array([60.0, -40.0, 500.0]),
             np.array([-80.0, 30.0, 520.0])]

    # world corners of the pattern square on the z=0 plane, computed from
    # the VIRTUAL view's pixel coordinates with the independent oracle
    # (virtual camera at nadir: pixel -> plane is a similarity)
    # pattern square pixel corners in the virtual image:
    px = np.array([[24, 24], [40, 24], [40, 40], [24, 40]], np.float32)
    # invert the virtual projection analytically for the nadir camera:
    # forward=(0,0,-1); right = forward x up = (+1,0,0); down = forward x
    # right = (0,-1,0); cam = R(p_w - pose) = (x, -y, 500)
    # => u = fx*x/500 + cx, v = -fx*y/500 + cx
    fx, cx = K[0, 0], K[0, 2]
    world = np.stack([(px[:, 0] - cx) * 500.0 / fx,
                      -(px[:, 1] - cx) * 500.0 / fx,
                      np.zeros(4)], axis=1)
    # sanity: the oracle reprojects these corners to the virtual pixels
    np.testing.assert_allclose(_reference_project(world, virt, K), px,
                               atol=1e-3)

    warped = []
    for pose in poses:
        src_px = _reference_project(world, pose, K)
        H = cv2.getPerspectiveTransform(px, src_px)
        src_img = cv2.warpPerspective(base, H, (64, 64))
        warped.append(warp_to_virtual_camera(src_img, pose, virt, K, 64,
                                             plane_height=0.0))
    inner = (slice(20, 44), slice(20, 44))
    for w in warped:  # each aligned view recovers the virtual pattern
        assert np.corrcoef(w[inner].ravel(),
                           base[inner].ravel())[0, 1] > 0.9
    # and the two aligned views agree with each other
    assert np.corrcoef(warped[0][inner].ravel(),
                       warped[1][inner].ravel())[0, 1] > 0.9


def test_render_batch_driver(tmp_path):
    from unet_convlstm_tpu.datagen.render_batch import render_dataset
    in_root = tmp_path / "patches"
    (in_root / "0000000001").mkdir(parents=True)
    beta = np.zeros((10, 16, 16), np.float32)
    beta[4:8, 4:12, 4:12] = 0.05
    patch = {"beta_ext": beta, "U": beta, "V": beta, "W": beta}
    with open(in_root / "0000000001" / "sample_000.pkl", "wb") as f:
        pickle.dump(patch, f)
    csv_text = (
        "utc time,sun zenith [deg],sun azimuth [deg],sat zenith [deg],"
        "sat azimuth [deg],scattering angle [deg],"
        "sat ENU coordinates [km],lookat ENU coordinates [km]\n"
        '0,145.0,32.6,53.8,168.3,131.5,"[-747.0, 154.9, 558.6]","[0, 0, 0]"\n'
        '0,145.0,32.6,46.8,168.3,164.3,"[-598.1, 124.0, 573.4]","[0, 0, 0]"\n')
    csv_path = tmp_path / "overpass.csv"
    csv_path.write_text(csv_text)
    n = render_dataset(str(in_root), str(tmp_path / "renders"),
                       str(csv_path), resolution=(16, 16), fov_deg=0.01,
                       verbose=False)
    assert n == 2
    out_dir = tmp_path / "renders" / "0000000001"
    files = sorted(os.listdir(out_dir))
    assert files == ["sample_000_time_0_view_0.pkl",
                     "sample_000_time_0_view_1.pkl"]
    with open(out_dir / files[0], "rb") as f:
        d = pickle.load(f)
    assert d["render"].shape == (16, 16)
    assert d["timestamp"] == 0 and d["satellite_idx"] == 0
    assert np.isfinite(d["render"]).all()


def test_render_batch_corrupt_pkl_isolates_one_sample(tmp_path):
    """Serial stage-B per-sample isolation (render_all.py:194-195): one
    corrupt pkl must cost exactly that sample — the prefetch future must
    be resubmitted even when the current one failed, or every later patch
    in the folder re-raises the same error (a silent mass skip)."""
    from unet_convlstm_tpu.datagen.render_batch import render_dataset
    in_root = tmp_path / "patches"
    (in_root / "0000000001").mkdir(parents=True)
    beta = np.zeros((10, 16, 16), np.float32)
    beta[4:8, 4:12, 4:12] = 0.05
    patch = {"beta_ext": beta, "U": beta, "V": beta, "W": beta}
    for name in ("sample_000.pkl", "sample_002.pkl"):
        with open(in_root / "0000000001" / name, "wb") as f:
            pickle.dump(patch, f)
    (in_root / "0000000001" / "sample_001.pkl").write_bytes(b"corrupt")
    csv_text = (
        "utc time,sun zenith [deg],sun azimuth [deg],sat zenith [deg],"
        "sat azimuth [deg],scattering angle [deg],"
        "sat ENU coordinates [km],lookat ENU coordinates [km]\n"
        '0,145.0,32.6,53.8,168.3,131.5,"[-747.0, 154.9, 558.6]","[0, 0, 0]"\n')
    csv_path = tmp_path / "overpass.csv"
    csv_path.write_text(csv_text)
    n = render_dataset(str(in_root), str(tmp_path / "renders"),
                       str(csv_path), resolution=(16, 16), fov_deg=0.01,
                       verbose=False)
    assert n == 2                       # 000 and 002 rendered, 001 skipped
    files = sorted(os.listdir(tmp_path / "renders" / "0000000001"))
    assert files == ["sample_000_time_0_view_0.pkl",
                     "sample_002_time_0_view_0.pkl"]


def test_render_batch_mixed_shapes_lose_only_their_own(tmp_path):
    """Batched stage B groups a chunk by volume shape: one odd-shaped
    patch must not drop the whole chunk (the serial driver would have
    rendered the others)."""
    from unet_convlstm_tpu.datagen.render_batch import render_dataset
    in_root = tmp_path / "patches"
    (in_root / "0000000001").mkdir(parents=True)
    beta = np.zeros((10, 16, 16), np.float32)
    beta[4:8, 4:12, 4:12] = 0.05
    for i, b in enumerate([beta, beta[:8], beta]):   # middle one truncated
        with open(in_root / "0000000001" / f"sample_{i:03d}.pkl",
                  "wb") as f:
            pickle.dump({"beta_ext": b}, f)
    csv_text = (
        "utc time,sun zenith [deg],sun azimuth [deg],sat zenith [deg],"
        "sat azimuth [deg],scattering angle [deg],"
        "sat ENU coordinates [km],lookat ENU coordinates [km]\n"
        '0,145.0,32.6,53.8,168.3,131.5,"[-747.0, 154.9, 558.6]","[0, 0, 0]"\n')
    csv_path = tmp_path / "overpass.csv"
    csv_path.write_text(csv_text)
    n = render_dataset(str(in_root), str(tmp_path / "renders"),
                       str(csv_path), resolution=(16, 16), fov_deg=0.01,
                       batch_size=3, verbose=False)
    assert n == 3                       # every patch rendered, 2 sub-chunks
    files = sorted(os.listdir(tmp_path / "renders" / "0000000001"))
    assert len(files) == 3


def test_patch_folders_sort_numerically(tmp_path):
    """Unpadded numeric folders must enumerate in NUMERIC order (the
    reference sorts numerically in stages A and D; a lexicographic '10'
    before '2' would swap cyclic-time camera/sun assignments)."""
    from unet_convlstm_tpu.datagen.overpass import enumerate_patch_folders
    for name in ("0", "1", "2", "10", "11"):
        (tmp_path / name).mkdir()
    out = enumerate_patch_folders(str(tmp_path))
    assert [f for _, f in out] == ["0", "1", "2", "10", "11"]
    assert [i for i, _ in out] == [0, 1, 2, 3, 4]
    # bounded runs keep FULL-list positions (resume parity)
    out = enumerate_patch_folders(str(tmp_path), start=2, end=10)
    assert out == [(2, "2"), (3, "10")]


def test_ocean_albedo_adds_background():
    """Legacy ocean surface (render_from_udi_class.py:223-234): downward
    rays that miss the cloud pick up sun-lit surface radiance."""
    beta = np.zeros((8, 16, 16), np.float32)
    beta[3:5, 6:10, 6:10] = 0.3
    scene = VolumeScene(jnp.asarray(beta), 20.0)
    # fov sized so the footprint (~240 m) stays inside the 320 m volume
    kw = dict(origin=(0, 0, 20000.0), target=(0, 0, 0), fov_deg=0.6,
              resolution=(16, 16), sun_dir=(0.1, 0.0, -0.99))
    dark = np.asarray(render_radiance(scene, **kw, ocean_albedo=0.0))
    lit = np.asarray(render_radiance(scene, **kw, ocean_albedo=0.3))
    assert lit[1, 1] > dark[1, 1]           # clear-sky pixel sees ocean
    assert np.all(lit >= dark - 1e-6)
    # under the optically thick cloud the ocean contribution is attenuated
    clear_gain = lit[1, 1] - dark[1, 1]
    cloudy_gain = lit[8, 8] - dark[8, 8]
    assert cloudy_gain < clear_gain


def test_fov_from_geometry():
    from unet_convlstm_tpu.datagen.renderer import fov_from_geometry
    fov = fov_from_geometry([46.8, 53.8], [573.0, 558.0],
                            cloud_width_m=2560.0)
    # nadir-ish satellite at ~573 km covering 2.56 km: tiny fov
    assert 0.2 < fov < 0.4
    fov_pad = fov_from_geometry([46.8, 53.8], [573.0, 558.0],
                                cloud_width_m=2560.0, pad_image=True)
    assert np.isfinite(fov_pad)


# --- multiple scattering (VERDICT round-1 #4) ---------------------------

def _ms_scene():
    from unet_convlstm_tpu.datagen.renderer import (
        VolumeScene, make_synthetic_debug_volume)
    vol = make_synthetic_debug_volume(width=32, depth=40)
    return VolumeScene(jnp.asarray(vol), voxel_size=20.0)


def test_ms_orders_1_matches_single_scatter():
    """ms_orders=1 must be bit-identical to the round-1 single-scatter
    path (the flag defaults off)."""
    from unet_convlstm_tpu.datagen.renderer import render_radiance

    scene = _ms_scene()
    kw = dict(origin=(0, 0, 5000.0), target=(0, 0, 400.0), fov_deg=8.0,
              resolution=(48, 48), sun_dir=(0.2, 0.0, -0.98))
    base = np.asarray(render_radiance(scene, **kw))
    again = np.asarray(render_radiance(scene, **kw, ms_orders=1))
    np.testing.assert_array_equal(base, again)


def test_ms_adds_energy_and_converges():
    """Each added order contributes non-negative radiance, and the
    per-order increments shrink geometrically (albedo < 1 ->
    Neumann-series convergence)."""
    from unet_convlstm_tpu.datagen.renderer import render_radiance

    scene = _ms_scene()
    kw = dict(origin=(0, 0, 5000.0), target=(0, 0, 400.0), fov_deg=8.0,
              resolution=(48, 48), sun_dir=(0.2, 0.0, -0.98), albedo=0.9)
    means = [float(np.asarray(render_radiance(scene, **kw,
                                              ms_orders=n)).mean())
             for n in (1, 2, 3, 4)]
    deltas = np.diff(means)
    assert np.all(deltas >= -1e-9)          # monotone in order
    assert deltas[0] > 0                    # order 2 actually adds light
    assert deltas[2] < deltas[1] < deltas[0] * 1.0001  # shrinking tail


def test_ms_fluence_zero_without_cloud():
    from unet_convlstm_tpu.datagen.renderer import multiple_scatter_fluence

    beta = jnp.zeros((8, 8, 8))
    t_sun = jnp.ones((8, 8, 8))
    e = multiple_scatter_fluence(beta, t_sun, 20.0, 1.0, 131.4, 3)
    np.testing.assert_array_equal(np.asarray(e), 0.0)


def test_ms_precomputed_fluence_matches_inline():
    from unet_convlstm_tpu.datagen.renderer import (
        multiple_scatter_fluence, render_radiance, sun_transmittance)

    scene = _ms_scene()
    sun = jnp.asarray((0.2, 0.0, -0.98))
    sun = sun / jnp.linalg.norm(sun)
    t_sun = sun_transmittance(scene, sun)
    e_ms = multiple_scatter_fluence(scene.beta, t_sun, 20.0, 1.0,
                                    131.4, 3)
    kw = dict(origin=(0, 0, 5000.0), target=(0, 0, 400.0), fov_deg=8.0,
              resolution=(32, 32), sun_dir=(0.2, 0.0, -0.98))
    inline = np.asarray(render_radiance(scene, **kw, ms_orders=3))
    pre = np.asarray(render_radiance(scene, **kw, t_sun=t_sun, e_ms=e_ms))
    np.testing.assert_allclose(pre, inline, rtol=1e-6, atol=1e-8)


# --- legacy udi renderer specifics (VERDICT round-1 missing #4) ---------

def test_legacy_sun_direction_formula():
    """[-sin az, cos az, -1/tan(180-zen)] normalized
    (render_from_udi_class.py:213-217)."""
    from unet_convlstm_tpu.datagen.overpass import legacy_sun_direction

    d = legacy_sun_direction(145.0, 30.0)
    raw = np.array([-np.sin(np.deg2rad(30)), np.cos(np.deg2rad(30)),
                    -1 / np.tan(np.deg2rad(180 - 145))])
    np.testing.assert_allclose(d, raw / np.linalg.norm(raw), rtol=1e-12)
    assert d[2] < 0  # sunlight travels downward for zenith > 90
    assert abs(np.linalg.norm(d) - 1.0) < 1e-12


def test_legacy_sensor_rotation_geometry():
    """rotate([cos az, sin az, 0], zenith) about the world origin
    (render_from_udi_class.py:104-109): target at the origin is fixed,
    distances are preserved, zenith=0 is the identity, and the rotated
    camera still looks at the cloud."""
    from unet_convlstm_tpu.datagen.renderer import legacy_sensor_rotation

    o = np.array([1000.0, 2000.0, 500000.0], np.float32)
    t = np.zeros(3, np.float32)
    up = np.array([1.0, 0.0, 0.0], np.float32)

    o0, t0, u0 = legacy_sensor_rotation(o, t, up, 0.0, 40.0)
    np.testing.assert_allclose(o0, o, rtol=1e-6)
    np.testing.assert_allclose(u0, up, rtol=1e-6)

    o1, t1, u1 = legacy_sensor_rotation(o, t, up, 25.0, 40.0)
    np.testing.assert_allclose(t1, 0.0, atol=1e-6)          # origin fixed
    assert np.linalg.norm(o1) == pytest.approx(np.linalg.norm(o), rel=1e-6)
    assert abs(np.linalg.norm(u1) - 1.0) < 1e-5
    assert not np.allclose(o1, o)                           # actually moved
    # rotation angle between old and new camera position == zenith
    cosang = float(o1 @ o) / float(np.linalg.norm(o) ** 2)
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) == \
        pytest.approx(25.0, abs=0.2)


def test_legacy_rotation_renders(rng):
    """A render through the rotated camera still sees the volume."""
    from unet_convlstm_tpu.datagen.renderer import (
        VolumeScene, legacy_sensor_rotation, make_synthetic_debug_volume,
        render_radiance)

    vol = make_synthetic_debug_volume(width=32, depth=40)
    scene = VolumeScene(jnp.asarray(vol), voxel_size=20.0)
    o, t, u = legacy_sensor_rotation(
        np.array([0, 0, 5000.0], np.float32), np.zeros(3, np.float32),
        np.array([1.0, 0, 0], np.float32), 10.0, 60.0)
    img = np.asarray(render_radiance(scene, o, t, u, fov_deg=10.0,
                                     resolution=(32, 32),
                                     sun_dir=(0.2, 0.0, -0.98)))
    assert np.isfinite(img).all() and img.max() > 0


def test_sweep_matches_march():
    """The O(V) shear-sweep transmittance agrees with the O(V*L) per-voxel
    ray march on a smooth cloud-like volume, across sun angles."""
    z, y, x = np.meshgrid(np.arange(40), np.arange(24), np.arange(24),
                          indexing="ij")
    blob = np.exp(-(((z - 22) / 10.0) ** 2 + ((y - 12) / 7.0) ** 2
                    + ((x - 10) / 7.0) ** 2))
    beta = (0.005 * blob).astype(np.float32)
    scene = VolumeScene(jnp.asarray(beta), 20.0)
    for sun in [(0.0, 0.0, -1.0), (0.3, 0.2, -0.9), (-0.5, 0.1, -0.85)]:
        t_march = np.asarray(sun_transmittance(scene, sun, method="march"))
        t_sweep = np.asarray(sun_transmittance(scene, sun, method="sweep"))
        assert np.abs(t_sweep - t_march).max() < 0.03, sun

    # vertical sun: identical quadrature -> near-exact
    tm = np.asarray(sun_transmittance(scene, (0.0, 0.0, -1.0),
                                      method="march"))
    ts = np.asarray(sun_transmittance(scene, (0.0, 0.0, -1.0),
                                      method="sweep"))
    np.testing.assert_allclose(ts, tm, atol=1e-5)

    # grazing sun: 'auto' falls back to the march
    t_auto = np.asarray(sun_transmittance(scene, (0.95, 0.0, -0.1)))
    t_march = np.asarray(sun_transmittance(scene, (0.95, 0.0, -0.1),
                                           method="march"))
    np.testing.assert_array_equal(t_auto, t_march)


def test_transmittance_method_contract():
    """Explicit step forces the march under 'auto' (the sweep cannot honor
    a quadrature-step request); both methods normalize sun_dir; bad inputs
    fail loudly."""
    beta = np.zeros((10, 8, 8), np.float32)
    beta[3:7, 2:6, 2:6] = 0.01
    scene = VolumeScene(jnp.asarray(beta), 20.0)

    # explicit step under 'auto' -> march result exactly
    t_auto = np.asarray(sun_transmittance(scene, (0.1, 0.0, -1.0),
                                          step=5.0))
    t_march = np.asarray(sun_transmittance(scene, (0.1, 0.0, -1.0),
                                           step=5.0, method="march"))
    np.testing.assert_array_equal(t_auto, t_march)

    # unnormalized sun vector: both methods agree with the unit-vector run
    sun2 = (0.6, 0.4, -1.8)
    unit = tuple(np.asarray(sun2) / np.linalg.norm(sun2))
    for method in ("march", "sweep"):
        a = np.asarray(sun_transmittance(scene, sun2, method=method))
        b = np.asarray(sun_transmittance(scene, unit, method=method))
        np.testing.assert_allclose(a, b, atol=1e-6)

    with pytest.raises(ValueError, match="horizontal sun"):
        sun_transmittance(scene, (1.0, 0.0, 0.0), method="sweep")
    with pytest.raises(ValueError, match="unknown method"):
        sun_transmittance(scene, (0.0, 0.0, -1.0), method="swep")


# --- near-parallel (ortho shear-warp) camera path -----------------------

def _blob_scene(f: int = 1) -> VolumeScene:
    """Smooth cloud-like blob (hard edges would measure the two paths'
    different boundary treatment, not their geometry — same reasoning as
    test_sweep_matches_march)."""
    z, y, x = np.meshgrid(np.arange(40 * f), np.arange(24 * f),
                          np.arange(24 * f), indexing="ij")
    blob = np.exp(-(((z - 22 * f) / (10.0 * f)) ** 2
                    + ((y - 12 * f) / (7.0 * f)) ** 2
                    + ((x - 10 * f) / (7.0 * f)) ** 2))
    return VolumeScene(jnp.asarray((0.01 / f * blob).astype(np.float32)),
                       20.0 / f)


_SAT_D = 573000.0           # production satellite distance (overpass CSV)
_SAT_FOV = 2 * np.degrees(np.arctan(349.0 / _SAT_D))


def test_ortho_matches_march():
    """The O(V) shear-warp camera composite agrees with the per-sample ray
    march at the production satellite geometry (~573 km, fov ~0.07 deg ->
    worst-case parallax ~0.01 voxel), across nadir / oblique / below-volume
    (flip) views and the ms / ocean source channels. The residual gap is the
    two quadratures' voxel-sampling difference (nearest-voxel march vs
    bilinear shear), first-order in voxel size — verified by the halving
    check at 2x volume resolution."""
    scene = _blob_scene()
    cases = {
        "nadir": (dict(origin=(0, 0, _SAT_D), target=(0, 0, 0),
                       sun_dir=(0.2, 0.1, -0.97)), 0.13, 0.015),
        "oblique": (dict(origin=(-598100.0, 124000.0, 573400.0),
                         target=(0, 0, 400.0), sun_dir=(0.2, 0.1, -0.97)),
                    0.05, 0.002),
        "below": (dict(origin=(0, 0, -_SAT_D), target=(0, 0, 400.0),
                       sun_dir=(0.2, 0.1, -0.97)), 0.14, 0.02),
        "ms": (dict(origin=(0, 0, _SAT_D), target=(0, 0, 0),
                    sun_dir=(0.2, 0.1, -0.97), ms_orders=3), 0.16, 0.02),
        "ocean": (dict(origin=(0, 0, _SAT_D), target=(0, 0, 0),
                       sun_dir=(0.1, 0.0, -0.99), ocean_albedo=0.3),
                  0.10, 0.01),
    }
    for name, (kw, tol_max, tol_mean) in cases.items():
        fov = kw.pop("fov_deg", _SAT_FOV * (2.2 if name == "oblique" else 1))
        m = np.asarray(render_radiance(scene, **kw, fov_deg=fov,
                                       resolution=(32, 32),
                                       camera_method="march"))
        o = np.asarray(render_radiance(scene, **kw, fov_deg=fov,
                                       resolution=(32, 32),
                                       camera_method="ortho"))
        d = np.abs(o - m)
        s = m.max()
        assert d.max() / s < tol_max, (name, d.max() / s)
        assert d.mean() / s < tol_mean, (name, d.mean() / s)
        assert np.corrcoef(o.ravel(), m.ravel())[0, 1] > 0.995, name

    # the residual is voxel quadrature, not geometry: it halves at 2x res
    kw = dict(origin=(0, 0, _SAT_D), target=(0, 0, 0), fov_deg=_SAT_FOV,
              resolution=(32, 32), sun_dir=(0.2, 0.1, -0.97))
    means = []
    for f in (1, 2):
        sc = _blob_scene(f)
        m = np.asarray(render_radiance(sc, **kw, camera_method="march"))
        o = np.asarray(render_radiance(sc, **kw, camera_method="ortho"))
        means.append(np.abs(o - m).mean() / m.max())
    assert means[0] / means[1] > 1.5, means


def test_ortho_camera_method_contract():
    """'auto' dispatch is exact (picks one path, never blends); explicit
    step forces the march; ineligible geometry fails loudly under 'ortho'
    and falls back under 'auto'."""
    scene = _blob_scene()
    kw = dict(origin=(0, 0, _SAT_D), target=(0, 0, 0), fov_deg=_SAT_FOV,
              resolution=(16, 16), sun_dir=(0.2, 0.1, -0.97))

    # eligible geometry: auto == ortho bit-exactly
    np.testing.assert_array_equal(
        np.asarray(render_radiance(scene, **kw)),
        np.asarray(render_radiance(scene, **kw, camera_method="ortho")))

    # explicit step is a quadrature request: auto == march bit-exactly,
    # and 'ortho' refuses
    np.testing.assert_array_equal(
        np.asarray(render_radiance(scene, **kw, step=10.0)),
        np.asarray(render_radiance(scene, **kw, step=10.0,
                                   camera_method="march")))
    with pytest.raises(ValueError, match="explicit step"):
        render_radiance(scene, **kw, step=10.0, camera_method="ortho")

    # grazing camera: 'ortho' refuses, 'auto' falls back to the march
    graze = dict(origin=(_SAT_D, 0.0, 30000.0), target=(0, 0, 400.0),
                 fov_deg=_SAT_FOV, resolution=(16, 16),
                 sun_dir=(0.2, 0.1, -0.97))
    with pytest.raises(ValueError, match="grazing"):
        render_radiance(scene, **graze, camera_method="ortho")
    np.testing.assert_array_equal(
        np.asarray(render_radiance(scene, **graze)),
        np.asarray(render_radiance(scene, **graze, camera_method="march")))

    # camera inside the volume's z range
    with pytest.raises(ValueError, match="inside"):
        render_radiance(scene, (0.0, 0.0, 700.0), (0, 0, 0),
                        fov_deg=_SAT_FOV, resolution=(16, 16),
                        camera_method="ortho")

    # fov too wide for the parallel-ray approximation
    with pytest.raises(ValueError, match="near-parallel"):
        render_radiance(scene, (0, 0, 20000.0), (0, 0, 0), fov_deg=8.0,
                        resolution=(16, 16), camera_method="ortho")

    with pytest.raises(ValueError, match="unknown camera_method"):
        render_radiance(scene, **kw, camera_method="orthographic")


def test_sequences_map_type_validation(tmp_path):
    from unet_convlstm_tpu.datagen.sequences import build_trajectory_sequences

    for bad in ("ww", "q", "", "wvx"):
        with pytest.raises(ValueError, match="map_type"):
            build_trajectory_sequences(str(tmp_path), str(tmp_path),
                                       str(tmp_path / "o.npz"),
                                       map_type=bad, verbose=False)
