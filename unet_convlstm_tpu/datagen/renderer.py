"""Stage B — volumetric radiance rendering, JAX-native (runs on TPU).

The reference renders satellite radiance views with Mitsuba 3's ``volpath``
path tracer (mitsuba3/render.py:194-294: heterogeneous medium in a null-BSDF
cube, Henyey-Greenstein phase g=0.85, directional sun emitter with irradiance
131.4, spp 8192). Mitsuba/Dr.Jit is a CUDA/LLVM engine — the TPU-native
replacement implemented here is a deterministic single-scattering volume
renderer with precomputed sun transmittance:

    L(ray) = Σ_t  T_cam(t) · β(x_t) · a · p_HG(cosθ) · T_sun(x_t) · E_sun · Δt
    T_cam(t) = exp(-Σ_{s<t} β Δs),   T_sun = exp(-∫ β towards the sun)

which captures the dominant radiance structure of optically thin-to-moderate
cumulus at a tiny fraction of the cost, with no RNG (noise-free at "spp=1").
``ms_orders > 1`` additionally approximates the reference's multiple
scattering (volpath max_depth=-1) with successive orders of scattering:
exact HG single scatter + isotropic-phase higher orders computed by
``multiple_scatter_fluence`` as lax.scan transport sweeps over a
6-direction ordinate set (measured divergence tables in docs/RENDERER.md).
Exact path-traced parity is explicitly out of scope (SURVEY.md §7 hard part
2); the preserved contract is the dataset one — scene geometry (sensors from
the overpass CSV, render.py:102-117), sun model (render.py:204-211), units,
and the ``{'render': HxW}`` pkl schema (render_all.py:180-192). The VOL
interop (vol_format.py) keeps exact-Mitsuba workflows possible off-TPU.

Everything here is jitted: the sun-transmittance volume is one fused gather
kernel over all voxels; camera rays march with a ``lax.scan``-free static
step grid.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import payload_lookup, stack_volume

SUN_IRRADIANCE = 131.4   # reference render.py:277-279


@dataclasses.dataclass
class VolumeScene:
    """β grid [Z, Y, X] in a world box centered in x/y, z ∈ [z_offset,
    z_offset + nz·voxel] (meters)."""
    beta: jax.Array
    voxel_size: float = 20.0
    z_offset: float = 0.0

    @property
    def min_bound(self) -> np.ndarray:
        nz, ny, nx = self.beta.shape
        return np.array([-nx * self.voxel_size / 2,
                         -ny * self.voxel_size / 2, self.z_offset],
                        np.float32)

    @property
    def max_bound(self) -> np.ndarray:
        nz, ny, nx = self.beta.shape
        return self.min_bound + np.array(
            [nx, ny, nz], np.float32) * self.voxel_size

    @property
    def diagonal(self) -> float:
        return float(np.linalg.norm(self.max_bound - self.min_bound))


def hg_phase(cos_theta, g: float):
    """Henyey-Greenstein phase function (normalized over the sphere)."""
    g2 = g * g
    return (1.0 - g2) / (4.0 * jnp.pi *
                         (1.0 + g2 - 2.0 * g * cos_theta) ** 1.5)


def make_camera_rays(origin, target, up, fov_deg: float,
                     resolution: Tuple[int, int]):
    """Perspective rays, Mitsuba-style look_at (origin/target/up —
    render.py:108-117 uses up=[1,0,0]); fov along x."""
    H, W = resolution
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - origin
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    cam_up = jnp.cross(right, fwd)

    aspect = W / H
    scale = math.tan(math.radians(fov_deg * 0.5))
    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))
    x = (2 * (i + 0.5) / W - 1) * scale * aspect
    y = (1 - 2 * (j + 0.5) / H) * scale
    d = x[..., None] * right + y[..., None] * cam_up + fwd
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(origin, d.shape)
    return o, d


def ray_aabb_interval(ro, rd, min_bound, max_bound):
    """Slab-test entry/exit distances of rays [N, 3] against the AABB,
    clamped to the forward half-line: returns ``(tmin, tmax)`` with
    ``tmax > tmin`` iff the ray hits the box. Near-zero direction
    components are replaced by +1e-9 (not ±inf) so the slab ordering
    stays finite. Shared by the deterministic march (_render_impl) and
    the MC path tracer (mc_reference.py) so their entry geometry is
    provably identical."""
    inv_d = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, 1e-9, rd)
    t0 = (min_bound - ro) * inv_d
    t1 = (max_bound - ro) * inv_d
    tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=1), 0.0)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=1)
    return tmin, tmax


@partial(jax.jit, static_argnames=("n_steps",))
def _sun_transmittance_impl(beta, voxel_size, min_bound, sun_dir, step,
                            n_steps):
    """T_sun per voxel: march from each voxel center TOWARDS the sun
    (against the propagation direction ``sun_dir``)."""
    nz, ny, nx = beta.shape
    zi, yi, xi = jnp.meshgrid(jnp.arange(nz), jnp.arange(ny),
                              jnp.arange(nx), indexing="ij")
    centers = jnp.stack(
        [min_bound[0] + (xi + 0.5) * voxel_size,
         min_bound[1] + (yi + 0.5) * voxel_size,
         min_bound[2] + (zi + 0.5) * voxel_size], axis=-1)  # [Z,Y,X,3]
    toward_sun = -sun_dir
    # dead-padded payload moves the march gather onto XLA's fast vector
    # lowering, values identical (ops/gather.py has the measured rule)
    beta2 = stack_volume(beta)

    def body(k, tau):
        # samples at k·step from the center land mid-voxel (midpoint rule);
        # the half-voxel between the center and its own boundary is the
        # initial tau term below
        p = centers + toward_sun * (k * step)
        gi = ((p - min_bound) / voxel_size)
        inb = jnp.all((gi >= 0) & (gi < jnp.array([nx, ny, nz])), axis=-1)
        gii = gi.astype(jnp.int32)
        gx = jnp.clip(gii[..., 0], 0, nx - 1)
        gy = jnp.clip(gii[..., 1], 0, ny - 1)
        gz = jnp.clip(gii[..., 2], 0, nz - 1)
        return tau + jnp.where(
            inb, payload_lookup(beta2, gz, gy, gx)[..., 0], 0.0) * step

    tau = jax.lax.fori_loop(1, n_steps + 1, body, beta * (step * 0.5))
    return jnp.exp(-tau)


@partial(jax.jit, static_argnames=("pad",))
def _sun_transmittance_shear_impl(beta, sx, sy, delta, pad):
    """O(V) shear-warp optical depth (beta z-ordered so the sun side is the
    LAST layer; (sx, sy) = ray shear in voxels per layer; delta = path
    length per layer; ``pad`` >= |shear| * nz keeps every ray column inside
    the sheared frame).

    Three exact-by-construction stages (the classic shear-warp transform —
    no accumulated resampling, unlike a naive per-layer shift recurrence
    whose bilinear smoothing compounds over nz layers):
      1. shear: each beta layer is bilinearly resampled ONCE into a padded
         frame where every sun ray is a vertical column,
      2. integrate: reverse cumulative sum along z — the marcher's own
         quadrature (half-voxel self term + full step per layer above),
      3. unshear: one bilinear lookup of the column integral per voxel.
    Replaces the O(V * L) per-voxel ray march (~1e9 serial gathers on a
    128x128x200 patch) with 2*nz plane resamplings + one cumsum.

    Because the shift is CONSTANT within a layer, each bilinear resampling
    is four ``dynamic_slice`` reads + a weighted sum — contiguous vector
    copies, not the per-element gathers ``map_coordinates`` lowers to
    (TPU gathers are VPU-serial; slices run at copy bandwidth)."""
    nz, ny, nx = beta.shape
    P_y, P_x = ny + 2 * pad, nx + 2 * pad

    def shift2d(E, oy, ox, out_h, out_w):
        """Bilinear sample of E at (i + oy, j + ox) for an out_h x out_w
        output anchored at E's origin; (oy, ox) are traced scalars."""
        iy = jnp.floor(oy)
        ix = jnp.floor(ox)
        fy, fx = oy - iy, ox - ix
        iy = iy.astype(jnp.int32)
        ix = ix.astype(jnp.int32)
        s00 = jax.lax.dynamic_slice(E, (iy, ix), (out_h, out_w))
        s01 = jax.lax.dynamic_slice(E, (iy, ix + 1), (out_h, out_w))
        s10 = jax.lax.dynamic_slice(E, (iy + 1, ix), (out_h, out_w))
        s11 = jax.lax.dynamic_slice(E, (iy + 1, ix + 1), (out_h, out_w))
        return ((1 - fy) * ((1 - fx) * s00 + fx * s01)
                + fy * ((1 - fx) * s10 + fx * s11))

    # beta embedded at offset 2*pad: sheared cell (Y, X) reads world
    # (Y - pad + sy*z) -> embedded index Y + pad + sy*z, in-range for
    # |shear| <= pad by construction.
    E = jnp.pad(beta, ((0, 0), (2 * pad, 2 * pad + 1),
                       (2 * pad, 2 * pad + 1)))
    zi = jnp.arange(nz, dtype=jnp.float32)

    def shear_layer(z, plane):
        return shift2d(plane, pad + sy * z, pad + sx * z, P_y, P_x)

    sb = jax.vmap(shear_layer)(zi, E)               # [nz, ny+2p, nx+2p]
    rev = jnp.cumsum(sb[::-1], axis=0)[::-1]        # sum_{k >= z} sb[k]
    tau_sh = delta * (rev - 0.5 * sb)               # marcher quadrature

    # world voxel (z, y, x) reads sheared (y + pad - sy*z); pad by one so
    # the +1 bilinear taps stay in range at the extremes.
    tau_sh = jnp.pad(tau_sh, ((0, 0), (0, 1), (0, 1)))

    def unshear_layer(z, plane):
        return shift2d(plane, pad - sy * z, pad - sx * z, ny, nx)

    tau = jax.vmap(unshear_layer)(zi, tau_sh)
    return jnp.exp(-tau)


def _sweep_eligible(toward) -> bool:
    """Can the O(V) shear-warp sweep stand in for the transmittance march
    at this sun angle? Single source of the grazing cutoff (sun > ~27 deg
    above the horizon — below it the shear padding outgrows the plane),
    shared by sun_transmittance's 'auto' dispatch and the batched SPMD
    path (render_shard.py)."""
    return abs(float(toward[2])) >= 0.45


def _sweep_static_params(nz: int, voxel_size: float, toward):
    """Host-side static geometry for the shear-warp transmittance sweep:
    flip (sun below the horizon plane → sweep from the bottom layer),
    (sx, sy) shear per layer in voxels, delta path length per layer, and
    the padded-frame size (bucketed to 8 to bound recompiles). Raises for
    horizontal sun. Shared with the batched path (render_shard.py)."""
    tz = float(toward[2])
    if abs(tz) < 1e-3:
        raise ValueError(
            "method='sweep' cannot integrate a horizontal sun "
            "(|z-component| < 1e-3); use method='march'")
    sx = float(toward[0] / abs(tz))
    sy = float(toward[1] / abs(tz))
    delta = voxel_size / abs(tz)
    shear = max(abs(sx), abs(sy)) * nz
    pad = int(-(-(shear + 1) // 8) * 8)
    return bool(tz < 0), sx, sy, delta, pad


def sun_transmittance(scene: VolumeScene, sun_dir,
                      step: Optional[float] = None,
                      method: str = "auto") -> jax.Array:
    """Per-voxel transmittance toward the sun.

    ``method``: 'sweep' (O(V) shear-warp, the default via 'auto' whenever
    the sun is > ~27 deg above the horizon and no explicit ``step`` was
    requested), 'march' (the reference-style per-voxel ray march, O(V*L) —
    also the 'auto' fallback for grazing sun angles, where the shear
    padding outgrows the plane, and for explicit ``step`` requests, which
    the sweep cannot honor: its quadrature spacing is fixed at one layer
    per step). Both use the same quadrature (half-voxel self-term + one
    step per layer); the sweep samples bilinearly where the march samples
    nearest-voxel, and they agree to ~1% transmittance on cloud-like
    volumes (tests/test_renderer_alignment.py::test_sweep_matches_march).
    ``sun_dir`` is normalized here so both methods integrate true path
    length regardless of the caller's vector scale."""
    if method not in ("auto", "sweep", "march"):
        raise ValueError(f"unknown method {method!r}: "
                         f"expected 'auto', 'sweep' or 'march'")
    sun = np.asarray(sun_dir, np.float32)
    sun = sun / np.linalg.norm(sun)
    toward = -sun
    if method == "auto":
        method = ("sweep" if _sweep_eligible(toward) and step is None
                  else "march")
    if method == "sweep":
        if step is not None:
            raise ValueError(
                "method='sweep' integrates at fixed one-layer spacing and "
                "cannot honor an explicit step; omit step or use "
                "method='march'")
        flip, sx, sy, delta, pad = _sweep_static_params(
            scene.beta.shape[0], scene.voxel_size, toward)
        beta = scene.beta[::-1] if flip else scene.beta
        t = _sun_transmittance_shear_impl(
            beta, jnp.float32(sx), jnp.float32(sy), jnp.float32(delta),
            pad)
        return t[::-1] if flip else t
    step = step or scene.voxel_size
    n_steps = int(scene.diagonal / step) + 2
    return _sun_transmittance_impl(
        scene.beta, scene.voxel_size, jnp.asarray(scene.min_bound),
        jnp.asarray(sun, jnp.float32), float(step), n_steps)


def legacy_sensor_rotation(origin, target, up, sat_zenith_deg: float,
                           sat_azimuth_deg: float):
    """The legacy udi renderer's extra per-sensor rotation
    (render_from_udi_class.py:102-119): ``rotate(axis=[cos az, sin az, 0],
    angle=zenith)`` composed LEFT of the look_at, i.e. the whole camera —
    position and orientation — rotates about the world origin (the cloud
    center). Equivalent look_at inputs: (R·origin, R·target, R·up).
    Returns the rotated (origin, target, up) to feed make_camera_rays.
    The reference's own comment questions this rotation ("why udi add
    this extra rotation") and its current renderer dropped it; provided
    for re-rendering legacy datasets only."""
    az = np.deg2rad(sat_azimuth_deg)
    axis = np.array([np.cos(az), np.sin(az), 0.0], np.float64)
    ang = np.deg2rad(sat_zenith_deg)
    k = axis / np.linalg.norm(axis)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
    rot = lambda v: (R @ np.asarray(v, np.float64)).astype(np.float32)
    return rot(origin), rot(target), rot(up)


@partial(jax.jit, static_argnames=("orders",))
def multiple_scatter_fluence(beta, t_sun, step, albedo: float,
                             irradiance: float, orders: int) -> jax.Array:
    """Scattered fluence from orders 2..``orders`` (successive-order-of-
    scattering), approximating the phase function as isotropic for bounces
    after the first — the standard similarity simplification; the exact
    HG angular structure stays in the single-scatter camera term.

    Each order is one transport sweep of the volumetric source
    S = a·β·E over a 6-direction ordinate set (±x, ±y, ±z). Axis-aligned
    directions make every sweep a ``lax.scan`` recurrence along a grid
    axis — I_i = T_{i+1}·(I_{i+1} + S_{i+1}·Δ), T = exp(−βΔ) — O(V) per
    direction instead of the O(V·n_steps) gather marches a generic
    direction would need. Returns the total multiply-scattered fluence
    E_ms [Z, Y, X]; the camera march adds a·β·E_ms/(4π) per sample.

    Reference behavior being approximated: Mitsuba volpath with
    max_depth=-1, spp 8192 (mitsuba3/render.py:215-218, render_all.py:30).
    """
    trans = jnp.exp(-beta * step)

    def sweep(src, axis, reverse):
        # radiance arriving at each cell from the given axis direction
        s = jnp.moveaxis(src, axis, 0)
        t = jnp.moveaxis(trans, axis, 0)
        if reverse:
            s, t = s[::-1], t[::-1]

        def body(I, xs):
            s_i, t_i = xs
            I = t_i * (I + s_i * step)
            return I, I

        _, out = jax.lax.scan(body, jnp.zeros_like(s[0]), (s, t))
        # out[i] = light leaving slab i toward the NEXT cell; shift so each
        # cell sees what arrives from its neighbor, zero at the boundary
        out = jnp.concatenate([jnp.zeros_like(out[:1]), out[:-1]], axis=0)
        if reverse:
            out = out[::-1]
        return jnp.moveaxis(out, 0, axis)

    E = irradiance * t_sun          # direct-beam fluence at each voxel
    E_ms = jnp.zeros_like(t_sun)
    for _ in range(max(0, orders - 1)):
        src = albedo * beta * E
        E = sum(sweep(src, axis, rev)
                for axis in (0, 1, 2) for rev in (False, True)) / 6.0
        E_ms = E_ms + E
    return E_ms


def fov_from_geometry(sat_zeniths_deg, sat_altitudes_km, cloud_width_m,
                      cloud_top_km: float = 0.0,
                      pad_image: bool = False) -> float:
    """Field of view derived from the constellation geometry — the legacy
    renderer's sizing logic (reference render_from_udi_class.py:85-100 and
    render.py:86-100): either just cover the cloud from the most-nadir
    satellite, or (pad_image) widen so the most-oblique satellite's
    footprint fits. Returns degrees."""
    z = np.asarray(sat_zeniths_deg, np.float64)
    h = np.asarray(sat_altitudes_km, np.float64)
    W_km = cloud_width_m / 1000.0
    i_lim = int(np.argmax(z))
    i_nad = int(np.argmin(z))
    if pad_image:
        theta = np.deg2rad(z[i_lim])
        dz = np.tan(theta) * h[i_lim]
        return float(2 * (-z[i_lim] + np.degrees(
            np.arctan((dz + W_km / 2) / (h[i_lim] - cloud_top_km)))))
    return float(2 * np.degrees(
        np.arctan((W_km / 2) / (h[i_nad] - cloud_top_km))))


@partial(jax.jit, static_argnames=("resolution", "fov", "use_ms",
                                   "m_y", "m_x", "e_y", "e_x", "flip"))
def _render_ortho_impl(beta, t_sun, voxel_size, min_bound, max_bound,
                       origin, target, up, sun_dir, fov, resolution,
                       g, albedo, irradiance, ocean_albedo, e_ms, use_ms,
                       sx, sy, delta, m_y, m_x, e_y, e_x, flip):
    """Near-parallel (orthographic shear-warp) camera render.

    From the reference's satellite distance (~573 km for a ~2.5 km box,
    render.py:104 / the overpass CSV) every film ray is parallel to the
    central ray to within tan(fov/2)·√2 ≈ 0.003 rad, so the whole march
    collapses to the same O(V) shear-warp transform the sun-transmittance
    sweep uses: shear each payload layer once so camera rays are vertical
    columns, composite with one exclusive cumsum along z (the marcher's own
    quadrature: attenuation exp(-τ_before)·src·Δ per layer), then resample
    the composited planes onto the film with ONE bilinear warp — per-pixel
    exact ray directions are kept for the HG phase (constant along each
    ray, so it factors out of the z-sum) and for the ocean/ground term.

    The composite grid is windowed: column (y', x') is the ray crossing
    the volume's central z-plane at grid coords (y'-m_y, x'-m_x); margins
    m cover every ray that intersects the box anywhere (±shear/2), so the
    planes stay [ny+2m_y, nx+2m_x] instead of the full sheared frame.
    ``sx, sy`` are voxels of lateral shift per layer along the central ray
    (d_x/|d_z|, d_y/|d_z|), ``delta`` the path length per layer,
    ``flip`` True when the camera is ABOVE the volume (descending central
    ray, d_z < 0): the payload is z-reversed so composited layer 0 is the
    one nearest the camera either way.
    """
    nz, ny, nx = beta.shape
    H, W = resolution
    k_ref = (nz - 1) / 2.0

    A = albedo * irradiance * t_sun
    chans = [beta, beta * A]
    if use_ms:
        chans.append(beta * (albedo / (4.0 * jnp.pi)) * e_ms)
    P = jnp.stack(chans, axis=-1)                    # [nz, ny, nx, C]
    if flip:
        P = P[::-1]
    C = P.shape[-1]
    W_y, W_x = ny + 2 * m_y, nx + 2 * m_x

    E = jnp.pad(P, ((0, 0), (e_y, e_y), (e_x, e_x), (0, 0)))

    def shear_layer(k, plane):
        # window cell (y', x') at layer k reads world grid
        # (y' - m_y + sy·(k - k_ref), x' - m_x + sx·(k - k_ref))
        oy = e_y - m_y + sy * (k - k_ref)
        ox = e_x - m_x + sx * (k - k_ref)
        iy = jnp.floor(oy)
        ix = jnp.floor(ox)
        fy, fx = oy - iy, ox - ix
        iy = iy.astype(jnp.int32)
        ix = ix.astype(jnp.int32)
        s00 = jax.lax.dynamic_slice(plane, (iy, ix, 0), (W_y, W_x, C))
        s01 = jax.lax.dynamic_slice(plane, (iy, ix + 1, 0), (W_y, W_x, C))
        s10 = jax.lax.dynamic_slice(plane, (iy + 1, ix, 0), (W_y, W_x, C))
        s11 = jax.lax.dynamic_slice(plane, (iy + 1, ix + 1, 0),
                                    (W_y, W_x, C))
        return ((1 - fy) * ((1 - fx) * s00 + fx * s01)
                + fy * ((1 - fx) * s10 + fx * s11))

    ki = jnp.arange(nz, dtype=jnp.float32)
    sb = jax.vmap(shear_layer)(ki, E)                # [nz, W_y, W_x, C]
    b = sb[..., 0]
    tau_incl = delta * jnp.cumsum(b, axis=0)
    wgt = jnp.exp(-(tau_incl - delta * b)) * delta   # exp(-τ_excl)·Δ
    comp = jnp.sum(wgt[..., None] * sb[..., 1:], axis=0)  # [W_y, W_x, C-1]
    planes = jnp.concatenate([comp, tau_incl[-1][..., None]], axis=-1)

    # --- film warp: one bilinear sample per pixel (zero outside) --------
    rays_o, rays_d = make_camera_rays(origin, target, up, fov, resolution)
    ro = rays_o.reshape(-1, 3)
    rd = rays_d.reshape(-1, 3)
    z_c = min_bound[2] + (k_ref + 0.5) * voxel_size  # volume z-center
    dz_safe = jnp.where(jnp.abs(rd[:, 2]) < 1e-9, 1e-9, rd[:, 2])
    t_ref = (z_c - ro[:, 2]) / dz_safe
    q = ro + rd * t_ref[:, None]
    Yc = (q[:, 1] - min_bound[1]) / voxel_size - 0.5 + m_y
    Xc = (q[:, 0] - min_bound[0]) / voxel_size - 0.5 + m_x

    iy = jnp.floor(Yc)
    ix = jnp.floor(Xc)
    fy, fx = Yc - iy, Xc - ix
    iy = iy.astype(jnp.int32)
    ix = ix.astype(jnp.int32)
    pl = jnp.pad(planes, ((0, 1), (0, 1), (0, 0)))

    def tap(dy, dx, w):
        yy, xx = iy + dy, ix + dx
        ok = (yy >= 0) & (yy < W_y) & (xx >= 0) & (xx < W_x)
        yy = jnp.clip(yy, 0, W_y)
        xx = jnp.clip(xx, 0, W_x)
        return jnp.where(ok[:, None], pl[yy, xx], 0.0) * w[:, None]

    samp = (tap(0, 0, (1 - fy) * (1 - fx)) + tap(0, 1, (1 - fy) * fx)
            + tap(1, 0, fy * (1 - fx)) + tap(1, 1, fy * fx))

    cos_theta = jnp.sum(sun_dir * (-rd), axis=-1)
    L = samp[:, 0] * hg_phase(cos_theta, g)          # exact per-ray phase
    if use_ms:
        L = L + samp[:, 1]
    tau = samp[:, -1]

    # Lambertian ocean/ground — identical formula to the march
    # (per-pixel exact intersection; τ along the parallel proxy)
    dzr = rd[:, 2]
    hits_down = dzr < -1e-6
    t_ground = (min_bound[2] - ro[:, 2]) / jnp.where(hits_down, dzr, -1.0)
    gp = ro + rd * t_ground[:, None]
    in_xy = ((gp[:, 0] >= min_bound[0]) & (gp[:, 0] <= max_bound[0])
             & (gp[:, 1] >= min_bound[1]) & (gp[:, 1] <= max_bound[1]))
    gi = ((gp - min_bound) / voxel_size).astype(jnp.int32)
    gxg = jnp.clip(gi[:, 0], 0, nx - 1)
    gyg = jnp.clip(gi[:, 1], 0, ny - 1)
    t_sun_ground = t_sun[0, gyg, gxg]
    cos_sun = jnp.maximum(-sun_dir[2], 0.0)
    L_ground = (ocean_albedo / jnp.pi) * irradiance * cos_sun \
        * t_sun_ground * jnp.exp(-tau)
    L = L + jnp.where(hits_down & in_xy, L_ground, 0.0)
    return L.reshape(H, W)


@partial(jax.jit, static_argnames=("resolution", "n_steps", "fov",
                                   "use_ms"))
def _render_impl(beta, t_sun, voxel_size, min_bound, max_bound, origin,
                 target, up, sun_dir, fov, resolution, step, n_steps,
                 g, albedo, irradiance, ocean_albedo, e_ms, use_ms):
    H, W = resolution
    nz, ny, nx = beta.shape
    rays_o, rays_d = make_camera_rays(origin, target, up, fov, resolution)
    ro = rays_o.reshape(-1, 3)
    rd = rays_d.reshape(-1, 3)

    tmin, tmax = ray_aabb_interval(ro, rd, min_bound, max_bound)

    cos_theta = jnp.sum(sun_dir * (-rd), axis=-1)
    phase = hg_phase(cos_theta, g)

    # ONE fused gather per step instead of 2-3 (ops/gather.py): stack
    # beta with the per-voxel source factors (computed once, O(V)
    # elementwise) so the march reads a single [.., C] payload per sample
    #   src = b * phase * A + B,  A = albedo*irradiance*t_sun,
    #   B = b * albedo * e_ms / 4pi (orders >= 2 in-scatter, zero otherwise)
    A = albedo * irradiance * t_sun
    if use_ms:
        chans = (beta, A, beta * (albedo / (4.0 * jnp.pi)) * e_ms)
    else:
        chans = (beta, A)
    vol = stack_volume(*chans)

    def body(k, carry):
        L, tau = carry
        t = tmin + (k + 0.5) * step
        p = ro + rd * t[:, None]
        gi = (p - min_bound) / voxel_size
        inb = (t < tmax) & jnp.all(
            (gi >= 0) & (gi < jnp.array([nx, ny, nz])), axis=-1)
        gii = gi.astype(jnp.int32)
        gx = jnp.clip(gii[:, 0], 0, nx - 1)
        gy = jnp.clip(gii[:, 1], 0, ny - 1)
        gz = jnp.clip(gii[:, 2], 0, nz - 1)
        vals = jnp.where(inb[:, None], payload_lookup(vol, gz, gy, gx), 0.0)
        b = vals[:, 0]
        # single scattering: exact HG toward the camera
        src = b * phase * vals[:, 1]
        if use_ms:
            # orders >= 2: isotropic in-scatter of the SOS fluence field
            src = src + vals[:, 2]
        L = L + jnp.exp(-tau) * src * step
        tau = tau + b * step
        return (L, tau)

    L0 = jnp.zeros(ro.shape[0])
    tau0 = jnp.zeros(ro.shape[0])
    L, tau = jax.lax.fori_loop(0, n_steps, body, (L0, tau0))

    # Lambertian ocean/ground at z = min_bound[2] (the legacy renderer's
    # ocean cube, render_from_udi_class.py:223-234): rays that exit the
    # bottom pick up sun-lit surface radiance attenuated by both paths.
    dz = rd[:, 2]
    hits_down = dz < -1e-6
    t_ground = (min_bound[2] - ro[:, 2]) / jnp.where(hits_down, dz, -1.0)
    gp = ro + rd * t_ground[:, None]
    in_xy = ((gp[:, 0] >= min_bound[0]) & (gp[:, 0] <= max_bound[0])
             & (gp[:, 1] >= min_bound[1]) & (gp[:, 1] <= max_bound[1]))
    nzi, nyi, nxi = beta.shape
    gi = ((gp - min_bound) / voxel_size).astype(jnp.int32)
    gxg = jnp.clip(gi[:, 0], 0, nxi - 1)
    gyg = jnp.clip(gi[:, 1], 0, nyi - 1)
    t_sun_ground = t_sun[0, gyg, gxg]          # sun transmittance at z=0
    cos_sun = jnp.maximum(-sun_dir[2], 0.0)    # downwelling component
    L_ground = (ocean_albedo / jnp.pi) * irradiance * cos_sun \
        * t_sun_ground * jnp.exp(-tau)
    L = L + jnp.where(hits_down & in_xy, L_ground, 0.0)
    return L.reshape(H, W)


def _ortho_static_params(nz: int, voxel_size: float, origin, target):
    """Host-side static geometry for the shear-warp camera composite:
    (sx, sy) voxels of lateral shift per layer along the central ray,
    delta path length per layer, windowed-plane margins m_* / embed pads
    e_* (bucketed to multiples of 8 to bound recompiles), and flip (True
    when the camera is ABOVE the volume, so the z-reversed layer 0 is
    nearest the camera). Shared by the single-view dispatch
    (``render_radiance``) and the batched SPMD path (render_shard.py),
    whose patches share one camera."""
    d = np.asarray(target, np.float64) - np.asarray(origin, np.float64)
    d = d / np.linalg.norm(d)
    adz = abs(float(d[2]))
    sx = float(d[0] / adz)
    sy = float(d[1] / adz)
    delta = voxel_size / adz

    def bucket8(v: float) -> int:
        return int(-(-(v) // 8) * 8)

    m_y = bucket8(abs(sy) * nz / 2 + 2)
    m_x = bucket8(abs(sx) * nz / 2 + 2)
    e_y = bucket8(m_y + abs(sy) * nz / 2 + 2)
    e_x = bucket8(m_x + abs(sx) * nz / 2 + 2)
    return sx, sy, delta, m_y, m_x, e_y, e_x, bool(d[2] < 0)


def _ortho_eligibility(scene: VolumeScene, origin, target, fov_deg,
                       resolution, user_step) -> Tuple[bool, str]:
    """Can the shear-warp camera path stand in for the march here?
    Returns (eligible, reason-if-not)."""
    if user_step is not None:
        return False, ("explicit step is a quadrature request the ortho "
                       "path cannot honor (fixed one sample per layer)")
    d = np.asarray(target, np.float64) - np.asarray(origin, np.float64)
    d = d / np.linalg.norm(d)
    adz = abs(float(d[2]))
    if adz < 0.45:
        return False, (f"grazing camera (|dir_z|={adz:.3f} < 0.45): shear "
                       "padding outgrows the plane")
    oz = float(np.asarray(origin, np.float64)[2])
    if scene.min_bound[2] < oz < scene.max_bound[2]:
        return False, "camera origin inside the volume's z range"
    H, W = resolution
    nz = scene.beta.shape[0]
    tan_half = math.tan(math.radians(fov_deg * 0.5))
    # max angle between any film ray and the central ray (fov along x,
    # aspect-scaled — make_camera_rays), times the max path offset from
    # the anchoring central plane, in voxels:
    err_vox = tan_half * math.sqrt(1.0 + (W / H) ** 2) * nz / (2.0 * adz)
    if err_vox > 1.0:
        return False, (f"rays not near-parallel: worst-case parallax "
                       f"{err_vox:.2f} voxels > 1 (fov {fov_deg} deg too "
                       "wide for this depth/distance)")
    return True, ""


def render_radiance(scene: VolumeScene, origin, target, up=(1.0, 0.0, 0.0),
                    fov_deg: float = 0.25, resolution=(256, 256),
                    sun_dir=(0.0, 0.0, -1.0), g: float = 0.85,
                    albedo: float = 1.0, irradiance: float = SUN_IRRADIANCE,
                    step: Optional[float] = None,
                    t_sun: Optional[jax.Array] = None,
                    ocean_albedo: float = 0.0,
                    ms_orders: int = 1,
                    e_ms: Optional[jax.Array] = None,
                    camera_method: str = "auto") -> jax.Array:
    """Render one grayscale radiance view [H, W]. Pass a precomputed
    ``t_sun`` (sun_transmittance) to amortize it across views that share a
    timestamp. ``ocean_albedo`` > 0 adds the legacy renderer's Lambertian
    ocean surface (reference reflectance 0.0003,
    render_from_udi_class.py:223-234).

    ``ms_orders`` selects the scattering order: 1 = single scattering
    (default, round-1 behavior); N > 1 adds orders 2..N via
    ``multiple_scatter_fluence`` — an isotropic-phase successive-order
    approximation of the reference's full volpath multiple scattering
    (mitsuba3/render.py:215-218). Pass a precomputed ``e_ms`` to amortize
    it across views sharing a timestamp (like ``t_sun``).

    ``camera_method``: 'ortho' composites with the O(V) shear-warp
    transform (near-parallel rays — the production satellite geometry:
    ~573 km away, fov ~0.3 deg), 'march' is the per-sample ray march,
    'auto' (default) picks ortho whenever the worst-case parallax error
    of the parallel-ray approximation is under one voxel, the camera is
    not grazing/inside the volume, and no explicit ``step`` was requested
    (see ``_ortho_eligibility``); the two agree to the same quadrature
    class as sweep-vs-march sun transmittance
    (tests/test_renderer_alignment.py::test_ortho_matches_march)."""
    if camera_method not in ("auto", "ortho", "march"):
        raise ValueError(f"unknown camera_method {camera_method!r}: "
                         "expected 'auto', 'ortho' or 'march'")
    # keep the caller's step intent: None means "defaults everywhere",
    # which lets sun_transmittance pick the fast shear-warp; an explicit
    # step is a quadrature request and forces the march there too
    user_step = step
    step = step or scene.voxel_size
    sun_dir = jnp.asarray(sun_dir, jnp.float32)
    sun_dir = sun_dir / jnp.linalg.norm(sun_dir)
    if t_sun is None:
        t_sun = sun_transmittance(scene, np.asarray(sun_dir),
                                  step=user_step)
    use_ms = ms_orders > 1 or e_ms is not None
    if use_ms and e_ms is None:
        e_ms = multiple_scatter_fluence(scene.beta, t_sun, float(step),
                                        float(albedo), float(irradiance),
                                        int(ms_orders))
    eligible, why = _ortho_eligibility(scene, origin, target, fov_deg,
                                       tuple(resolution), user_step)
    if camera_method == "ortho" and not eligible:
        raise ValueError(f"camera_method='ortho' not applicable: {why}")
    if camera_method == "auto":
        camera_method = "ortho" if eligible else "march"

    common = (scene.beta, t_sun, scene.voxel_size,
              jnp.asarray(scene.min_bound), jnp.asarray(scene.max_bound),
              jnp.asarray(origin, jnp.float32),
              jnp.asarray(target, jnp.float32),
              jnp.asarray(up, jnp.float32), sun_dir, float(fov_deg),
              tuple(resolution))
    if camera_method == "ortho":
        sx, sy, delta, m_y, m_x, e_y, e_x, flip = _ortho_static_params(
            scene.beta.shape[0], scene.voxel_size, origin, target)
        return _render_ortho_impl(
            *common, float(g), float(albedo), float(irradiance),
            float(ocean_albedo), e_ms if use_ms else scene.beta, use_ms,
            jnp.float32(sx), jnp.float32(sy), jnp.float32(delta),
            m_y, m_x, e_y, e_x, flip)
    n_steps = int(scene.diagonal / step) + 2
    return _render_impl(
        *common, float(step), n_steps, float(g), float(albedo),
        float(irradiance), float(ocean_albedo),
        e_ms if use_ms else scene.beta, use_ms)


def make_synthetic_debug_volume(width: int = 128, depth: int = 200
                                ) -> np.ndarray:
    """The geometry-debug volume (reference mitsuba3/debug.py:56-92): sphere
    + cube + pyramid + faint border frame, so orientation/axis bugs are
    visually obvious. Returns [Z, Y, X] (our grid layout)."""
    x, y, z = np.indices((width, width, depth))
    cx, cy, cz = width // 2, width // 2, depth // 2
    vol = np.zeros((width, width, depth), np.float32)
    sphere = ((x - (cx - 40)) ** 2 + (y - cy) ** 2 + (z - cz) ** 2) <= 20 ** 2
    vol[sphere] = 0.02
    vol[cx - 15:cx + 15, cy - 15:cy + 15, cz - 15:cz + 15] = 0.2
    pyr_cx, pyr_h, pyr_base = cx + 40, 40, cz - 15
    h = z - pyr_base
    half = 40 * (1.0 - h / pyr_h) / 2
    pyr = ((z >= pyr_base) & (z < pyr_base + pyr_h)
           & (np.abs(x - pyr_cx) <= half) & (np.abs(y - cy) <= half))
    vol[pyr] = 0.02
    border = ((x < 2) | (x >= width - 2) | (y < 2) | (y >= width - 2)
              | (z < 2) | (z >= depth - 2))
    vol[border] = 0.005
    return np.transpose(vol, (2, 1, 0)).copy()  # [X,Y,Z] → [Z,Y,X]
