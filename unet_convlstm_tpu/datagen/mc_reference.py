"""Monte-Carlo volumetric path tracer — the in-repo radiance oracle.

The reference's stage-B renders come from Mitsuba 3 ``volpath`` (max_depth
-1, spp 8192 — /root/reference/mitsuba3/render.py:215-218,
render_all.py:28-30): unbiased multiple-scattering Monte Carlo on CUDA.
This module is its TPU-native counterpart: a vectorized path tracer used
to VALIDATE the fast deterministic renderer (renderer.py) — it bounds the
single-scatter / successive-orders domain gap with an unbiased estimate
instead of an order-convergence argument, and it gives users who need
Monte-Carlo renders a JAX path to them (complementing the ``.vol`` interop
for exact-Mitsuba workflows off-TPU).

Physics identical to the deterministic model's contract (renderer.py
docstring): heterogeneous extinction β in an AABB, single-lobe
Henyey–Greenstein phase ``g``, scattering albedo ``a``, directional sun
with irradiance E. Estimator:

* **Free flight** by delta tracking (Woodcock) under the global majorant
  β_max: sample t ~ Exp(β_max), accept a real collision with probability
  β(x)/β_max, else null-collide and continue — unbiased for the same
  nearest-voxel β field the deterministic march reads.
* **Next-event estimation** at every real collision: the sun is a delta
  (directional) emitter, so NEE is the complete estimator — phase-sampled
  continuation rays can never hit it. The sun transmittance factor reuses
  ``sun_transmittance``'s per-voxel volume (the deterministic path's own
  machinery), so the two renderers differ ONLY in how they transport
  camera-side light, which is exactly the quantity under test.
* **Continuation** by exact HG inverse-CDF direction sampling around the
  current direction; path weight ×= a per bounce; paths end on AABB escape,
  ``max_depth`` real collisions, or the ``max_events`` lockstep bound.

TPU-native shape: ALL camera rays advance in lockstep — one
``lax.while_loop`` whose state is [N]-vectors (position, direction, weight,
accumulated radiance, RNG key), with inactive lanes masked; there is no
per-ray control flow. spp is accumulated by ``lax.scan`` over sample
rounds (memory stays O(H·W), not O(H·W·spp)).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import payload_lookup, stack_volume
from .renderer import (SUN_IRRADIANCE, VolumeScene, hg_phase,
                       make_camera_rays, multiple_scatter_fluence,
                       ray_aabb_interval, render_radiance,
                       sun_transmittance)


def mc_view_seed(mc_seed: int, folder_idx: int, n: int, sat: int) -> int:
    """Deterministic per-(folder, patch, view) MC seed — THE dataset
    reproducibility contract for ``gen-renders --mc-spp`` (a re-run
    reproduces every pkl byte-for-byte). The serial and batched stage-B
    drivers both call this one helper so their realizations can never
    drift apart (tests/test_mc_reference.py::test_mc_batched_equals_serial)."""
    return (mc_seed * 1000003 + folder_idx * 8191 + n * 131 + sat) \
        & 0x7FFFFFFF


def _sample_hg(key, d, g: float):
    """Exact HG inverse-CDF direction sample about unit direction d [N,3]."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, d.shape[:1])
    u2 = jax.random.uniform(k2, d.shape[:1])
    return hg_from_uniforms(u1, u2, d, g)


def hg_from_uniforms(u1, u2, d, g: float):
    """HG direction from explicit uniforms (shared with the Pallas fused
    sampler's parity tests, ops/pallas/mc_sampler.py)."""
    if abs(g) < 1e-3:
        cos_t = 1.0 - 2.0 * u1                    # isotropic limit
    else:
        s = (1.0 - g * g) / (1.0 + g - 2.0 * g * u1)
        cos_t = (1.0 + g * g - s * s) / (2.0 * g)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    # orthonormal frame around d (branchless Duff et al. construction)
    sign = jnp.where(d[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + d[:, 2])
    b = d[:, 0] * d[:, 1] * a
    t1 = jnp.stack([1.0 + sign * d[:, 0] ** 2 * a, sign * b,
                    -sign * d[:, 0]], axis=-1)
    t2 = jnp.stack([b, sign + d[:, 1] ** 2 * a, -d[:, 1]], axis=-1)
    new_d = (sin_t * jnp.cos(phi))[:, None] * t1 \
        + (sin_t * jnp.sin(phi))[:, None] * t2 + cos_t[:, None] * d
    return new_d / jnp.linalg.norm(new_d, axis=-1, keepdims=True)


DEFAULT_MAJORANT_CELL = 16  # super-voxel edge length (voxels)


@partial(jax.jit, static_argnames=("resolution", "fov", "g",
                                   "max_depth", "majorant_cell",
                                   "use_pallas_sampler"))
def _mc_radiance_impl(beta, t_sun, voxel_size, min_bound, max_bound,
                      origin, target, up, sun_dir, fov, resolution,
                      g, albedo, irradiance, keys, max_depth,
                      max_events, majorant_cell=0,
                      use_pallas_sampler=False):
    # ``keys`` is [spp, 2] — one PRNG key per sample round (the CALLER
    # splits, so a chunked dispatch scanning a slice of the same key
    # array samples the identical realization as one monolithic
    # dispatch). Returns the SUM over rounds [spp, H·W]→[H, W]; callers
    # divide by the total spp.
    #
    # NB: max_events is a TRACED operand (it only feeds the while_loop
    # condition) — it is derived per patch from beta_max, and making it
    # static would recompile this whole tracer for nearly every patch in
    # a gen-renders --mc-spp sweep.
    H, W = resolution
    nz, ny, nx = beta.shape
    beta_max = jnp.maximum(jnp.max(beta), 1e-12)
    toward_sun = -sun_dir

    # super-voxel majorant grid: track-length-capped delta tracking under
    # each macro cell's LOCAL majorant (max-pooled β) instead of the global
    # one — a ray crosses an empty macro cell in ONE lockstep iteration
    # (closed-form exit distance) rather than ~cell/mfp null collisions,
    # and in-cloud flights use the tighter local bound. Unbiased as long
    # as the cell majorant dominates every β the flight can sample before
    # the exit cap, which max-pooling guarantees for the nearest-voxel
    # field. (The reference's Mitsuba volpath gets the same effect from
    # its native majorant supergrid.)
    if majorant_cell > 0:
        c = int(majorant_cell)
        pz, py, px = (-nz) % c, (-ny) % c, (-nx) % c
        bpad = jnp.pad(beta, ((0, pz), (0, py), (0, px)))
        macro = bpad.reshape((nz + pz) // c, c, (ny + py) // c, c,
                             (nx + px) // c, c).max(axis=(1, 3, 5))
        mz, my, mx = macro.shape
        cell_m = c * voxel_size

    rays_o, rays_d = make_camera_rays(origin, target, up, fov, resolution)
    ro = rays_o.reshape(-1, 3)
    rd = rays_d.reshape(-1, 3)
    N = ro.shape[0]

    # start each path at its AABB entry point (delta tracking inside only);
    # same slab helper as the deterministic march — identical entry geometry
    tmin, tmax = ray_aabb_interval(ro, rd, min_bound, max_bound)
    hits_box = tmax > tmin
    p_entry = ro + rd * (tmin[:, None] + 1e-4)

    # β and t_sun are read at the SAME position every iteration, so they
    # ride ONE stacked-payload gather instead of two full-volume gathers
    # — gather cost is issue-rate-bound on the address stream, not
    # payload bytes (ops/gather.py has the measured rule); values (and
    # therefore the sampled realization) are bit-identical.
    vol_bt = stack_volume(beta, t_sun)

    def lookup_bt(p):
        gi = ((p - min_bound) / voxel_size).astype(jnp.int32)
        gx = jnp.clip(gi[:, 0], 0, nx - 1)
        gy = jnp.clip(gi[:, 1], 0, ny - 1)
        gz = jnp.clip(gi[:, 2], 0, nz - 1)
        return payload_lookup(vol_bt, gz, gy, gx)  # [N, 2] = (β, t_sun)

    inside = lambda p: jnp.all((p >= min_bound) & (p <= max_bound), axis=1)

    def one_sample(carry, sample_key):
        acc = carry
        # per-sample seed for the Pallas hardware-PRNG sampler: fold the
        # threefry key words; per-iteration seeds advance by a Weyl odd
        # constant inside body
        kd = sample_key
        if jnp.issubdtype(getattr(sample_key, "dtype", None),
                          jax.dtypes.prng_key):
            kd = jax.random.key_data(sample_key)  # typed key (rng_impl)
        kb = jax.lax.bitcast_convert_type(kd, jnp.int32).ravel()
        base_seed = kb[0] ^ (kb[-1] * jnp.int32(2654435761 - (1 << 32)))

        def body(state):
            i, k, pos, d, w, depth, active, L = state
            if not use_pallas_sampler:
                k, k1, k2, k3 = jax.random.split(k, 4)
                u1 = jax.random.uniform(k1, (N,))
            if majorant_cell > 0:
                # Exit distances are computed ENTIRELY in index space:
                # ``floor`` is exact against the computed quotient u, so the
                # per-axis distance frac·cell_m is non-negative by
                # construction. (Mixing floor(u) with a world-space
                # cell_lo = min_bound + ci·cell_m is NOT safe: the two
                # roundings can disagree by one ulp, yielding a negative
                # crossing time that clamps to an ε-advance below the
                # float32 ulp of |pos| — a permanently stuck lane that
                # defeats the while_loop's early exit.) A position exactly
                # on a face with the direction pointing down that axis
                # belongs to the receiving cell (DDA convention), which
                # also covers rays entering at the box max face.
                u = (pos - min_bound) / cell_m
                ci = jnp.floor(u)
                ci = ci - ((u == ci) & (d < 0))
                m = macro[jnp.clip(ci[:, 2].astype(jnp.int32), 0, mz - 1),
                          jnp.clip(ci[:, 1].astype(jnp.int32), 0, my - 1),
                          jnp.clip(ci[:, 0].astype(jnp.int32), 0, mx - 1)]
                frac = u - ci                      # in [0, 1]
                dist = jnp.where(d > 0, 1.0 - frac, frac) * cell_m
                t_axis = jnp.where(jnp.abs(d) < 1e-9, jnp.inf,
                                   dist / jnp.abs(d))
                t_exit = jnp.min(t_axis, axis=1)
            else:
                m = jnp.full((N,), beta_max)
                t_exit = jnp.full((N,), jnp.inf)

            if use_pallas_sampler:
                # ONE fused VMEM pass: hardware PRNG + flight + HG frame
                # (ops/pallas/mc_sampler.py); replaces the threefry chain
                # and _sample_hg below. Different (still unbiased) RNG
                # realization — opt-in knob.
                from ..ops.pallas.mc_sampler import sample_flights
                seed_i = base_seed + i * jnp.int32(-1640531527)
                t_flight, u_acc, new_d = sample_flights(seed_i, d, m, g=g)
            else:
                t_flight = -jnp.log(1.0 - u1) / jnp.maximum(m, 1e-12)

            if majorant_cell > 0:
                # Classify against the TRUE exit distance; only crossings
                # advance the extra ε past the face. A "not crossed"
                # flight therefore lands strictly inside the cell whose
                # majorant m it is rejection-tested against — testing a
                # position already in the NEXT cell against this cell's m
                # would overcount collisions wherever the neighbor is
                # denser. The ε (progress guarantee at faces, where
                # t_exit can round to 0) skips ≤ m·10⁻³·voxel of optical
                # depth per crossing — bias bounded by ε, crossings only.
                crossed = t_flight >= t_exit
                t = jnp.where(crossed, t_exit + 1e-3 * voxel_size,
                              t_flight)
            else:
                crossed = jnp.zeros((N,), bool)
                t = t_flight
            pos = pos + d * t[:, None]
            in_box = inside(pos)
            bt = lookup_bt(pos)
            b_here = bt[:, 0]
            if not use_pallas_sampler:
                u_acc = jax.random.uniform(k2, (N,))
            real = ~crossed & ((u_acc * m) < b_here)
            ev = active & in_box & real

            # NEE to the directional sun at every real collision
            cos_sun = jnp.sum(d * toward_sun, axis=-1)
            contrib = albedo * hg_phase(cos_sun, g) \
                * bt[:, 1] * irradiance
            L = L + jnp.where(ev, w * contrib, 0.0)

            # continue with HG-sampled direction, weight *= albedo
            if not use_pallas_sampler:
                new_d = _sample_hg(k3, d, g)
            d = jnp.where(ev[:, None], new_d, d)
            w = jnp.where(ev, w * albedo, w)
            depth = depth + ev.astype(jnp.int32)
            active = active & in_box & (depth < max_depth)
            return (i + 1, k, pos, d, w, depth, active, L)

        def cond(state):
            i = state[0]
            return (i < max_events) & jnp.any(state[6])

        L0 = jnp.zeros(N)
        state = (jnp.int32(0), sample_key, p_entry, rd, jnp.ones(N),
                 jnp.zeros(N, jnp.int32), hits_box, L0)
        L = jax.lax.while_loop(cond, body, state)[7]
        return acc + L, None

    total, _ = jax.lax.scan(one_sample, jnp.zeros(N), keys)
    return total.reshape(H, W)


def chunked_mc_sum(run, spp: int, chunk: int):
    """Accumulate ``run(start, size)`` partial sums over ``spp`` sample
    rounds in dispatches of ≈``chunk`` rounds (0 = one dispatch). THE
    chunking contract, shared by the serial (mc_radiance) and batched
    (render_shard.render_views_batch) paths: the caller's pre-split key
    array is consumed in the same order regardless of chunking, so the
    sampled realization is identical — only the final float summation
    associates differently. Chunk sizes are balanced (sizes differ by at
    most 1), so the jitted tracer compiles for at most TWO distinct key
    shapes per run — often one (e.g. spp 12, chunk 8 → 6+6, not 8+4) —
    instead of a fresh remainder shape."""
    spp = int(spp)
    chunk = int(chunk) or spp
    n = -(-spp // chunk)
    base, extra = divmod(spp, n)
    total, c = None, 0
    for i in range(n):
        size = base + (1 if i < extra else 0)
        part = run(c, size)
        c += size
        total = part if total is None else total + part
    return total


def default_max_events(beta_max: float, diagonal: float,
                       voxel_size: float,
                       majorant_cell: int = 0) -> int:
    """Safety bound on lockstep delta-tracking iterations (the while_loop
    exits early once every path terminates; this only caps pathologies).
    Base term: flights to cross the box diagonal at the global majorant's
    mean free path, ×8 for null collisions and multi-bounce, ≥ 64. With a
    super-voxel majorant grid each empty macro cell costs one iteration,
    so add ×8 the cells-per-diagonal for multi-bounce re-crossings."""
    beta_max = max(float(beta_max), 1e-12)
    events = max(64, int(8 * diagonal * beta_max) + 16)
    if majorant_cell > 0:
        cell_m = max(float(majorant_cell) * float(voxel_size), 1e-12)
        events += 8 * int(np.ceil(diagonal / cell_m)) + 16
    return events


def mc_radiance(scene: VolumeScene, origin, target, up=(1.0, 0.0, 0.0),
                fov_deg: float = 0.25, resolution=(256, 256),
                sun_dir=(0.0, 0.0, -1.0), g: float = 0.85,
                albedo: float = 1.0, irradiance: float = SUN_IRRADIANCE,
                spp: int = 64, max_depth: int = 64,
                t_sun: Optional[jax.Array] = None,
                seed: int = 0,
                max_events: Optional[int] = None,
                majorant_cell: Optional[int] = None,
                spp_chunk: int = 0,
                use_pallas_sampler: bool = False,
                rng_impl: str = "threefry") -> jax.Array:
    """Monte-Carlo radiance view [H, W] — the unbiased counterpart of
    ``render_radiance`` (camera-side transport by delta-tracked path
    tracing instead of deterministic quadrature; same β field, same HG
    phase, same sun-transmittance NEE factor). ``max_depth=1`` estimates
    exactly the deterministic single-scatter integral — the parity anchor
    (tests/test_mc_reference.py). The reference analog is volpath spp 8192
    (mitsuba3/render_all.py:28-30); noise falls as 1/√spp. ``max_events``
    bounds the lockstep delta-tracking loop (default: enough flights to
    cross the box diagonal at the majorant's mean free path, ×8 for null
    collisions and multi-bounce, ≥ 64, plus macro-cell crossings).
    ``majorant_cell`` > 0 enables the super-voxel majorant grid (capped
    delta tracking, see ``_mc_radiance_impl``) — same distribution,
    far fewer lockstep iterations on dense-compact volumes; 0 forces
    plain global-majorant tracking. Default ``None`` auto-selects: the
    grid pays off only when crossing the box at the global majorant's
    mean free path costs many null collisions (β_max·diagonal large);
    on broad smooth volumes the lockstep iteration count is set by the
    deepest-scattering lanes, which the grid cannot shorten, so its
    per-iteration overhead is pure loss. Measured at the production
    patch geometry: dense cumulus (β_max 0.15) 2.5× faster with the
    grid, broad blob (β_max 0.01) 15% slower (docs/RENDERER.md).
    ``spp_chunk`` > 0 splits the spp scan into ≤-that-size dispatches —
    the SAME per-round keys are consumed in the same order, so the
    sampled realization is identical to one monolithic dispatch (only
    the final float summation associates differently); use it to bound
    single-kernel device time (long lockstep programs can trip TPU
    watchdog limits at production geometry). 0 = one dispatch.
    ``use_pallas_sampler`` replaces the per-iteration threefry chain +
    HG construction with the fused hardware-PRNG Pallas kernel
    (ops/pallas/mc_sampler.py) — TPU only; a different (still unbiased)
    RNG realization, so renders shift within their own 1/√spp noise.
    ``rng_impl`` selects the XLA-level PRNG for the threefry chain path:
    "threefry" (default — bit-stable with all recorded artifacts) or
    "rbg" (RngBitGenerator HLO, hardware-backed on TPU; measured by
    scripts/perf/bench_mc_breakdown.py). Like the Pallas sampler, a
    different unbiased realization of the same estimator."""
    sun = jnp.asarray(sun_dir, jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    if t_sun is None:
        t_sun = sun_transmittance(scene, np.asarray(sun))
    if majorant_cell is None or max_events is None:
        # one device->host pull of beta, shared by both derivations
        # (callers looping views over one patch should pass max_events
        # themselves — render_batch does)
        beta_max = float(np.max(np.asarray(scene.beta)))
    if majorant_cell is None:
        majorant_cell = (DEFAULT_MAJORANT_CELL
                         if beta_max * scene.diagonal >= 128.0 else 0)
    if max_events is None:
        max_events = default_max_events(
            beta_max, scene.diagonal, float(scene.voxel_size),
            majorant_cell)
    if rng_impl == "threefry":
        # raw uint32[2] keys — bit-stable with every recorded artifact
        keys = jax.random.split(jax.random.PRNGKey(seed), int(spp))
    else:
        keys = jax.random.split(jax.random.key(seed, impl=rng_impl),
                                int(spp))
    args = (scene.beta, t_sun, scene.voxel_size,
            jnp.asarray(scene.min_bound), jnp.asarray(scene.max_bound),
            jnp.asarray(origin, jnp.float32),
            jnp.asarray(target, jnp.float32),
            jnp.asarray(up, jnp.float32), sun, float(fov_deg),
            tuple(resolution), float(g), float(albedo), float(irradiance))
    tail = (int(max_depth), int(max_events), int(majorant_cell),
            bool(use_pallas_sampler))
    total = chunked_mc_sum(
        lambda c, n: _mc_radiance_impl(*args, keys[c:c + n], *tail),
        int(spp), int(spp_chunk))
    return total / spp


def calibrate_ms_scale(scene: VolumeScene, origin, target,
                       up=(1.0, 0.0, 0.0), fov_deg: float = 0.25,
                       resolution=(256, 256), sun_dir=(0.0, 0.0, -1.0),
                       g: float = 0.85, albedo: float = 1.0,
                       irradiance: float = SUN_IRRADIANCE,
                       ms_orders: int = 4, spp: int = 64,
                       max_depth: int = 64,
                       t_sun: Optional[jax.Array] = None,
                       e_ms: Optional[jax.Array] = None,
                       seed: int = 0) -> Tuple[float, dict]:
    """Fit the scalar s that makes the SOS render's mean radiance match
    the unbiased MC estimate for this (scene, camera, sun) — the
    "calibrate a per-config scale for the SOS term" recipe from
    docs/RENDERER.md's domain-gap table.

    The diffuse term is exactly linear in the fluence volume
    (source = β·a/4π·e_ms, renderer.py), so rendering with ``e_ms * s``
    scales the orders ≥ 2 contribution by exactly s; by construction the
    calibrated view's mean equals the MC mean (up to float round-off),
    and the result stays noise-free and deterministic — only the energy
    of the isotropic-phase approximation is corrected, not its structure.

    Returns ``(s, diag)`` where diag holds the fitted means
    (``mean_ss``, ``mean_sos``, ``mean_mc``). s is clipped to ≥ 0; if the
    SOS term contributes nothing (clear scene) s = 1.0 (no-op).
    """
    sun = np.asarray(sun_dir, np.float32)
    sun = sun / np.linalg.norm(sun)
    if t_sun is None:
        t_sun = sun_transmittance(scene, sun)
    if e_ms is None:
        e_ms = multiple_scatter_fluence(scene.beta, t_sun,
                                        float(scene.voxel_size),
                                        float(albedo), float(irradiance),
                                        int(ms_orders))
    kw = dict(origin=origin, target=target, up=up, fov_deg=fov_deg,
              resolution=resolution, sun_dir=sun, g=g, albedo=albedo,
              irradiance=irradiance, t_sun=t_sun)
    mean_ss = float(jnp.mean(render_radiance(scene, **kw)))
    mean_sos = float(jnp.mean(render_radiance(scene, **kw, e_ms=e_ms)))
    mean_mc = float(jnp.mean(mc_radiance(
        scene, origin, target, up, fov_deg, resolution, sun, g=g,
        albedo=albedo, irradiance=irradiance, spp=spp,
        max_depth=max_depth, t_sun=t_sun, seed=seed)))
    ms_part = mean_sos - mean_ss
    if ms_part <= 1e-12 * max(mean_sos, 1e-30):
        s = 1.0
    else:
        s = max(0.0, (mean_mc - mean_ss) / ms_part)
    return s, {"mean_ss": mean_ss, "mean_sos": mean_sos,
               "mean_mc": mean_mc}
