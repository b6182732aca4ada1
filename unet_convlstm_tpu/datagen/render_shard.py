"""Data-parallel stage B — batched, mesh-sharded radiance rendering.

The reference renders one patch at a time on one GPU (render_all.py:146-199
— a serial folder loop around Mitsuba). Here the whole batch axis is a
jax.sharding axis instead: every patch in a chunk shares its timestamp's
cameras and sun (the cyclic CSV assignment is per FOLDER, render_all.py:89-92,
and all samples of a folder share one time), so the per-view static geometry
(shear params, window margins, march step counts) is resolved once on the
host and the chunk runs as ONE SPMD program — ``vmap`` over the patch axis,
partitioned across the mesh's data axis by XLA. Rendering is embarrassingly
parallel: there are zero collectives in the hot path; the only cross-device
traffic is the host gather of the finished images.

Numerics are the single-view path's own jitted kernels (`_render_ortho_impl`
/ `_render_impl` / the transmittance sweep) traced under ``vmap`` — the
batched result matches per-patch ``render_radiance`` calls to float
round-off (tests/test_render_shard.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .renderer import (SUN_IRRADIANCE, VolumeScene, _ortho_eligibility,
                       _ortho_static_params, _render_impl,
                       _render_ortho_impl, _sun_transmittance_impl,
                       _sun_transmittance_shear_impl, _sweep_eligible,
                       _sweep_static_params, multiple_scatter_fluence)


def pad_and_shard(arrays, mesh: Optional[Mesh]):
    """Zero-pad each array's leading (patch) axis to a multiple of the
    mesh's first-axis size and device_put with that axis sharded.
    Returns (arrays, pad_b); no-op (pad_b=0) when mesh is None. Shared by
    the stage-B (here) and stage-C (velocity_maps.py) batched drivers."""
    if mesh is None:
        return list(arrays), 0
    axis = mesh.axis_names[0]
    n = int(mesh.shape[axis])
    pad_b = (-arrays[0].shape[0]) % n
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    out = []
    for a in arrays:
        if pad_b:
            a = jnp.concatenate(
                [a, jnp.zeros((pad_b,) + a.shape[1:], a.dtype)], axis=0)
        out.append(jax.device_put(a, sharding))
    return out, pad_b


def render_views_batch(beta_batch, views: Sequence[Tuple], sun_dir,
                       *, voxel_size: float = 20.0, z_offset: float = 0.0,
                       fov_deg: float = 0.115,
                       resolution: Tuple[int, int] = (256, 256),
                       g: float = 0.85, albedo: float = 1.0,
                       irradiance: float = SUN_IRRADIANCE,
                       ocean_albedo: float = 0.0, ms_orders: int = 1,
                       camera_method: str = "auto",
                       mc_spp: int = 0, mc_max_depth: int = 64,
                       mc_seeds=None,
                       mc_max_events: Optional[int] = None,
                       mc_majorant_cell: int = 0,
                       mc_spp_chunk: int = 0,
                       mesh: Optional[Mesh] = None) -> np.ndarray:
    """Render ``views`` of every volume in ``beta_batch`` → [B, V, H, W].

    ``beta_batch``: [B, nz, ny, nx] extinction volumes sharing one world
    geometry (voxel size / z offset) and one sun — the stage-B driver's
    per-folder contract. ``views``: sequence of (origin, target, up) in
    meters. ``mesh``: optional jax.sharding.Mesh — the batch axis is
    sharded over its first axis (B is zero-padded up to a multiple of the
    axis size; padding is dropped from the result). Camera-method
    dispatch per view matches ``render_radiance(camera_method='auto')``.

    ``mc_spp`` > 0 uses Monte-Carlo transport (mc_reference.py) instead
    of the deterministic kernels — the whole chunk path-traces as one
    vmapped SPMD program. ``mc_seeds`` [B, V] int32 is then required
    (per-patch-per-view seeds); ``mc_max_events`` bounds the lockstep
    delta-tracking loop (default: chunk-conservative, the max of the
    per-patch serial bounds — a safety net that rarely binds, so batched
    renders equal per-patch ``mc_radiance`` calls with the same seeds).
    ``mc_majorant_cell`` > 0 enables the super-voxel majorant grid
    (mc_reference.py); it changes the sampled RNG sequence, so serial
    and batched runs must use the same value — the driver plumbs one
    knob to both paths. ``mc_spp_chunk`` > 0 splits each view's spp
    scan into ≤-that-size dispatches (same keys, same realization —
    only float summation order changes) to bound single-kernel device
    time: one vmapped path-tracing program over a whole chunk at full
    spp can run minutes of device time and trip TPU watchdog limits.
    """
    if camera_method not in ("auto", "ortho", "march"):
        raise ValueError(f"unknown camera_method {camera_method!r}: "
                         "expected 'auto', 'ortho' or 'march'")
    beta_batch = jnp.asarray(beta_batch, jnp.float32)
    if beta_batch.ndim != 4:
        raise ValueError(f"beta_batch must be [B, nz, ny, nx], got "
                         f"{beta_batch.shape}")
    B = beta_batch.shape[0]
    geom = VolumeScene(beta_batch[0], voxel_size, z_offset)  # shape/bounds
    sun = np.asarray(sun_dir, np.float32)
    sun = sun / np.linalg.norm(sun)

    if mc_spp > 0:
        if ms_orders > 1:
            raise ValueError("mc_spp renders full multiple scattering "
                             "already; ms_orders > 1 is deterministic-only")
        if ocean_albedo != 0.0:
            raise ValueError("ocean_albedo is deterministic-only: the MC "
                             "path tracer has no ocean-surface term — it "
                             "would be silently dropped")
        if camera_method != "auto":
            raise ValueError("camera_method applies to the deterministic "
                             "renderer; the MC path traces camera rays "
                             "directly (no ortho composite exists)")
        if mc_seeds is None:
            raise ValueError("mc_seeds [B, V] is required with mc_spp")
        mc_seeds = jnp.asarray(mc_seeds, jnp.int32)
        if mc_seeds.shape != (B, len(views)):
            raise ValueError(f"mc_seeds must be [B={B}, V={len(views)}], "
                             f"got {mc_seeds.shape}")
        if mc_max_events is None:
            from .mc_reference import default_max_events
            bmax = float(np.max(np.asarray(beta_batch)))
            mc_max_events = default_max_events(
                bmax, geom.diagonal, float(voxel_size), mc_majorant_cell)
        (beta_batch, mc_seeds), pad_b = pad_and_shard(
            [beta_batch, mc_seeds], mesh)
    else:
        (beta_batch,), pad_b = pad_and_shard([beta_batch], mesh)

    # --- shared per-chunk volumes: t_sun (+ e_ms), one vmapped program ---
    toward = -sun
    if _sweep_eligible(toward):
        flip, sx, sy, delta, pad = _sweep_static_params(
            geom.beta.shape[0], voxel_size, toward)
        src = beta_batch[:, ::-1] if flip else beta_batch
        t_sun = jax.vmap(lambda b: _sun_transmittance_shear_impl(
            b, jnp.float32(sx), jnp.float32(sy), jnp.float32(delta),
            pad))(src)
        if flip:
            t_sun = t_sun[:, ::-1]
    else:  # grazing sun: per-voxel march (render_radiance's own fallback)
        n_steps = int(geom.diagonal / voxel_size) + 2
        t_sun = jax.vmap(lambda b: _sun_transmittance_impl(
            b, voxel_size, jnp.asarray(geom.min_bound),
            jnp.asarray(sun, jnp.float32), float(voxel_size),
            n_steps))(beta_batch)

    use_ms = ms_orders > 1
    if use_ms:
        e_ms = jax.vmap(lambda b, t: multiple_scatter_fluence(
            b, t, float(voxel_size), float(albedo), float(irradiance),
            int(ms_orders)))(beta_batch, t_sun)
    else:
        e_ms = beta_batch  # placeholder, ignored when use_ms=False

    # --- per-view render, vmapped over the patch axis ------------------
    res = tuple(resolution)
    min_b = jnp.asarray(geom.min_bound)
    max_b = jnp.asarray(geom.max_bound)
    out = []
    for vi, (origin, target, up) in enumerate(views):
        if mc_spp > 0:
            from .mc_reference import _mc_radiance_impl
            # [B, spp, 2]: per-patch key rounds, split ONCE from each
            # patch's seed — chunked dispatches scan slices of the same
            # array, so the realization matches the serial driver's
            # regardless of mc_spp_chunk
            keys_v = jax.vmap(lambda s: jax.random.split(
                jax.random.PRNGKey(s), int(mc_spp)))(mc_seeds[:, vi])
            f = jax.vmap(lambda b, t, k: _mc_radiance_impl(
                b, t, voxel_size, min_b, max_b,
                jnp.asarray(origin, jnp.float32),
                jnp.asarray(target, jnp.float32),
                jnp.asarray(up, jnp.float32),
                jnp.asarray(sun, jnp.float32), float(fov_deg), res,
                float(g), float(albedo), float(irradiance), k,
                int(mc_max_depth), int(mc_max_events),
                int(mc_majorant_cell)))
            from .mc_reference import chunked_mc_sum
            img = chunked_mc_sum(
                lambda c, n: f(beta_batch, t_sun, keys_v[:, c:c + n]),
                int(mc_spp), int(mc_spp_chunk))
            out.append(img / mc_spp)
            continue
        eligible, why = _ortho_eligibility(geom, origin, target, fov_deg,
                                           res, None)
        if camera_method == "ortho" and not eligible:
            raise ValueError(
                f"camera_method='ortho' not applicable: {why}")
        method = camera_method
        if method == "auto":
            method = "ortho" if eligible else "march"
        common = (voxel_size, min_b, max_b,
                  jnp.asarray(origin, jnp.float32),
                  jnp.asarray(target, jnp.float32),
                  jnp.asarray(up, jnp.float32),
                  jnp.asarray(sun, jnp.float32), float(fov_deg), res)
        if method == "ortho":
            osx, osy, odelta, m_y, m_x, e_y, e_x, flip = \
                _ortho_static_params(geom.beta.shape[0], voxel_size,
                                     origin, target)
            img = jax.vmap(lambda b, t, e: _render_ortho_impl(
                b, t, *common, float(g), float(albedo), float(irradiance),
                float(ocean_albedo), e, use_ms, jnp.float32(osx),
                jnp.float32(osy), jnp.float32(odelta), m_y, m_x, e_y, e_x,
                flip))(beta_batch, t_sun, e_ms)
        else:
            n_steps = int(geom.diagonal / voxel_size) + 2
            img = jax.vmap(lambda b, t, e: _render_impl(
                b, t, *common, float(voxel_size), n_steps, float(g),
                float(albedo), float(irradiance), float(ocean_albedo),
                e, use_ms))(beta_batch, t_sun, e_ms)
        out.append(img)
    stacked = jnp.stack(out, axis=1)                 # [B(+pad), V, H, W]
    result = np.asarray(stacked)
    return result[:B] if pad_b else result
