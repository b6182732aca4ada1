"""Velocity-map ray casting — jit/vmapped JAX, runs on TPU.

Capability parity with reference ``preprocessing/build_W_map.py:27-244``
(CloudRayCaster), re-designed for XLA:

* ``make_rays``       — pinhole rays from camera position / look-at / fov
                        with the reference's camera basis (world_up =
                        [-1, 0, 0], build_W_map.py:61-92).
* ``first_hit_maps``  — AABB slab test + fixed-step ray march (step 20 m),
                        first voxel with β>0, gather U/V/W there; NaN for
                        misses (build_W_map.py:94-171).
* ``z_slice_maps``    — intersect a fixed reference plane (default z=750 m)
                        to cancel parallax shift, then force-sample the
                        requested z height (build_W_map.py:173-244).

XLA re-design notes: the reference masks rays that hit the box and marches a
dynamically-sized step grid (host numpy). Here every ray marches a static
``max_steps`` grid (volume diagonal / step), misses masked arithmetically —
static shapes, one fused gather kernel, differentiable-friendly. Voxel
lookup is nearest (truncation), matching the reference's ``astype(int)``.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import payload_lookup, stack_volume


@dataclasses.dataclass
class VolumeGrid:
    """Volumes are [Z, Y, X] (reference pkl layout); world box is centered
    in x/y with z starting at 0 (build_W_map.py:50-53)."""
    beta: jax.Array
    u: jax.Array
    v: jax.Array
    w: jax.Array
    voxel_size: float = 20.0

    @property
    def shape(self):
        return self.beta.shape

    @property
    def min_bound(self) -> np.ndarray:
        nz, ny, nx = self.beta.shape
        return np.array([-nx * self.voxel_size / 2,
                         -ny * self.voxel_size / 2, 0.0], np.float32)

    @property
    def max_bound(self) -> np.ndarray:
        nz, ny, nx = self.beta.shape
        return np.array([nx * self.voxel_size / 2,
                         ny * self.voxel_size / 2,
                         nz * self.voxel_size], np.float32)

    @classmethod
    def from_patch_dict(cls, d, voxel_size: float = 20.0) -> "VolumeGrid":
        """Build from a stage-A patch dict {'beta_ext','U','V','W'}."""
        return cls(jnp.asarray(d["beta_ext"]), jnp.asarray(d["U"]),
                   jnp.asarray(d["V"]), jnp.asarray(d["W"]), voxel_size)


def make_rays(cam_pos, look_at, resolution=(128, 128), fov: float = 0.25):
    """Returns (rays_o [H,W,3], rays_d [H,W,3]). fov in degrees — 0.25 for
    128², 0.115 for 256² (reference build_W_map.py:61)."""
    H, W = resolution
    cam_pos = jnp.asarray(cam_pos, jnp.float32)
    look_at = jnp.asarray(look_at, jnp.float32)
    cam_dir = look_at - cam_pos
    cam_dir = cam_dir / jnp.linalg.norm(cam_dir)
    world_up = jnp.array([-1.0, 0.0, 0.0])
    cam_right = jnp.cross(cam_dir, world_up)
    cam_right = cam_right / jnp.linalg.norm(cam_right)
    cam_up = jnp.cross(cam_right, cam_dir)
    cam_up = cam_up / jnp.linalg.norm(cam_up)

    aspect = W / H
    scale = math.tan(math.radians(fov * 0.5))
    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))
    x = -((2 * (i + 0.5) / W - 1) * aspect * scale)
    y = (1 - 2 * (j + 0.5) / H) * scale
    rays_d = (x[..., None] * cam_right + y[..., None] * cam_up + cam_dir)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(cam_pos, rays_d.shape)
    return rays_o, rays_d


@partial(jax.jit, static_argnames=("resolution", "step_size", "fov",
                                   "max_steps"))
def _first_hit_impl(beta, u, v, w, voxel_size, min_bound, max_bound,
                    cam_pos, look_at, resolution, step_size, fov, max_steps):
    H, W = resolution
    nz, ny, nx = beta.shape
    rays_o, rays_d = make_rays(cam_pos, look_at, resolution, fov)
    ro = rays_o.reshape(-1, 3)
    rd = rays_d.reshape(-1, 3)

    # NOT renderer.ray_aabb_interval: this replicates the reference's own
    # slab test BIT-FOR-BIT, additive epsilon included
    # (build_W_map.py:110 ``1.0 / (rays_d_flat + 1e-6)`` — which flips the
    # sign of direction components in (-1e-6, 0)). The oracle-parity
    # tests (test_first_hit_matches_reference etc.) pin this behavior;
    # do not "fix" it to the renderer's guarded form.
    inv_d = 1.0 / (rd + 1e-6)
    t0 = (min_bound - ro) * inv_d
    t1 = (max_bound - ro) * inv_d
    tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=1), 0.0)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=1)
    box_hit = tmax > tmin

    steps = jnp.arange(max_steps, dtype=jnp.float32) * step_size
    t_vals = tmin[:, None] + steps[None, :]
    pts = ro[:, None, :] + rd[:, None, :] * t_vals[..., None]

    gi = ((pts - min_bound) / voxel_size).astype(jnp.int32)
    gx = jnp.clip(gi[..., 0], 0, nx - 1)
    gy = jnp.clip(gi[..., 1], 0, ny - 1)
    gz = jnp.clip(gi[..., 2], 0, nz - 1)
    in_bounds = t_vals <= tmax[:, None]

    # dead-padded payload moves the march gather onto XLA's fast vector
    # lowering, values identical (ops/gather.py has the measured rule)
    beta2 = stack_volume(beta)
    beta_s = jnp.where(in_bounds, payload_lookup(beta2, gz, gy, gx)[..., 0],
                       0.0)
    hit = beta_s > 0
    first = jnp.argmax(hit, axis=1)
    has_hit = jnp.any(hit, axis=1) & box_hit

    r = jnp.arange(ro.shape[0])
    hz, hy, hx = gz[r, first], gy[r, first], gx[r, first]
    nan = jnp.float32(jnp.nan)
    # u/v/w are read at the SAME hit voxel: one stacked-payload gather
    # instead of three (ops/gather.py)
    uvw = payload_lookup(stack_volume(u, v, w), hz, hy, hx)
    uvw = jnp.where(has_hit[:, None], uvw, nan)
    return (uvw[:, 0].reshape(H, W), uvw[:, 1].reshape(H, W),
            uvw[:, 2].reshape(H, W))


def first_hit_maps(grid: VolumeGrid, cam_pos, look_at,
                   resolution=(128, 128), step_size: float = 20.0,
                   fov: float = 0.25, max_steps: int | None = None):
    """First-hit U/V/W maps (NaN = miss)."""
    if max_steps is None:
        diag = float(np.linalg.norm(grid.max_bound - grid.min_bound))
        # cameras sit far outside the box; march the full diagonal
        max_steps = int(diag / step_size) + 2
    return _first_hit_impl(
        grid.beta, grid.u, grid.v, grid.w, grid.voxel_size,
        jnp.asarray(grid.min_bound), jnp.asarray(grid.max_bound),
        jnp.asarray(cam_pos, jnp.float32), jnp.asarray(look_at, jnp.float32),
        tuple(resolution), float(step_size), float(fov), int(max_steps))


@partial(jax.jit, static_argnames=("resolution", "fov"))
def _z_slice_impl(u, v, w, voxel_size, min_bound, max_bound, cam_pos,
                  look_at, target_z, reference_plane_z, resolution, fov):
    H, W = resolution
    nz, ny, nx = u.shape
    rays_o, rays_d = make_rays(cam_pos, look_at, resolution, fov)
    ro = rays_o.reshape(-1, 3)
    rd = rays_d.reshape(-1, 3)

    d_z = rd[:, 2]
    d_z = jnp.where(jnp.abs(d_z) < 1e-6, 1e-6, d_z)
    t_hit = (reference_plane_z - ro[:, 2]) / d_z
    ref_pts = ro + t_hit[:, None] * rd
    pts = ref_pts.at[:, 2].set(target_z)

    valid = ((t_hit > 0)
             & (pts[:, 0] >= min_bound[0]) & (pts[:, 0] <= max_bound[0])
             & (pts[:, 1] >= min_bound[1]) & (pts[:, 1] <= max_bound[1])
             & (pts[:, 2] >= min_bound[2]) & (pts[:, 2] <= max_bound[2]))

    gi = ((pts - min_bound) / voxel_size).astype(jnp.int32)
    gx = jnp.clip(gi[:, 0], 0, nx - 1)
    gy = jnp.clip(gi[:, 1], 0, ny - 1)
    gz = jnp.clip(gi[:, 2], 0, nz - 1)
    nan = jnp.float32(jnp.nan)
    # same stacked-payload transform as _first_hit_impl: one gather for
    # the three wind components at identical indices (ops/gather.py)
    uvw = payload_lookup(stack_volume(u, v, w), gz, gy, gx)
    uvw = jnp.where(valid[:, None], uvw, nan)
    return (uvw[:, 0].reshape(H, W), uvw[:, 1].reshape(H, W),
            uvw[:, 2].reshape(H, W))


def z_slice_maps(grid: VolumeGrid, cam_pos, look_at, target_z_height: float,
                 resolution=(128, 128), reference_plane_z: float = 750.0,
                 fov: float = 0.25):
    """Parallax-free z-slice U/V/W maps (NaN = out of volume)."""
    return _z_slice_impl(
        grid.u, grid.v, grid.w, grid.voxel_size,
        jnp.asarray(grid.min_bound), jnp.asarray(grid.max_bound),
        jnp.asarray(cam_pos, jnp.float32), jnp.asarray(look_at, jnp.float32),
        float(target_z_height), float(reference_plane_z),
        tuple(resolution), float(fov))
