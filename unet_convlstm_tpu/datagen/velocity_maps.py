"""Stage C driver — batch velocity-map generation over patch folders.

Capability parity with reference ``preprocessing/build_WVU_maps.py:51-178``:

* cyclic assignment of camera-CSV timestamps to numerically-named patch
  folders (:108-110); per-folder per-sample pkl loop with error isolation
  (:176-177);
* modes 'slice' (target height 1500 m over reference plane 750 m, :63-64)
  and 'first_hit'; resolution 256²; optional fixed nadir camera at
  [0, 0, 600 km] (:67-71);
* outputs ``{base}_time_{t}_view_{v}_{mode}.pkl`` holding
  {'u_map','v_map','w_map'} (:161-174).

TPU re-design: each patch's volumes are device-resident once, and all views
render through the jitted raycast kernels (datagen/raycast.py); maps come
back to host only for the pkl write.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np

from .overpass import (camera_schedule, enumerate_patch_folders,
                       read_overpass_csv)
from .raycast import VolumeGrid, first_hit_maps, z_slice_maps

FIXED_NADIR_CAMERA_M = np.array([0.0, 0.0, 600.0 * 1000.0])


def render_patch_maps(grid: VolumeGrid, cam_pos, look_at,
                      mode: str = "slice", resolution=(256, 256),
                      slice_height_m: float = 1500.0,
                      reference_plane_z: float = 750.0,
                      fov: float = 0.115):
    """One (patch, view) → (u, v, w) maps + the filename mode suffix."""
    if mode == "first_hit":
        u, v, w = first_hit_maps(grid, cam_pos, look_at, resolution, fov=fov)
        return u, v, w, "first_hit"
    if mode == "slice":
        u, v, w = z_slice_maps(grid, cam_pos, look_at, slice_height_m,
                               resolution, reference_plane_z, fov=fov)
        return u, v, w, f"slice_{int(slice_height_m)}m"
    raise ValueError(f"unknown mode {mode!r}")


def build_velocity_maps(input_root: str, output_root: str, csv_path: str,
                        mode: str = "slice", resolution=(256, 256),
                        slice_height_m: float = 1500.0,
                        reference_plane_z: float = 750.0,
                        use_fixed_camera: bool = True,
                        fov: float = 0.115,
                        start: Optional[int] = None,
                        end: Optional[int] = None,
                        batch_size: int = 1, mesh=None,
                        verbose: bool = True) -> int:
    """Process every numeric folder under ``input_root``; returns the number
    of map pkls written.

    ``batch_size`` > 1 ray-casts that many of a folder's patches per
    dispatch as one vmapped SPMD program (they share cameras by the
    cyclic time assignment); ``mesh`` (jax.sharding.Mesh) shards the
    patch axis across devices — same data-parallel design as stage B
    (render_batch.py). Reference analog: serial per-patch loop
    (build_WVU_maps.py:96-177)."""
    if batch_size > 1:
        return _build_velocity_maps_batched(
            input_root, output_root, csv_path, mode, resolution,
            slice_height_m, reference_plane_z, use_fixed_camera, fov,
            start, end, batch_size, mesh, verbose)
    log = print if verbose else (lambda *a, **k: None)
    times, schedule = camera_schedule(read_overpass_csv(csv_path))
    folders = enumerate_patch_folders(input_root, start, end)
    log(f"[velocity_maps] {len(folders)} folders, {len(times)} CSV times, "
        f"mode={mode}")

    written = 0
    for folder_idx, folder in folders:
        t = times[folder_idx % len(times)]
        views = schedule[t]
        in_dir = os.path.join(input_root, folder)
        out_dir = os.path.join(output_root, folder)
        os.makedirs(out_dir, exist_ok=True)
        for pkl_file in sorted(f for f in os.listdir(in_dir)
                               if f.endswith(".pkl")):
            try:
                with open(os.path.join(in_dir, pkl_file), "rb") as f:
                    patch = pickle.load(f)
                grid = VolumeGrid.from_patch_dict(patch)
                base = os.path.splitext(pkl_file)[0]
                for view_idx, view in enumerate(views):
                    cam_pos, look_at = view.caster_camera_m()
                    if use_fixed_camera:
                        cam_pos = FIXED_NADIR_CAMERA_M
                    u, v, w, suffix = render_patch_maps(
                        grid, cam_pos, look_at, mode, resolution,
                        slice_height_m, reference_plane_z, fov)
                    name = (f"{base}_time_{int(t)}_view_{view_idx}"
                            f"_{suffix}.pkl")
                    with open(os.path.join(out_dir, name), "wb") as f:
                        pickle.dump({"u_map": np.asarray(u),
                                     "v_map": np.asarray(v),
                                     "w_map": np.asarray(w)}, f)
                    written += 1
            except Exception as e:  # per-sample isolation (:176-177)
                log(f"[velocity_maps] failed {pkl_file}: {e}")
    log(f"[velocity_maps] wrote {written} map pkls")
    return written


def _build_velocity_maps_batched(input_root, output_root, csv_path, mode,
                                 resolution, slice_height_m,
                                 reference_plane_z, use_fixed_camera, fov,
                                 start, end, batch_size, mesh,
                                 verbose) -> int:
    """Chunked/sharded body of build_velocity_maps (batch_size > 1)."""
    import jax
    import jax.numpy as jnp

    from .raycast import _first_hit_impl, _z_slice_impl
    from .render_shard import pad_and_shard

    if mode not in ("slice", "first_hit"):
        raise ValueError(f"unknown mode {mode!r}")
    log = print if verbose else (lambda *a, **k: None)
    times, schedule = camera_schedule(read_overpass_csv(csv_path))
    folders = enumerate_patch_folders(input_root, start, end)
    ndev = 1 if mesh is None else mesh.devices.size
    log(f"[velocity_maps] {len(folders)} folders, mode={mode}, "
        f"batch={batch_size} over {ndev} device(s)")

    res = tuple(resolution)
    written = 0
    for folder_idx, folder in folders:
        t = times[folder_idx % len(times)]
        views = schedule[t]
        in_dir = os.path.join(input_root, folder)
        out_dir = os.path.join(output_root, folder)
        os.makedirs(out_dir, exist_ok=True)
        pkls = sorted(f for f in os.listdir(in_dir) if f.endswith(".pkl"))
        for c in range(0, len(pkls), batch_size):
            good = []
            for pkl_file in pkls[c:c + batch_size]:
                try:  # per-sample isolation (build_WVU_maps.py:176-177)
                    with open(os.path.join(in_dir, pkl_file), "rb") as f:
                        patch = pickle.load(f)
                    # keep volumes as NUMPY here: from_patch_dict
                    # would upload each patch to device just so np.stack
                    # can pull them all back — triple PCIe traffic on the
                    # hot batch path; pad_and_shard uploads the stack once
                    good.append((pkl_file, VolumeGrid(
                        np.asarray(patch["beta_ext"], np.float32),
                        np.asarray(patch["U"], np.float32),
                        np.asarray(patch["V"], np.float32),
                        np.asarray(patch["W"], np.float32))))
                except Exception as e:
                    log(f"[velocity_maps] failed {pkl_file}: {e}")
            if not good:
                continue
            g0 = good[0][1]
            try:
                stacks = [np.stack([getattr(g, k) for _, g in good])
                          for k in ("beta", "u", "v", "w")]
            except Exception as e:  # e.g. mixed patch shapes in one chunk
                log(f"[velocity_maps] chunk failed in {folder}: {e}")
                continue
            stacks, _ = pad_and_shard(stacks, mesh)
            beta_b, u_b, v_b, w_b = stacks
            min_b = jnp.asarray(g0.min_bound)
            max_b = jnp.asarray(g0.max_bound)
            try:
                per_view = []
                for view in views:
                    cam_pos, look_at = view.caster_camera_m()
                    if use_fixed_camera:
                        cam_pos = FIXED_NADIR_CAMERA_M
                    cam = jnp.asarray(cam_pos, jnp.float32)
                    tgt = jnp.asarray(look_at, jnp.float32)
                    if mode == "first_hit":
                        diag = float(np.linalg.norm(g0.max_bound
                                                    - g0.min_bound))
                        max_steps = int(diag / g0.voxel_size) + 2
                        maps = jax.vmap(
                            lambda b, u, v, w: _first_hit_impl(
                                b, u, v, w, g0.voxel_size, min_b, max_b,
                                cam, tgt, res, float(g0.voxel_size),
                                float(fov), max_steps))(beta_b, u_b, v_b,
                                                        w_b)
                        suffix = "first_hit"
                    else:  # "slice" (mode validated on entry)
                        maps = jax.vmap(
                            lambda u, v, w: _z_slice_impl(
                                u, v, w, g0.voxel_size, min_b, max_b,
                                cam, tgt, float(slice_height_m),
                                float(reference_plane_z), res,
                                float(fov)))(u_b, v_b, w_b)
                        suffix = f"slice_{int(slice_height_m)}m"
                    per_view.append([np.asarray(m) for m in maps])
            except Exception as e:
                log(f"[velocity_maps] chunk failed in {folder}: {e}")
                continue
            for bi, (pkl_file, _) in enumerate(good):
                base = os.path.splitext(pkl_file)[0]
                for view_idx, (u_m, v_m, w_m) in enumerate(per_view):
                    name = (f"{base}_time_{int(t)}_view_{view_idx}"
                            f"_{suffix}.pkl")
                    with open(os.path.join(out_dir, name), "wb") as f:
                        pickle.dump({"u_map": u_m[bi], "v_map": v_m[bi],
                                     "w_map": w_m[bi]}, f)
                    written += 1
    log(f"[velocity_maps] wrote {written} map pkls")
    return written
