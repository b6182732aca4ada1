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

from .overpass import camera_schedule, read_overpass_csv
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
                        verbose: bool = True) -> int:
    """Process every numeric folder under ``input_root``; returns the number
    of map pkls written."""
    log = print if verbose else (lambda *a, **k: None)
    times, schedule = camera_schedule(read_overpass_csv(csv_path))
    all_folders = sorted(f for f in os.listdir(input_root)
                         if os.path.isdir(os.path.join(input_root, f))
                         and f.isdigit())
    # time assignment by position in the FULL list so bounded/resumed runs
    # match full runs (see render_batch.py; reference render_all.py:80-90)
    folders = [(i, f) for i, f in enumerate(all_folders)
               if (start is None or int(f) >= start)
               and (end is None or int(f) <= end)]
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
