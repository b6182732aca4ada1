"""Stage B batch driver — render all patch folders to radiance pkls.

Capability parity with reference ``mitsuba3/render_all.py``: numerically
sorted patch folders with [start, end] bounds (:31-32,60-82); cyclic
assignment of overpass-CSV timestamps to folders (:89-92); per-satellite
renders written as ``{base}_time_{t}_view_{sat}.pkl`` holding
``{'render', 'timestamp', 'satellite_idx'}`` (:180-192); disk IO overlapped
with rendering via a 1-worker prefetch thread (:146-172).

TPU re-design: the sun-transmittance volume is computed once per patch and
shared by all satellite views of that timestamp; renders are jitted JAX
(datagen/renderer.py) instead of Mitsuba CUDA megakernels.
"""

from __future__ import annotations

import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Tuple

import numpy as np

from .overpass import camera_schedule, read_overpass_csv, sun_direction
from .renderer import (SUN_IRRADIANCE, VolumeScene,
                       multiple_scatter_fluence, render_radiance,
                       sun_transmittance)


def _load_patch(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def render_dataset(input_root: str, output_root: str, csv_path: str,
                   resolution: Tuple[int, int] = (256, 256),
                   fov_deg: float = 0.115, g: float = 0.85,
                   voxel_size: float = 20.0, z_offset: float = 0.0,
                   target_z_scale: float = 2.5,
                   start: Optional[int] = None, end: Optional[int] = None,
                   ms_orders: int = 1,
                   verbose: bool = True) -> int:
    """Render every patch in every numeric folder; returns pkls written.

    Camera per reference render.py:102-117: origin (ENU[1], ENU[0], ENU[2])
    km → meters, target [0, 0, cloud_z_center·target_z_scale], up [1,0,0].
    ``ms_orders`` > 1 adds successive-order multiple scattering (the
    per-patch fluence volume is shared across that patch's views, like the
    sun transmittance).
    """
    log = print if verbose else (lambda *a, **k: None)
    times, schedule = camera_schedule(read_overpass_csv(csv_path))
    all_folders = sorted(f for f in os.listdir(input_root)
                         if os.path.isdir(os.path.join(input_root, f))
                         and f.isdigit())
    # the cyclic time assignment is indexed by the folder's position in the
    # FULL list, so bounded/resumed runs render with the same geometry as a
    # full run (reference render_all.py:80-90 keeps original_start_idx)
    folders = [(i, f) for i, f in enumerate(all_folders)
               if (start is None or int(f) >= start)
               and (end is None or int(f) <= end)]
    log(f"[render] {len(folders)} folders × views; res={resolution}")

    written = 0
    pool = ThreadPoolExecutor(max_workers=1)  # IO prefetch (render_all:146)
    try:
        for folder_idx, folder in folders:
            t = times[folder_idx % len(times)]
            views = schedule[t]
            sun = sun_direction(views[0].sun_zenith, views[0].sun_azimuth)
            in_dir = os.path.join(input_root, folder)
            out_dir = os.path.join(output_root, folder)
            os.makedirs(out_dir, exist_ok=True)
            pkls = sorted(f for f in os.listdir(in_dir)
                          if f.endswith(".pkl"))
            future = (pool.submit(_load_patch, os.path.join(in_dir, pkls[0]))
                      if pkls else None)
            for n, pkl_file in enumerate(pkls):
                try:
                    patch = future.result()
                    if n + 1 < len(pkls):
                        future = pool.submit(
                            _load_patch, os.path.join(in_dir, pkls[n + 1]))
                    scene = VolumeScene(np.asarray(patch["beta_ext"],
                                                   np.float32),
                                        voxel_size, z_offset)
                    t_sun = sun_transmittance(scene, sun)
                    e_ms = None
                    if ms_orders > 1:
                        e_ms = multiple_scatter_fluence(
                            scene.beta, t_sun, float(voxel_size), 1.0,
                            SUN_IRRADIANCE, int(ms_orders))
                    z_center = (scene.min_bound[2] + scene.max_bound[2]) / 2
                    target = np.array([0.0, 0.0,
                                       z_center * target_z_scale])
                    base = os.path.splitext(pkl_file)[0]
                    for sat, view in enumerate(views):
                        origin_km, _, up = view.renderer_camera_km(0.0)
                        origin = origin_km * 1000.0
                        img = render_radiance(
                            scene, origin, target, up, fov_deg, resolution,
                            sun, g=g, t_sun=t_sun, e_ms=e_ms)
                        name = f"{base}_time_{int(t)}_view_{sat}.pkl"
                        with open(os.path.join(out_dir, name), "wb") as f:
                            pickle.dump({"render": np.asarray(img),
                                         "timestamp": int(t),
                                         "satellite_idx": sat}, f)
                        written += 1
                except Exception as e:  # per-sample isolation (:194-195)
                    log(f"[render] failed {pkl_file}: {e}")
    finally:
        pool.shutdown(wait=False)
    log(f"[render] wrote {written} pkls")
    return written
