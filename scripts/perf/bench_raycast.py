"""Stage-C raycast timings at production geometry (BASELINE row:
0.67 s/map at 256² measured 2026-08-16, scalar-payload gathers) — after
the round-3 stacked/padded-payload gather transforms (docs/PERF.md):
first-hit march rides a padded [...,2] beta gather, and the u/v/w reads
ride ONE stacked [...,3] gather at identical indices.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python \
          scripts/perf/bench_raycast.py
"""
import time

import numpy as np
import jax

from unet_convlstm_tpu.datagen.raycast import (
    VolumeGrid, first_hit_maps, z_slice_maps)

nz, nxy = 200, 128
rng = np.random.default_rng(0)
z, y, x = np.meshgrid(np.arange(nz), np.arange(nxy), np.arange(nxy),
                      indexing="ij")
beta = (0.05 * np.exp(-(((z - 60) / 25.0) ** 2 + ((y - 64) / 30.0) ** 2
                        + ((x - 64) / 30.0) ** 2))).astype(np.float32)
beta[beta < 0.002] = 0.0
u = rng.standard_normal(beta.shape).astype(np.float32)
v = rng.standard_normal(beta.shape).astype(np.float32)
w = rng.standard_normal(beta.shape).astype(np.float32)
grid = VolumeGrid(beta=jax.numpy.asarray(beta), u=jax.numpy.asarray(u),
                  v=jax.numpy.asarray(v), w=jax.numpy.asarray(w),
                  voxel_size=20.0)
cam = np.array((-747_000.0, 154_900.0, 558_600.0), np.float32)
look = np.array((0.0, 0.0, 0.0), np.float32)

print(f"devices: {jax.devices()}")
for name, fn in (
        ("first_hit 256^2", lambda: first_hit_maps(
            grid, cam, look, resolution=(256, 256))),
        ("z_slice 256^2", lambda: z_slice_maps(
            grid, cam, look, 1200.0, resolution=(256, 256)))):
    out = fn()
    s = float(np.nansum(np.asarray(out[2])))     # sync via value fetch
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn()
        s = float(np.nansum(np.asarray(out[2])))
        times.append(time.perf_counter() - t0)
    print(f"{name}: warm best {min(times):.3f} s  median "
          f"{sorted(times)[2]:.3f} s  (w-sum {s:.3e})")
