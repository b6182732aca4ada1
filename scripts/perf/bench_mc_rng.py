"""End-to-end MC render: threefry vs rbg (RngBitGenerator HLO) PRNG.

The per-iteration cost model (`bench_mc_breakdown.py`, 2026-08-18) puts
the threefry uniforms at ~19% of a tracking iteration and measures the
on-chip RngBitGenerator at 16x the threefry rate for the same draw —
this script asks whether that class win survives to the production-view
render wall (same scenes/protocol as bench_pallas_sampler.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
         scripts/perf/bench_mc_rng.py [spp]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from unet_convlstm_tpu.datagen.mc_reference import mc_radiance
from unet_convlstm_tpu.datagen.renderer import VolumeScene, sun_transmittance

SPP = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def main():
    print(f"devices: {jax.devices()}  spp={SPP}", flush=True)
    nz, nxy = 200, 128
    z, y, x = np.meshgrid(np.arange(nz), np.arange(nxy), np.arange(nxy),
                          indexing="ij")
    scenes = {
        "broad": 0.01 * np.exp(-(((z - 60) / 30.0) ** 2
                                 + ((y - 64) / 40.0) ** 2
                                 + ((x - 64) / 40.0) ** 2)),
        "dense": 0.15 * np.exp(-(((z - 60) / 12.0) ** 2
                                 + ((y - 64) / 12.0) ** 2
                                 + ((x - 64) / 12.0) ** 2)),
    }
    sun = np.asarray((0.3, 0.2, -0.9), np.float32)
    sun /= np.linalg.norm(sun)
    best = 0.0
    for name, beta in scenes.items():
        scene = VolumeScene(jnp.asarray(beta.astype(np.float32)), 20.0)
        t_sun = sun_transmittance(scene, sun)
        kw = dict(origin=(0, 0, 600_000.0), target=(0, 0, 1500.0),
                  resolution=(256, 256), fov_deg=0.25, sun_dir=sun, g=0.85,
                  spp=SPP, max_depth=64, t_sun=t_sun, seed=0,
                  majorant_cell=16)
        out = {}
        for impl in ("threefry", "rbg"):
            img = np.asarray(mc_radiance(scene, **kw, rng_impl=impl))
            t0 = time.perf_counter()
            img = np.asarray(mc_radiance(scene, **kw, rng_impl=impl))
            dt = time.perf_counter() - t0
            out[impl] = (dt, img)
            print(f"  {name} {impl:9s}: {dt:6.2f} s warm  "
                  f"mean={img.mean():.5f}", flush=True)
        dt0, im0 = out["threefry"]
        dt1, im1 = out["rbg"]
        rel = abs(im1.mean() - im0.mean()) / max(im0.mean(), 1e-12)
        print(f"  {name}: rbg speedup x{dt0 / dt1:.2f}   "
              f"mean-radiance delta {rel * 100:.2f}% "
              f"(MC noise bound ~{100 / np.sqrt(SPP * 256):.2f}%)",
              flush=True)
        best = max(best, dt0 / dt1)
    print(f"\nBEST_RBG_SPEEDUP=x{best:.2f}")


if __name__ == "__main__":
    main()
