"""Monte-Carlo production-view render: super-voxel majorant grid vs global
majorant, on the two regimes from docs/RENDERER.md (broad smooth blob
where the grid loses; dense compact cumulus where it wins 2.5x).
BASELINE.md MC row geometry: 256^2 view of a 128x128x200 patch."""
import time

import numpy as np
import jax.numpy as jnp

from unet_convlstm_tpu.datagen.renderer import VolumeScene, sun_transmittance
from unet_convlstm_tpu.datagen.mc_reference import mc_radiance

nz, nxy = 200, 128
z, y, x = np.meshgrid(np.arange(nz), np.arange(nxy), np.arange(nxy),
                      indexing="ij")
scenes = {
    "broad":
        0.01 * np.exp(-(((z - 60) / 30.0) ** 2 + ((y - 64) / 40.0) ** 2
                        + ((x - 64) / 40.0) ** 2)),
    "dense":
        0.15 * np.exp(-(((z - 60) / 12.0) ** 2 + ((y - 64) / 12.0) ** 2
                        + ((x - 64) / 12.0) ** 2)),
}
sun = np.asarray((0.3, 0.2, -0.9), np.float32)
sun /= np.linalg.norm(sun)
for name, beta in scenes.items():
    scene = VolumeScene(jnp.asarray(beta.astype(np.float32)), 20.0)
    t_sun = sun_transmittance(scene, sun)
    kw = dict(origin=(0, 0, 600_000.0), target=(0, 0, 1500.0),
              resolution=(256, 256), fov_deg=0.25, sun_dir=sun, g=0.85,
              spp=16, max_depth=64, t_sun=t_sun, seed=0)
    ref = None
    for cell in (0, 16):
        img = np.asarray(mc_radiance(scene, **kw, majorant_cell=cell))
        t0 = time.perf_counter()
        img = np.asarray(mc_radiance(scene, **kw, majorant_cell=cell))
        dt = time.perf_counter() - t0
        line = (f"{name} 256^2 spp16 cell={cell:2d}: {dt:6.2f} s warm "
                f"mean={img.mean():.4f}")
        if ref is None:
            ref = img
        else:
            line += (f"  vs cell0 mean delta "
                     f"{abs(img.mean() - ref.mean()) / ref.mean() * 100:.2f}%")
        print(line, flush=True)

    # Pallas fused hardware-PRNG sampling block (ops/pallas/mc_sampler.py)
    # on the auto-selected majorant config; mean must agree with the
    # threefry render to MC noise (different realization, same estimator)
    for cell in (0, 16):
        try:
            img = np.asarray(mc_radiance(scene, **kw, majorant_cell=cell,
                                         use_pallas_sampler=True))
            t0 = time.perf_counter()
            img = np.asarray(mc_radiance(scene, **kw, majorant_cell=cell,
                                         use_pallas_sampler=True))
            dt = time.perf_counter() - t0
            print(f"{name} 256^2 spp16 cell={cell:2d} PALLAS-sampler: "
                  f"{dt:6.2f} s warm mean={img.mean():.4f} "
                  f"(threefry-cell0 mean {ref.mean():.4f})", flush=True)
        except Exception as e:
            print(f"{name} cell={cell} PALLAS-sampler: FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:100]}",
                  flush=True)
