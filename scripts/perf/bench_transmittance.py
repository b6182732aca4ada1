"""Sun-transmittance at production patch geometry: shear-warp vs ray march."""
import time
import numpy as np
import jax.numpy as jnp

from unet_convlstm_tpu.datagen.renderer import (
    VolumeScene, sun_transmittance, render_radiance)

rng = np.random.default_rng(0)
nz, nxy = 200, 128
z, y, x = np.meshgrid(np.arange(nz), np.arange(nxy), np.arange(nxy),
                      indexing="ij")
beta = (0.01 * np.exp(-(((z - 60) / 30.0) ** 2 + ((y - 64) / 40.0) ** 2
                        + ((x - 64) / 40.0) ** 2))).astype(np.float32)
scene = VolumeScene(jnp.asarray(beta), 20.0)
sun = (0.3, 0.2, -0.9)

for method in ("march", "sweep"):
    t = np.asarray(sun_transmittance(scene, sun, method=method))  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        t = np.asarray(sun_transmittance(scene, sun, method=method))
    dt = (time.perf_counter() - t0) / 3
    print(f"t_sun {method:6s} {dt*1e3:9.1f} ms")

# end-to-end render (t_sun computed internally via 'auto'); camera path:
# per-sample march vs the O(V) ortho shear-warp composite ('auto' picks
# ortho at this satellite geometry — parallax 0.31 voxel < 1)
kw = dict(resolution=(256, 256), fov_deg=0.25, sun_dir=sun, g=0.85)
ref = None
for camera in ("march", "ortho"):
    t0 = time.perf_counter()
    img = np.asarray(render_radiance(scene, (0, 0, 600_000.0),
                                     (0, 0, 1500.0), **kw,
                                     camera_method=camera))
    print(f"render 256^2 incl t_sun ({camera:5s}): "
          f"{time.perf_counter()-t0:6.1f} s (cold, incl compile)")
    t0 = time.perf_counter()
    img = np.asarray(render_radiance(scene, (0, 0, 600_000.0),
                                     (0, 0, 1500.0), **kw,
                                     camera_method=camera))
    print(f"render 256^2 incl t_sun ({camera:5s}): "
          f"{time.perf_counter()-t0:6.3f} s (warm)")
    if ref is None:
        ref = img
    else:
        d = np.abs(img - ref)
        print(f"  ortho vs march: maxrel {d.max()/ref.max():.4f} "
              f"meanrel {d.mean()/ref.max():.5f}")
