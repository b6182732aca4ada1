"""Measure the Pallas fused MC sampling block on the live TPU.

Two questions, in order:

1. **Is the hardware PRNG stream sound?** `sample_flights` (ops/pallas/
   mc_sampler.py) is statistically validated on-chip: acceptance uniforms
   land in [0, 1) with mean 1/2 and variance 1/12; free flights at m=1 are
   Exp(1) (mean 1, ~37% above 1); HG directions are unit-norm with
   E[cos θ] = g (the Henyey-Greenstein first moment). The interpret-mode
   PRNG is a stub, so this is the first place the real bit stream can be
   checked.
2. **Does it win?** The production-view MC render (256² view of a
   128×128×200 patch, the BASELINE.md MC row geometry) is timed with the
   threefry XLA sampler vs the Pallas kernel, same spp/seed protocol, both
   majorant regimes from docs/RENDERER.md. Radiance means must agree
   within MC noise (different RNG realization, same estimator).

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
         scripts/perf/bench_pallas_sampler.py [spp]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from unet_convlstm_tpu.datagen.mc_reference import mc_radiance
from unet_convlstm_tpu.datagen.renderer import VolumeScene, sun_transmittance
from unet_convlstm_tpu.ops.pallas.mc_sampler import sample_flights

SPP = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def validate_hw_prng():
    print("== 1. hardware-PRNG statistical validation ==", flush=True)
    N, G = 1 << 17, 0.85
    d = np.zeros((N, 3), np.float32)
    d[:, 2] = 1.0                       # +z rays: cos θ = new_d[:, 2]
    m = jnp.ones((N,), jnp.float32)
    t_all, ua_all, cos_all = [], [], []
    for seed in range(8):
        t, ua, nd = sample_flights(jnp.int32(seed * 7919 + 13),
                                   jnp.asarray(d), m, g=G)
        t_all.append(np.asarray(t))
        ua_all.append(np.asarray(ua))
        cos_all.append(np.asarray(nd[:, 2]))
        norms = np.linalg.norm(np.asarray(nd), axis=1)
        assert np.allclose(norms, 1.0, atol=1e-4), norms
    t, ua, cos = map(np.concatenate, (t_all, ua_all, cos_all))
    n = t.size
    checks = [
        ("u_accept min >= 0", ua.min() >= 0.0),
        ("u_accept max < 1", ua.max() < 1.0),
        ("u_accept mean ~ 1/2", abs(ua.mean() - 0.5) < 4 / np.sqrt(n)),
        ("u_accept var ~ 1/12", abs(ua.var() - 1 / 12) < 1e-3),
        ("flight m=1 is Exp(1): mean ~ 1", abs(t.mean() - 1.0)
         < 4 / np.sqrt(n)),
        ("flight P(t>1) ~ 1/e", abs((t > 1).mean() - np.exp(-1)) < 3e-3),
        (f"HG first moment E[cos] ~ g={0.85}",
         abs(cos.mean() - 0.85) < 4 * cos.std() / np.sqrt(n) + 1e-3),
        ("seeds decorrelated (lag-N corr < 1%)",
         abs(np.corrcoef(ua[:n // 2], ua[n // 2:])[0, 1]) < 0.01),
    ]
    ok = True
    for name, passed in checks:
        print(f"  {'PASS' if passed else 'FAIL'}  {name}", flush=True)
        ok &= bool(passed)
    print(f"  stats: u mean={ua.mean():.5f} var={ua.var():.5f} "
          f"t mean={t.mean():.5f} cos mean={cos.mean():.5f} (n={n})")
    return ok


def bench_render():
    print(f"== 2. production-view MC render, spp={SPP} ==", flush=True)
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
    rows = []
    for name, beta in scenes.items():
        scene = VolumeScene(jnp.asarray(beta.astype(np.float32)), 20.0)
        t_sun = sun_transmittance(scene, sun)
        kw = dict(origin=(0, 0, 600_000.0), target=(0, 0, 1500.0),
                  resolution=(256, 256), fov_deg=0.25, sun_dir=sun, g=0.85,
                  spp=SPP, max_depth=64, t_sun=t_sun, seed=0,
                  majorant_cell=16)
        out = {}
        for tag, flag in (("threefry", False), ("pallas", True)):
            img = np.asarray(mc_radiance(scene, **kw,
                                         use_pallas_sampler=flag))
            t0 = time.perf_counter()
            img = np.asarray(mc_radiance(scene, **kw,
                                         use_pallas_sampler=flag))
            dt = time.perf_counter() - t0
            out[tag] = (dt, img)
            print(f"  {name} {tag:9s}: {dt:6.2f} s warm  "
                  f"mean={img.mean():.5f}", flush=True)
        dt0, im0 = out["threefry"]
        dt1, im1 = out["pallas"]
        rel = abs(im1.mean() - im0.mean()) / max(im0.mean(), 1e-12)
        print(f"  {name}: speedup x{dt0 / dt1:.2f}   "
              f"mean-radiance delta {rel * 100:.2f}% "
              f"(MC noise bound ~{100 / np.sqrt(SPP * 256):.2f}%)",
              flush=True)
        rows.append((name, dt0, dt1, rel))
    return rows


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    ok = validate_hw_prng()
    rows = bench_render()
    best = max(r[1] / r[2] for r in rows)
    print(f"\nPRNG_VALID={ok}  BEST_SPEEDUP=x{best:.2f}")
