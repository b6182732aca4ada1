"""Host-RSS leak probe: the axon PJRT client retains EVERY host->device
transfer's staging buffer (round 5, measured 2026-08-20).

Symptom: the full-size Moving-MNIST run (N=10000, T=40 — 31 MB of raw
batch per step) was OOM-killed at 130 GB anon RSS after ~5 epochs
(results/mnist_golden_T40_fullN.json provenance). This probe isolates it:
training steps at that geometry grow host RSS by exactly the transferred
batch bytes (~30 MB/step), linearly, forever.

Ruled out (each mode measured separately, all leak identically, none
recover at a hard sync):
  sync   — float(loss) every step (nothing retained by the loop)
  drop   — del every result reference, no sync
  reuse  — one preallocated host buffer np.copyto'd per batch
  gc     — gc.collect() + jax.clear_caches() every 25 steps
  direct — numpy arguments straight into the jitted step (no device_put)

Conclusion: the retention is inside the axon PJRT plugin's transfer
path (binary .so; not patchable here). The framework's answer is
PROCESS-SHARDED training: true resume + periodic `_last` checkpoints +
the persistent compile cache make `--epochs-per-proc N` (see
scripts/run_mnist_T40.py) a cheap generic workaround — each generation
exits before the leak approaches RAM and resumes warm (~40 s).

Usage: MODE=sync|drop|reuse|gc|direct python scripts/perf/probe_host_leak.py
"""

import gc
import os

import numpy as np


def rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return -1.0


def main() -> int:
    from unet_convlstm_tpu.utils.compile_cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.data.pipeline import SequenceLoader
    from unet_convlstm_tpu.models.registry import build_model
    from unet_convlstm_tpu.train import make_optimizer, make_train_step

    npz = "/tmp/rss_probe_T40.npz"
    if not os.path.exists(npz):
        save_moving_mnist_npz(npz, seq_len=40, num_samples=64,
                              image_size=64, num_digits=2, seed=0,
                              as_xy=True)
    ds = NPZSequenceDataset(npz)
    cfg = {"type": "custom", "base_ch": 32, "use_skip_lstm": True,
           "use_attention": False, "lstm_layers": 1}
    _, init_fn, apply_fn, _ = build_model(cfg)
    v = init_fn(jax.random.PRNGKey(0))
    tx = make_optimizer(1e-3)
    state = {"params": v["params"], "stats": v["stats"],
             "opt_state": tx.init(v["params"])}
    step = make_train_step(apply_fn, tx, ds.stats)
    loader = SequenceLoader(ds, np.arange(64), 16, shuffle=True, seed=0)

    mode = os.environ.get("MODE", "sync")
    xbuf = np.empty((16, 40, 64, 64, 2), np.float32)
    ybuf = np.empty((16, 40, 64, 64, 1), np.float32)
    print(f"mode={mode} start RSS {rss_mb():.0f} MB", flush=True)
    n = 0
    for _ in range(100):
        for x_np, y_np in loader:
            if mode == "reuse":
                np.copyto(xbuf, x_np)
                np.copyto(ybuf, y_np)
                x, y = jax.device_put(xbuf), jax.device_put(ybuf)
            elif mode == "direct":
                x, y = x_np, y_np
            else:
                x, y = jax.device_put(x_np), jax.device_put(y_np)
            state, loss, s = step(state, x, y)
            if mode == "sync":
                float(loss)
            else:
                del loss, s
            n += 1
            if mode == "gc" and n % 25 == 0:
                gc.collect()
                jax.clear_caches()
            if n % 25 == 0:
                print(f"step {n}: RSS {rss_mb():.0f} MB", flush=True)
            if n >= 150:
                break
        if n >= 150:
            break
    jax.block_until_ready(state)
    print(f"end RSS {rss_mb():.0f} MB "
          f"(leak ≈ {(rss_mb() - 500) / n:.1f} MB/step; batch bytes "
          f"{(xbuf.nbytes + ybuf.nbytes) / 1e6:.1f} MB)", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
