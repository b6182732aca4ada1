"""Headline benchmark: training frames/sec/chip (fwd+bwd+optimizer).

Config: BASELINE.json configs[0] — Moving-MNIST 64x64, sequence length 10,
small ConvLSTM-UNet (base_ch=32, skip-LSTMs on — the reference custom
architecture, train/unet.py:131-204).

Baseline: the reference PyTorch implementation measured on the build host
(torch CPU — the reference has no TPU path and no GPU was present):
4.69 frames/sec fwd+bwd at identical model config/shapes (B=1, T=10;
see BASELINE.md "measured" table).

``run()`` returns the result dict; the repo-root ``bench.py`` (and the
``bench`` CLI subcommand) print it as ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

REF_FRAMES_PER_SEC = 4.69  # reference torch, build host (BASELINE.md)

B, T, H = 64, 10, 64
UNROLL = 10  # full scan unroll over the sequence (+10% on v5e)
WARMUP, ITERS = 3, 20


def run() -> dict:
    import jax

    from .data.moving_mnist import (
        generate_moving_mnist, moving_mnist_to_xy, synthetic_digit_bank)
    from .models.registry import build_model
    from .ops.normalize import compute_norm_stats
    from .parallel.mesh import (
        make_mesh, batch_sharding, replicated_sharding)
    from .train import make_optimizer, make_train_step

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev)

    data = generate_moving_mnist(seq_len=T, num_samples=B, image_size=H,
                                 num_digits=2, digits=synthetic_digit_bank(),
                                 seed=0)
    X, Y = moving_mnist_to_xy(data)
    stats = compute_norm_stats(X, Y)
    x_raw = np.ascontiguousarray(np.moveaxis(X, 2, -1))
    y_raw = np.ascontiguousarray(np.moveaxis(Y, 2, -1))

    cfg_dict = {"type": "custom", "base_ch": 32, "use_skip_lstm": True,
                "use_attention": False, "lstm_layers": 1}
    _, init_fn, apply_fn, _ = build_model(cfg_dict)
    apply_fn = functools.partial(apply_fn, unroll=UNROLL)
    variables = init_fn(jax.random.PRNGKey(0))
    variables = jax.device_put(variables, replicated_sharding(mesh))
    tx = make_optimizer(1e-3)
    state = {"params": variables["params"], "stats": variables["stats"],
             "opt_state": jax.device_put(tx.init(variables["params"]),
                                         replicated_sharding(mesh))}

    step = make_train_step(apply_fn, tx, stats, use_mask=False, mesh=mesh)
    shard = batch_sharding(mesh)
    x_dev = jax.device_put(x_raw, shard)
    y_dev = jax.device_put(y_raw, shard)

    for _ in range(WARMUP):
        state, loss, _ = step(state, x_dev, y_dev)
    float(loss)  # value fetch — block_until_ready alone doesn't drain the
    # queue on the experimental axon backend

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss, _ = step(state, x_dev, y_dev)
    final_loss = float(loss)   # the SYNC — must not live inside an assert
    dt = time.perf_counter() - t0
    if not np.isfinite(final_loss):
        raise RuntimeError(f"benchmark loss is non-finite: {final_loss}")

    frames_per_sec_per_chip = B * T * ITERS / dt / n_dev
    return {
        "metric": "train_frames_per_sec_per_chip_mnist64_seq10_fwd_bwd",
        "value": round(frames_per_sec_per_chip, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec_per_chip / REF_FRAMES_PER_SEC,
                             2),
    }


def main():
    print(json.dumps(run()))


if __name__ == "__main__":
    main()
