"""Serving latency on the live TPU: per-frame streaming predict p50/p95/p99.

The serving claim so far is functional (sessions carry state, O(1)/frame,
HTTP round-trip tested); this measures what a deployment actually sees —
single-frame request latency through ``StreamingPredictor.predict`` at
production inference geometry (128², the cloud contract), plus the bf16 vs
int8 delta and a multi-session interleave to show per-session state carry
costs nothing extra.

Usage (serialize with ALL other TPU work — one axon client at a time):
    python scripts/perf/bench_serve_latency.py [--ckpt DIR] [--int8]

Writes one JSON line per config; paste the table into docs/PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def _make_checkpoint(tmp: str, base_ch: int, image: int) -> str:
    """Train 1 epoch at tiny cost just to get a restorable checkpoint with a
    real norm manifest (serving restores everything from the checkpoint)."""
    from unet_convlstm_tpu.data.moving_mnist import save_moving_mnist_npz
    from unet_convlstm_tpu.train.config import TrainConfig
    from unet_convlstm_tpu.train.loop import fit

    npz = os.path.join(tmp, "mm.npz")
    save_moving_mnist_npz(npz, seq_len=4, num_samples=16, image_size=image,
                          num_digits=2, seed=0, as_xy=True)
    ckdir = os.path.join(tmp, "ck")
    cfg = TrainConfig(npz_path=npz, epochs=1, batch_size=8, mesh_data=1,
                      checkpoint_dir=ckdir,
                      model={"type": "custom", "base_ch": base_ch,
                             "use_skip_lstm": True, "use_attention": False,
                             "lstm_layers": 1})
    fit(cfg)
    return os.path.join(ckdir, "custom_best")


def bench_session(pred, batch: int, image: int, n_warm: int, n_meas: int,
                  rng: np.random.Generator):
    sid = pred.open_session(batch=batch, height=image, width=image)
    lat_ms = []
    for i in range(n_warm + n_meas):
        frame = rng.random((batch, 1, image, image, 2), dtype=np.float32)
        t0 = time.perf_counter()
        out = pred.predict(sid, frame)
        # predict returns a realized np array (the engine syncs by value
        # fetch), so perf_counter here is true request latency
        assert out.shape[1] == 1
        dt = (time.perf_counter() - t0) * 1e3
        if i >= n_warm:
            lat_ms.append(dt)
    pred.close_session(sid)
    a = np.asarray(lat_ms)
    return {"p50_ms": round(float(np.percentile(a, 50)), 3),
            "p95_ms": round(float(np.percentile(a, 95)), 3),
            "p99_ms": round(float(np.percentile(a, 99)), 3),
            "mean_ms": round(float(a.mean()), 3),
            "frames_per_s": round(batch * 1e3 / float(a.mean()), 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="", help="existing checkpoint dir "
                    "(default: train a throwaway one)")
    ap.add_argument("--image", type=int, default=128)
    ap.add_argument("--base-ch", type=int, default=64)
    ap.add_argument("--warm", type=int, default=20)
    ap.add_argument("--meas", type=int, default=200)
    ap.add_argument("--int8", action="store_true",
                    help="also measure the int8 engine")
    args = ap.parse_args()

    from unet_convlstm_tpu.serve import StreamingPredictor

    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    ckpt = args.ckpt or _make_checkpoint(tmp, args.base_ch, args.image)
    rng = np.random.default_rng(0)

    results = {}
    pred = StreamingPredictor(ckpt)
    # label results with the checkpoint's ACTUAL model config, not the CLI
    # default — an existing --ckpt may have any width
    base_ch = pred.model_cfg.get("base_ch", args.base_ch)
    for batch in (1, 8):
        key = f"bf16_B{batch}"
        results[key] = bench_session(pred, batch, args.image, args.warm,
                                     args.meas, rng)
        print(json.dumps({"config": key, "image": args.image,
                          "base_ch": base_ch, **results[key]}),
              flush=True)

    # two interleaved sessions: state carry must not add per-request cost
    s1 = pred.open_session(batch=1, height=args.image, width=args.image)
    s2 = pred.open_session(batch=1, height=args.image, width=args.image)
    lat = []
    for i in range(args.warm + args.meas):
        frame = rng.random((1, 1, args.image, args.image, 2),
                           dtype=np.float32)
        t0 = time.perf_counter()
        pred.predict(s1 if i % 2 == 0 else s2, frame)
        if i >= args.warm:
            lat.append((time.perf_counter() - t0) * 1e3)
    pred.close_session(s1)
    pred.close_session(s2)
    a = np.asarray(lat)
    results["bf16_B1_interleaved2"] = {
        "p50_ms": round(float(np.percentile(a, 50)), 3),
        "p99_ms": round(float(np.percentile(a, 99)), 3)}
    print(json.dumps({"config": "bf16_B1_interleaved2",
                      **results["bf16_B1_interleaved2"]}), flush=True)

    # Client-side double-buffering (VERDICT r4 #6): issue the NEXT
    # frame's host->device transfer (async jax.device_put) BEFORE
    # blocking on the current predict, so the transfer rides the tunnel
    # while the chip computes. predict() accepts device arrays
    # (jnp.asarray is a no-op on them). If B=1 latency is
    # dispatch-bound, not transfer-bound — round 4's reading — this row
    # changes nothing and closes the latency chapter.
    import jax

    s1 = pred.open_session(batch=1, height=args.image, width=args.image)
    frames = [rng.random((1, 1, args.image, args.image, 2),
                         dtype=np.float32)
              for _ in range(args.warm + args.meas + 1)]
    lat = []
    nxt = jax.device_put(frames[0])
    t_all = time.perf_counter()
    for i in range(args.warm + args.meas):
        cur, nxt = nxt, jax.device_put(frames[i + 1])
        t0 = time.perf_counter()
        pred.predict(s1, cur)
        if i >= args.warm:
            lat.append((time.perf_counter() - t0) * 1e3)
        if i == args.warm - 1:
            t_all = time.perf_counter()
    sustained = (time.perf_counter() - t_all) * 1e3 / args.meas
    pred.close_session(s1)
    a = np.asarray(lat)
    results["bf16_B1_doublebuf"] = {
        "p50_ms": round(float(np.percentile(a, 50)), 3),
        "p99_ms": round(float(np.percentile(a, 99)), 3),
        "sustained_ms_per_frame": round(sustained, 3)}
    print(json.dumps({"config": "bf16_B1_doublebuf",
                      **results["bf16_B1_doublebuf"]}), flush=True)

    def bench_fused(p, n):
        """One fused predict_many request advances ALL n sessions one
        frame; latency is per fused REQUEST, so the throughput recorded
        is AGGREGATE across the n streams (each stream individually sees
        1e3/p50 frames/s)."""
        ss = [p.open_session(batch=1, height=args.image,
                             width=args.image) for _ in range(n)]
        lat = []
        # full args.meas samples — the fused percentiles must rest on the
        # same sample count as every other config in this file (ADVICE r4)
        for i in range(args.warm + args.meas):
            blocks = [rng.random((1, 1, args.image, args.image, 2),
                                 dtype=np.float32) for _ in range(n)]
            t0 = time.perf_counter()
            p.predict_many(ss, blocks)
            if i >= args.warm:
                lat.append((time.perf_counter() - t0) * 1e3)
        for s in ss:
            p.close_session(s)
        a = np.asarray(lat)
        return {"p50_ms": round(float(np.percentile(a, 50)), 3),
                "p99_ms": round(float(np.percentile(a, 99)), 3),
                "aggregate_frames_per_s": round(
                    n * 1e3 / float(np.percentile(a, 50)), 1)}

    for n in (2, 4, 8):
        key = f"bf16_B1_fused{n}"
        results[key] = bench_fused(pred, n)
        print(json.dumps({"config": key, **results[key]}), flush=True)

    if args.int8:
        pred8 = StreamingPredictor(ckpt, int8=True)
        for batch in (1, 8):
            key = f"int8_B{batch}"
            results[key] = bench_session(pred8, batch, args.image,
                                         args.warm, args.meas, rng)
            print(json.dumps({"config": key, **results[key]}), flush=True)

        # int8 engine + fused 8-stream dispatch (measured SLOWER than
        # bf16 fused at single-frame dispatches — docs/PERF.md round 4b)
        results["int8_B1_fused8"] = bench_fused(pred8, 8)
        print(json.dumps({"config": "int8_B1_fused8",
                          **results["int8_B1_fused8"]}), flush=True)

    out = os.path.join(tmp, "serve_latency.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
