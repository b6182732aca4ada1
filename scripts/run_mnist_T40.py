"""Gate the reference's Moving-MNIST PRODUCTION temporal contract: T=40.

The reference generator writes ``[10000, 40, 2, 64, 64]`` — seq_len=40
(reference digits/build_moving_mnist.py:60-67) — but every MNIST golden so
far trained at the driver's T=10 bench geometry. This run proves the
scan/recurrence + HBM story at the generator's own production depth
(VERDICT r3 #7); with ``--samples 10000 --mmap`` it runs the generator's
REAL dataset size through the mmap sidecar path (VERDICT r4 #4).

``--epochs-per-proc N`` shards training across PROCESS GENERATIONS of N
epochs each (true resume + periodic ``_last`` checkpoints + the
persistent compile cache make restarts ~40 s warm). Why: the axon PJRT
client leaks every host→device transfer's staging buffer — ~31 MB/step
at this geometry, measured and isolated in
scripts/perf/probe_host_leak.py — which OOM-killed the monolithic
full-size run at 130 GB anon RSS after ~5 epochs. Process sharding
bounds the leak per generation; it is the framework's generic answer for
ANY long run on this runtime.

Records val MAE/RMSE + streaming-rollout PSNR/SSIM (16 val sequences,
rollout_scan ≡ streaming — parity tested) →
results/mnist_golden_T40.json + a BASELINE.md row.

Usage: python scripts/run_mnist_T40.py [--samples N] [--epochs E]
       [--mmap] [--epochs-per-proc K]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time

import numpy as np

MODEL_CFG = {"type": "custom", "base_ch": 32, "use_skip_lstm": True,
             "use_attention": False, "lstm_layers": 1}


def _train_config(args, epochs: int, ckpt_dir: str):
    from unet_convlstm_tpu.train.config import TrainConfig

    return TrainConfig(npz_path=args.npz, batch_size=args.batch_size,
                       epochs=epochs, checkpoint_dir=ckpt_dir,
                       mesh_data=1, save_last_every=2, model=dict(MODEL_CFG))


def child_fit(args) -> int:
    """One process generation: resume (if a checkpoint exists) and train
    up to --epochs, then exit — bounding the runtime's transfer leak."""
    from unet_convlstm_tpu.utils.compile_cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.train.loop import fit

    cfg = _train_config(args, args.epochs, args.ckpt_dir)
    ds = NPZSequenceDataset(args.npz, mmap=args.mmap)
    last = os.path.join(args.ckpt_dir, "custom_last")
    fit(cfg, dataset=ds,
        resume_from=last if os.path.isdir(last) else None)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--npz", default="",
                    help="dataset path (default embeds --samples so a "
                         "rerun with different N cannot silently reuse a "
                         "stale corpus)")
    ap.add_argument("--out", default="results/mnist_golden_T40.json")
    ap.add_argument("--mmap", action="store_true",
                    help="write the corpus UNCOMPRESSED and train through "
                        "the mmap sidecar path (data/npz_dataset.py) — the "
                        "larger-than-RAM input machinery, exercised at the "
                        "generator's real N=10000 size (VERDICT r4 #4)")
    ap.add_argument("--epochs-per-proc", type=int, default=0,
                    help="shard training across process generations of K "
                         "epochs (see module docstring; 0 = single "
                         "process)")
    ap.add_argument("--ckpt-dir", default="")
    ap.add_argument("--child-fit", action="store_true",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()
    if not args.npz:
        args.npz = f"/tmp/mnist_T40_n{args.samples}.npz"
    if not args.ckpt_dir:
        args.ckpt_dir = args.npz + ".ck"
    if args.child_fit:
        return child_fit(args)

    from unet_convlstm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from unet_convlstm_tpu.data.moving_mnist import (
        generate_moving_mnist, moving_mnist_to_xy, synthetic_digit_bank)
    from unet_convlstm_tpu.data.npz_dataset import NPZSequenceDataset
    from unet_convlstm_tpu.eval.image_metrics import psnr, ssim
    from unet_convlstm_tpu.eval.rollout import rollout_scan
    from unet_convlstm_tpu.models.registry import build_model
    from unet_convlstm_tpu.ops.normalize import (normalize_x,
                                                  normalize_y)
    from unet_convlstm_tpu.train.loop import fit

    t0 = time.time()
    if not os.path.exists(args.npz):
        # reference contract: 2 digits, 64², T=40, vx target channel
        data = generate_moving_mnist(seq_len=40, num_samples=args.samples,
                                     image_size=64, num_digits=2,
                                     digits=synthetic_digit_bank(), seed=0)
        X, Y = moving_mnist_to_xy(data)
        del data
        if args.mmap:
            # uncompressed: ~10 GB at N=10000 — zlib would add minutes
            # for bytes the mmap sidecars duplicate anyway
            np.savez(args.npz, X=X, Y=Y)
        else:
            np.savez_compressed(args.npz, X=X, Y=Y)
        print(f"wrote {args.npz} X{X.shape} Y{Y.shape}", flush=True)
        del X, Y

    n_generations = 0
    if args.epochs_per_proc:
        # process-generation training (leak-bounded; module docstring)
        done = 0
        while done < args.epochs:
            target = min(done + args.epochs_per_proc, args.epochs)
            cmd = [sys.executable, "-u", os.path.abspath(__file__),
                   "--child-fit", "--npz", args.npz,
                   "--epochs", str(target),
                   "--batch-size", str(args.batch_size),
                   "--ckpt-dir", args.ckpt_dir]
            if args.mmap:
                cmd.append("--mmap")
            print(f"[T40] generation {n_generations}: epochs "
                  f"{done + 1}..{target}", flush=True)
            rc = subprocess.call(cmd)
            if rc != 0:
                raise RuntimeError(
                    f"generation {n_generations} failed rc={rc}")
            done = target
            n_generations += 1
        # assemble history from the persistent per-epoch log
        with open(os.path.join(args.ckpt_dir, "history.csv"),
                  newline="") as f:
            hist = [{k: float(v) for k, v in row.items() if v != ""}
                    for row in csv.DictReader(f)]
        hist = [h for h in hist if "val_mae" in h]
        from unet_convlstm_tpu.train.checkpoint import restore_checkpoint

        state, _ = restore_checkpoint(
            os.path.join(args.ckpt_dir, "custom_last"))
        ds = NPZSequenceDataset(args.npz, mmap=args.mmap)
        best_val_loss = min(float(h["val_loss"]) for h in hist)
    else:
        cfg = _train_config(args, args.epochs, "")
        ds = NPZSequenceDataset(args.npz, mmap=args.mmap)
        res = fit(cfg, dataset=ds)
        hist = [h for h in res["history"] if "val_mae" in h]
        state = res["state"]
        best_val_loss = res["best_val_loss"]
    best = min(hist, key=lambda h: float(h["val_mae"]))

    # streaming rollout over 16 val sequences at full T=40 depth;
    # PSNR/SSIM on normalized targets ([-1,1] → data_range 2), matching
    # the T=10 goldens' convention (results/mnist_golden*.json)
    _, val_idx = ds.train_val_split(0.8, 42)
    idx = np.asarray(val_idx[:16])
    x_raw, y_raw = ds.get_batch_raw(idx)
    _, _, apply_fn, init_state = build_model(dict(MODEL_CFG))
    x = normalize_x(np.asarray(x_raw), ds.stats)
    y = normalize_y(np.asarray(y_raw), ds.stats)
    variables = {"params": state["params"], "stats": state["stats"]}
    y_pred, _ = rollout_scan(apply_fn, variables, x, init_state)
    p = float(psnr(y_pred, y, data_range=2.0))
    s = float(ssim(y_pred, y, data_range=2.0))

    out = {
        "config": "mnist64_seq40_small_convlstm_unet"
                  f"_b{args.batch_size}_{args.epochs}ep",
        "contract": "reference digits/build_moving_mnist.py:61 seq_len=40, "
                    f"N={args.samples}" +
                    ("" if args.samples >= 10000
                     else " (subsampled for wall clock)"),
        "epochs": args.epochs,
        "samples": args.samples,
        "mmap": bool(args.mmap),
        "epochs_per_proc": args.epochs_per_proc,
        "process_generations": n_generations,
        "val_mae": float(best["val_mae"]),
        "val_rmse": float(best["val_rmse"]),
        "best_epoch": int(best["epoch"]),
        "final_val_mae": float(hist[-1]["val_mae"]),
        "rollout_psnr_db": p,
        "rollout_ssim": s,
        # rollout runs on the final/last-checkpoint weights;
        # pair it with final_val_mae, not the best-epoch val_mae
        "rollout_state": "final_epoch",
        "best_val_loss": best_val_loss,
        "wall_s": time.time() - t0,
        "history": hist,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "history"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
