"""Local encoder pretraining → frozen-feature export (VERDICT r3 #6).

The reference's flagship config freezes an ImageNet-pretrained ResNet18
encoder (reference main.py:213-214, train/resnet18.py:26-44
``encoder_weights="imagenet"``). No ImageNet asset exists in this image
and there is no network egress, so the *semantic* content of that config
— frozen NON-RANDOM features driving the temporal UNet — is demonstrated
with locally pretrained weights instead:

1. Train the JAX ResNet18-UNet end-to-end on a **held-out synthetic cloud
   corpus** (cloud-gate pipeline at production geometry, ``--seed 7`` —
   disjoint from the seed-0 corpus every golden uses).
2. Export its encoder as a torchvision-format ``.pth``
   (``utils.save_resnet18_encoder_pth``) — the exact artifact class
   ``pretrained_path`` consumes (round-trip bit-exactness tested in
   tests/test_resnet_unet.py).

Then the transfer gate (run separately, compares against the r3
encoder-trained golden 0.131):

    python -m unet_convlstm_tpu cloud-gate --work-dir /tmp/gate_resnet_T12 \
        --production --model-family resnet18 --seq-len 12 --n-folders 16 \
        --n-samples 16 --epochs 30 --pretrained-path <out.pth> \
        --freeze-encoder --out results/cloud_resnet_frozen_r4_T12.json

Usage: python scripts/pretrain_encoder.py [--epochs N] [--out PTH]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/gate_pretrain_seed7")
    ap.add_argument("--seed", type=int, default=7,
                    help="cloud-synthesis seed (must differ from the "
                         "transfer gate's 0)")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--out", default="/tmp/pretrained_encoder_seed7.pth")
    ap.add_argument("--result-json",
                    default="results/encoder_pretrain_seed7.json")
    args = ap.parse_args()

    from unet_convlstm_tpu.train.cloud_gate import (PRODUCTION,
                                                    run_cloud_gate)
    from unet_convlstm_tpu.train.checkpoint import restore_checkpoint
    from unet_convlstm_tpu.utils.torch_weights import (
        save_resnet18_encoder_pth)

    ckdir = os.path.join(args.work_dir, "ck")
    cfg = dataclasses.replace(
        PRODUCTION, model_family="resnet18", seed=args.seed,
        seq_len=12, n_folders=16, n_samples=16, epochs=args.epochs,
        checkpoint_dir=ckdir)
    res = run_cloud_gate(args.work_dir, cfg,
                         reuse_dataset=os.path.isdir(args.work_dir))

    state, meta = restore_checkpoint(os.path.join(ckdir, "resnet18_best"))
    variables = {"params": state["params"], "stats": state["stats"]}
    save_resnet18_encoder_pth(variables, args.out)
    record = {
        "pretrain_seed": args.seed,
        "pretrain_epochs": args.epochs,
        "pretrain_best_val_mae": res["best_val_mae"],
        "pretrain_best_epoch": res["best_epoch"],
        "pretrain_passed": res["passed"],
        "checkpoint_epoch": meta.get("epoch"),
        "encoder_pth": args.out,
        "pth_bytes": os.path.getsize(args.out),
    }
    os.makedirs(os.path.dirname(args.result_json) or ".", exist_ok=True)
    with open(args.result_json, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
