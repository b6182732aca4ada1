"""Library-level quickstart — the CLI's train→evaluate→rollout flow as
direct API calls (docs/API.md), for users embedding the framework instead
of shelling out. Mirrors the reference's main.py / get_metrics.py /
test.py trio (reference main.py:211-325) at toy geometry.

Run:  python examples/library_quickstart.py [--epochs 2] [--base-ch 8]
Finishes in ~1 min on CPU; on the TPU the same code just runs faster.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--base-ch", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--num-samples", type=int, default=48)
    ap.add_argument("--work-dir", default=None)
    args = ap.parse_args(argv)
    work = args.work_dir or tempfile.mkdtemp(prefix="uclt_quickstart_")
    os.makedirs(work, exist_ok=True)

    # 1. Data: the byte-identical Moving-MNIST analog task (reference
    #    digits/build_moving_mnist.py), already split into (X, Y).
    from unet_convlstm_tpu.data import (
        NPZSequenceDataset, save_moving_mnist_npz)

    npz = os.path.join(work, "mm.npz")
    save_moving_mnist_npz(npz, seq_len=6, num_samples=args.num_samples,
                          image_size=args.image_size,
                          num_digits=2, seed=3, as_xy=True)
    dataset = NPZSequenceDataset(npz)

    # 2. Model + config: the registry dispatches exactly like checkpoint
    #    loading does (reference get_metrics.py:67-90).
    from unet_convlstm_tpu.train import TrainConfig
    from unet_convlstm_tpu.train.loop import fit

    cfg = TrainConfig(npz_path=npz, epochs=args.epochs, batch_size=16,
                      checkpoint_dir=os.path.join(work, "ckpts"))
    cfg.model["base_ch"] = args.base_ch

    # 3. Train: fit() is the whole reference main-loop — jitted fused
    #    step, plateau LR, best/last checkpoints, history.csv.
    result = fit(cfg, dataset=dataset)
    best_ckpt = os.path.join(cfg.checkpoint_dir,
                             f"{cfg.model['type']}_best")
    print(f"best val loss {result['best_val_loss']:.4f} -> {best_ckpt}")

    # 4. Evaluate: replays the training split exactly (seed-42 80/20).
    from unet_convlstm_tpu.eval import evaluate_model
    from unet_convlstm_tpu.models.registry import build_model
    from unet_convlstm_tpu.ops.normalize import NormStats
    from unet_convlstm_tpu.train.checkpoint import restore_checkpoint

    state, meta = restore_checkpoint(best_ckpt)
    _, _, apply_fn, init_state = build_model(meta["config"]["model"])
    variables = {"params": state["params"], "stats": state["stats"]}
    ds_eval = NPZSequenceDataset(npz,
                                 stats=NormStats.from_dict(meta["norm_stats"]))
    report = evaluate_model(apply_fn, variables, ds_eval,
                            batch_size=16, use_mask=False)
    print(f"val MAE {report.mae:.4f}  RMSE {report.rmse:.4f} [m/s]")

    # 5. Streaming rollout: O(1) per frame via the carried state — the
    #    reference's test.py re-runs the whole prefix per frame, O(T^2).
    import jax.numpy as jnp

    x, _, _ = ds_eval[0]          # normalized, NCHW (reference contract)
    x_nhwc = np.moveaxis(x, 1, -1)  # models run channels-last on TPU
    from unet_convlstm_tpu.eval import rollout_streaming

    y_seq, _ = rollout_streaming(apply_fn, variables,
                                 jnp.asarray(x_nhwc)[None], init_state)
    print(f"rollout: {tuple(y_seq.shape)} frames streamed")
    print("QUICKSTART_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
