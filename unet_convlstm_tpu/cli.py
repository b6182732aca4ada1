"""Command-line interface — the reference's entry-point surface, unified.

Reference entry points → subcommands:

* ``train``          — main.py (config-driven training)
* ``evaluate``       — train/get_metrics.py (checkpoint → metric suite +
                       figures; replays the training val split)
* ``rollout``        — test.py (one sequence → streaming rollout + dashboard
                       video + per-frame stats)
* ``overfit``        — train/overfit_check.py (16-sequence memorization gate)
* ``gen-mnist``      — digits/build_moving_mnist.py
* ``gen-patches``    — preprocessing/preprocessing.py (stage A)
* ``gen-renders``    — mitsuba3/render_all.py (stage B)
* ``gen-maps``       — preprocessing/build_WVU_maps.py (stage C)
* ``gen-sequences``  — preprocessing/build_sequences.py (stage D)
* ``stats``          — get_data_min_max.py
* ``bench``          — the frames/sec benchmark (bench.py)

Everything is config-dataclass + ``key=value`` overrides instead of the
reference's edit-in-place constants (SURVEY.md §5 config system).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List


def _parse_overrides(pairs: List[str]) -> Dict[str, str]:
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"override {p!r} is not key=value")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def cmd_train(args):
    from .train.config import TrainConfig
    from .train.loop import fit

    if args.config:
        with open(args.config) as f:
            cfg = TrainConfig.from_dict(json.load(f))
    else:
        cfg = TrainConfig()
    cfg = cfg.apply_overrides(_parse_overrides(args.overrides))
    if args.npz:
        cfg.npz_path = args.npz
    if not cfg.npz_path:
        raise SystemExit("need --npz or npz_path in the config")
    result = fit(cfg, profile_dir=args.profile_dir,
                 resume_from=args.resume)
    print(f"best val loss: {result['best_val_loss']:.6f}")


def _load_checkpoint_for_eval(ckpt_path: str):
    from .models.registry import build_model
    from .ops.normalize import NormStats
    from .train.checkpoint import restore_checkpoint

    state, meta = restore_checkpoint(ckpt_path)
    model_cfg = meta["config"].get("model", meta["config"])
    _, _, apply_fn, init_state = build_model(model_cfg)
    variables = {"params": state["params"], "stats": state["stats"]}
    norm_stats = (NormStats.from_dict(meta["norm_stats"])
                  if "norm_stats" in meta else None)
    return variables, apply_fn, init_state, meta, norm_stats


def cmd_evaluate(args):
    import numpy as np

    from .data.npz_dataset import NPZSequenceDataset
    from .eval.metrics import evaluate_model
    from .viz.figures import save_metrics_figures

    variables, apply_fn, _, meta, norm_stats = _load_checkpoint_for_eval(
        args.checkpoint)
    if args.int8:
        from .ops.quant import quantize_tree
        variables = quantize_tree(variables)
    mesh = None
    if getattr(args, "mesh_data", 1) > 1:
        import functools

        from .parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data)
        # batch-major flatten: collective-free forward under the sharded
        # batch axis (models/layout.py)
        apply_fn = functools.partial(apply_fn, flat_layout="batch")
    dataset = NPZSequenceDataset(args.npz, stats=norm_stats)
    indices = None
    if args.split == "all":
        indices = np.arange(len(dataset))
    # replay the TRAINING split exactly (its seed/frac live in the config)
    train_cfg = meta.get("config", {})
    if args.int8 and getattr(args, "int8_calib", 0) > 0:
        from .ops.normalize import normalize_x
        from .ops.quant import calibrate_tree

        tr_idx, _ = dataset.train_val_split(
            train_cfg.get("train_frac", 0.8),
            train_cfg.get("split_seed", 42))
        nb = args.int8_calib
        bs = min(args.batch_size, len(tr_idx))
        calib = []
        for i in range(nb):
            lo = (i * bs) % max(len(tr_idx) - bs + 1, 1)
            xb, _ = dataset.get_batch_raw(np.asarray(tr_idx[lo:lo + bs]))
            calib.append(np.asarray(normalize_x(np.asarray(xb),
                                                dataset.stats)))
        variables = calibrate_tree(apply_fn, variables, calib)
        print(f"int8: calibrated static activation scales on {nb} "
              f"train batches (B={bs})")
    report = evaluate_model(apply_fn, variables, dataset, indices=indices,
                            batch_size=args.batch_size,
                            use_mask=args.use_mask,
                            train_frac=train_cfg.get("train_frac", 0.8),
                            split_seed=train_cfg.get("split_seed", 42),
                            mesh=mesh)
    print(f"MAE={report.mae:.4f}  RMSE={report.rmse:.4f}  "
          f"bias={report.bias:+.4f}  err_std={report.err_std:.4f} [m/s]")
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report.to_dict(), f, indent=2)
    written = save_metrics_figures(report, args.out_dir)
    print(f"figures: {', '.join(sorted(written))} -> {args.out_dir}")


def cmd_rollout(args):
    import numpy as np
    import jax.numpy as jnp

    from .data.npz_dataset import NPZSequenceDataset
    from .eval.rollout import rollout_scan
    from .ops.normalize import compute_mask, denormalize_y, normalize_x
    from .viz.rollout_video import create_rollout_video

    variables, apply_fn, init_state, meta, norm_stats = (
        _load_checkpoint_for_eval(args.checkpoint))
    if args.int8:
        from .ops.quant import quantize_tree
        variables = quantize_tree(variables)
    dataset = NPZSequenceDataset(args.npz, stats=norm_stats)
    x_raw, y_raw = dataset.get_batch_raw(np.array([args.sequence_idx]))
    s = dataset.stats
    x = normalize_x(jnp.asarray(x_raw), s)
    # offline whole-sequence rollout: one device dispatch (lax.scan over T)
    y_pred, _ = rollout_scan(apply_fn, variables, x, init_state)
    pred_d = np.asarray(denormalize_y(np.asarray(y_pred, np.float32), s))
    gt_d = np.asarray(dataset.denormalize(
        np.asarray(dataset[args.sequence_idx][1])))
    mask = np.asarray(compute_mask(jnp.asarray(x_raw), s))
    stats = create_rollout_video(
        x_raw[0], gt_d[:, 0], pred_d[0, ..., 0], mask[0, ..., 0],
        args.out, fps=args.fps, csv_path=args.csv,
        per_frame_pdf_dir=args.pdf_dir)
    print(f"video -> {args.out}; last-frame MAE={stats['mae'][-1]:.4f} "
          f"RMSE={stats['rmse'][-1]:.4f} ME={stats['me'][-1]:+.4f}")


def cmd_overfit(args):
    from .train.overfit import run_overfit_test

    model_cfg = {"type": args.model_type, "base_ch": args.base_ch,
                 "use_skip_lstm": True, "use_attention": False}
    if args.model_type == "resnet18":
        model_cfg = {"type": "resnet18", "freeze_encoder": True,
                     "lstm_layers": 1}
    res = run_overfit_test(args.npz, model_cfg,
                           num_samples=args.num_samples,
                           max_iters=args.max_iters,
                           checkpoint_dir=args.out_dir)
    status = "SUCCESS" if res["converged"] else "DID NOT CONVERGE"
    print(f"[{status}] loss={res['final_loss']:.6f} after "
          f"{res['iters']} iters on indices "
          f"{sorted(int(i) for i in res['indices'])}")
    sys.exit(0 if res["converged"] else 1)


def cmd_gen_mnist(args):
    from .data.moving_mnist import save_moving_mnist_npz

    path = save_moving_mnist_npz(args.out, seq_len=args.seq_len,
                                 num_samples=args.num_samples,
                                 image_size=args.image_size,
                                 num_digits=args.num_digits,
                                 seed=args.seed, as_xy=args.xy)
    print(f"wrote {path}")


def cmd_gen_patches(args):
    from .datagen.lespatch import process_all_nc_files

    results = process_all_nc_files(args.input, args.output,
                                   start_from=args.start, end_at=args.end)
    total = sum(results.values())
    print(f"{len(results)} files -> {total} patches")


def cmd_gen_renders(args):
    from .datagen.render_batch import render_dataset

    batch, mesh = _datagen_mesh(args)
    n = render_dataset(args.input, args.output, args.csv,
                       resolution=(args.res, args.res), fov_deg=args.fov,
                       g=args.g, start=args.start, end=args.end,
                       ms_orders=args.ms_orders,
                       ms_calibrate_spp=args.ms_calibrate_spp,
                       mc_spp=args.mc_spp,
                       mc_max_depth=args.mc_max_depth,
                       mc_seed=args.mc_seed,
                       mc_majorant_cell=args.mc_majorant_cell,
                       mc_spp_chunk=args.mc_spp_chunk,
                       batch_size=batch, mesh=mesh)
    print(f"wrote {n} render pkls")


def _datagen_mesh(args):
    """Resolve the shared --batch/--data-parallel flags of the datagen
    drivers into (batch_size, mesh)."""
    mesh, batch = None, args.batch
    if args.data_parallel:
        import jax
        from jax.sharding import Mesh
        import numpy as np

        devs = jax.devices()
        mesh = Mesh(np.array(devs), ("data",))
        if batch == 1:
            batch = len(devs)  # one patch per device per dispatch
    return batch, mesh


def cmd_gen_maps(args):
    from .datagen.velocity_maps import build_velocity_maps

    batch, mesh = _datagen_mesh(args)
    n = build_velocity_maps(args.input, args.output, args.csv,
                            mode=args.mode,
                            resolution=(args.res, args.res),
                            slice_height_m=args.slice_height,
                            use_fixed_camera=not args.csv_cameras,
                            start=args.start, end=args.end,
                            batch_size=batch, mesh=mesh)
    print(f"wrote {n} map pkls")


def cmd_gen_sequences(args):
    from .datagen.sequences import build_trajectory_sequences

    out = build_trajectory_sequences(
        args.images, args.maps, args.out, seq_len=args.seq_len,
        num_samples=args.num_samples, map_type=args.map_type,
        map_suffix=args.map_suffix)
    print(f"wrote {out}")


def cmd_stats(args):
    from .viz.checks import dataset_stats

    stats = dataset_stats(args.npz, args.key, args.out_dir)
    print(json.dumps(stats, indent=2))


def cmd_inspect(args):
    """Key/shape/stats browser for pipeline artifacts — the reference's
    read_pkl.py / read_nc.py inspection scripts as one subcommand."""
    from .viz.viewers import describe_nc, describe_pkl

    # Dispatch on content, not extension: NetCDF-4 is an HDF5 container
    # (magic \x89HDF), and .nc4/.NC spellings exist in the wild.
    with open(args.path, "rb") as f:
        magic = f.read(8)
    if magic.startswith(b"\x89HDF"):
        desc = describe_nc(args.path)
    elif magic.startswith(b"CDF"):
        raise SystemExit(
            f"{args.path} is classic NetCDF-3; this image reads NetCDF-4 "
            "(HDF5) files only — BOMEX LES outputs are NetCDF-4")
    else:
        desc = describe_pkl(args.path)
    print(json.dumps(desc, indent=2, default=str))


def cmd_convert_checkpoint(args):
    """Migrate a reference torch checkpoint ({model_state, config, ...},
    reference main.py:307-323) into this framework's checkpoint format —
    or, with --to-torch, export one of OUR checkpoints back into the
    reference's .pt format (strict-loadable by reference train/unet.py)."""
    import torch

    from .train.checkpoint import save_checkpoint
    from .utils.torch_weights import (
        convert_pretrained_temporal_unet_checkpoint,
        convert_temporal_unet_checkpoint,
        export_temporal_unet_checkpoint,
    )

    if args.quantize:
        if not args.checkpoint:
            raise SystemExit("--quantize requires --checkpoint <our ckpt>")
        from .ops.quant import quantize_tree
        from .train.checkpoint import restore_checkpoint

        state, meta = restore_checkpoint(args.checkpoint)
        qv = quantize_tree({"params": state["params"]})
        meta = dict(meta)
        meta["int8"] = True
        out = os.path.abspath(args.quantize.rstrip("/"))
        save_checkpoint(os.path.dirname(out), os.path.basename(out),
                        {"params": qv["params"], "stats": state["stats"]},
                        meta, wait=True)
        print(f"quantized {args.checkpoint} -> {out} (int8 conv kernels; "
              "evaluate/rollout/serve load it directly — the conv ops "
              "dispatch on the quantized leaves, no flag needed)")
        return

    if args.to_torch:
        import numpy as np

        if not args.checkpoint:
            raise SystemExit("--to-torch requires --checkpoint <our ckpt>")
        from .train.checkpoint import restore_checkpoint

        state, meta = restore_checkpoint(args.checkpoint)
        cfg = meta.get("config", {})
        model_cfg = cfg.get("model", cfg)
        model_type = model_cfg.get("type", "custom")
        variables = {"params": state["params"], "stats": state["stats"]}
        if model_type == "custom":
            sd = export_temporal_unet_checkpoint(variables)
            out_cfg = {"type": "custom",
                       **{k: model_cfg[k] for k in
                          ("base_ch", "lstm_layers", "use_skip_lstm",
                           "use_attention") if k in model_cfg}}
        elif model_type == "resnet18":
            from .utils.torch_weights import (
                export_pretrained_temporal_unet_checkpoint)

            sd = export_pretrained_temporal_unet_checkpoint(variables)
            out_cfg = {"type": "resnet18",
                       **{k: model_cfg[k] for k in
                          ("lstm_layers", "freeze_encoder", "in_channels")
                          if k in model_cfg}}
        else:
            raise SystemExit(f"--to-torch: unknown model type "
                             f"{model_type!r}")
        torch.save({
            "model_state": {k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()},
            "config": out_cfg,
            "val_loss": meta.get("val_loss"),
            "epoch": meta.get("epoch", 0),
        }, args.to_torch)
        print(f"exported {args.checkpoint} -> {args.to_torch} "
              "(reference main.py checkpoint format)")
        return

    if not args.torch_ckpt:
        raise SystemExit("--torch-ckpt is required (or use --checkpoint "
                         "with --to-torch for the reverse direction)")
    # Reference checkpoints hold only tensors + plain dicts
    # (main.py:307-323); weights_only keeps third-party .pt files from
    # executing arbitrary pickle code through this migration tool.
    try:
        ckpt = torch.load(args.torch_ckpt, map_location="cpu",
                          weights_only=True)
    except Exception as e:
        print(f"WARNING: safe (weights_only) load failed ({e}); "
              "falling back to full unpickling — only do this for "
              "checkpoints you trust.")
        ckpt = torch.load(args.torch_ckpt, map_location="cpu",
                          weights_only=False)
    sd = ckpt.get("model_state", ckpt)
    cfg = ckpt.get("config", {"type": args.model_type})
    model_type = cfg.get("type", args.model_type)
    cfg = dict(cfg)
    if model_type == "custom":
        variables = convert_temporal_unet_checkpoint(sd)
        # The weights are ground truth for the architecture flags: a raw
        # state_dict (no config blob) or a minimal config would otherwise
        # be rebuilt with the registry's production defaults
        # (use_skip_lstm=True, base_ch=64 — registry.py:30-33) and fail
        # at apply time with missing/mismatched params.
        structural = {
            "use_skip_lstm": "lstm_skip3.layers.0.conv.weight" in sd,
            "use_attention": "attention.conv.weight" in sd,
            "lstm_layers": sum(
                1 for k in sd
                if k.startswith("temporal.layers.") and
                k.endswith(".conv.weight")),
            "base_ch": int(sd["inc.net.0.weight"].shape[0]),
            # the first conv sees in_channels_per_sat*2 stacked satellite
            # channels (reference unet.py:134); the 1x1 head carries the
            # output-channel count (w vs wvu family, unet.py:159)
            "in_channels_per_sat": int(sd["inc.net.0.weight"].shape[1]) // 2,
            "out_channels": int(sd["outc.conv.weight"].shape[0]),
        }
        for k, v in structural.items():
            if k in cfg and cfg[k] != v:
                print(f"WARNING: checkpoint config says {k}={cfg[k]} but "
                      f"the weights say {k}={v}; trusting the weights")
            cfg[k] = v
    elif model_type == "resnet18":
        variables = convert_pretrained_temporal_unet_checkpoint(sd)
    else:
        raise SystemExit(f"unknown model type {model_type!r}")
    state = {"params": variables["params"], "stats": variables["stats"]}
    meta = {"config": cfg,
            "val_loss": float(ckpt.get("val_loss", float("nan"))),
            "epoch": int(ckpt.get("epoch", 0)),
            "converted_from": os.path.abspath(args.torch_ckpt)}
    path = save_checkpoint(args.out_dir, f"{model_type}_converted", state,
                           meta, wait=True)
    print(f"converted {args.torch_ckpt} -> {path}")


def cmd_cloud_gate(args):
    """Thresholded synthetic-cloud acceptance run over the full B/C/D +
    training pipeline (see train/cloud_gate.py)."""
    import dataclasses

    from .train.cloud_gate import (PRODUCTION, PRODUCTION_WVU,
                                   CloudGateConfig, run_cloud_gate)

    cfg = PRODUCTION if args.production else CloudGateConfig()
    if args.wvu:
        cfg = (PRODUCTION_WVU if args.production else
               dataclasses.replace(cfg, map_type="wvu", use_mask=True))
    if args.ms_orders != 1 or args.ms_calibrate_spp:
        cfg = dataclasses.replace(cfg, ms_orders=args.ms_orders,
                                  ms_calibrate_spp=args.ms_calibrate_spp)
    if args.mc_spp:
        cfg = dataclasses.replace(cfg, mc_spp=args.mc_spp,
                                  mc_majorant_cell=args.mc_majorant_cell,
                                  mc_spp_chunk=args.mc_spp_chunk)
    if args.render_batch != 1:
        cfg = dataclasses.replace(cfg, render_batch_size=args.render_batch)
    if args.from_nc:
        cfg = dataclasses.replace(cfg, from_nc=True)
    if args.model_family != "custom":
        cfg = dataclasses.replace(cfg, model_family=args.model_family)
    # geometry overrides (reference temporal depth: seq_len=12 folders of
    # 49 samples, build_sequences.py:15-16 — the defaults keep gates cheap,
    # these knobs run them at the real dataset contract)
    for knob in ("seq_len", "n_folders", "n_samples", "epochs",
                 "batch_size", "seed"):
        v = getattr(args, knob)
        if v is not None:
            cfg = dataclasses.replace(cfg, **{knob: v})
    # pretrain→freeze transfer knobs (train/cloud_gate.py docstrings)
    if args.checkpoint_dir:
        cfg = dataclasses.replace(cfg, checkpoint_dir=args.checkpoint_dir)
    if args.pretrained_path:
        cfg = dataclasses.replace(cfg, pretrained_path=args.pretrained_path)
    if args.freeze_encoder:
        cfg = dataclasses.replace(cfg, freeze_encoder=True)
    res = run_cloud_gate(args.work_dir, cfg, out_json=args.out,
                         reuse_dataset=args.reuse_dataset)
    raise SystemExit(0 if res["passed"] else 1)


def cmd_doctor(args):
    """Environment self-check (no reference counterpart — ops tooling for
    the TPU deployment surface): library versions, native hostio build,
    a BOUNDED device probe in a subprocess (a wedged accelerator tunnel
    reports UNREACHABLE instead of hanging the shell), and the virtual
    multi-device CPU mesh the test suite and dryrun depend on."""
    import subprocess
    import sys

    failures = []

    def check(name, ok, detail=""):
        print(f"[{'PASS' if ok else 'FAIL'}] {name}" +
              (f": {detail}" if detail else ""))
        if not ok:
            failures.append(name)

    import jax
    import numpy as np
    print(f"python {sys.version.split()[0]}  jax {jax.__version__}  "
          f"numpy {np.__version__}")

    from .native.build import load_hostio
    check("native hostio kernels", load_hostio() is not None,
          "C++ build or cached .so")

    probe = ("import jax\n"
             + ("jax.config.update('jax_platforms', 'cpu')\n"
                if args.platform == "cpu" else "")
             + "import jax.numpy as jnp\n"
               "d = jax.devices()\n"
               "x = jnp.ones((128, 128))\n"
               "print('PROBE_OK', d[0].platform, float((x @ x).sum()))\n")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, text=True,
                           timeout=args.device_timeout)
        ok = "PROBE_OK" in r.stdout
        check("device probe (compile + execute)", ok,
              r.stdout.strip().splitlines()[-1] if ok else
              (r.stderr.strip().splitlines() or ["no output"])[-1])
    except subprocess.TimeoutExpired:
        check("device probe (compile + execute)", False,
              f"TIMED OUT after {args.device_timeout}s — backend "
              "unreachable (wedged tunnel / dead worker?)")

    mesh_probe = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') + "
        "' --xla_force_host_platform_device_count=8').strip()\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "print('MESH_OK', len(jax.devices()))\n")
    try:
        r = subprocess.run([sys.executable, "-c", mesh_probe],
                           capture_output=True, text=True, timeout=120)
        check("virtual 8-device CPU mesh", "MESH_OK 8" in r.stdout,
              r.stdout.strip() or r.stderr.strip().splitlines()[-1:])
    except subprocess.TimeoutExpired:
        check("virtual 8-device CPU mesh", False, "timed out")

    import tempfile
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    if cache:
        try:
            with tempfile.NamedTemporaryFile(dir=cache):
                pass
            check("compile cache writable", True, cache)
        except OSError as e:
            check("compile cache writable", False, str(e))

    if failures:
        raise SystemExit(f"doctor: {len(failures)} check(s) failed: "
                         + ", ".join(failures))
    print("doctor: all checks passed")


def cmd_bench(_args):
    from .benchmark import main as bench_main

    raise SystemExit(bench_main([]))


def cmd_serve(args):
    """Stateful streaming-inference HTTP server (serve.py). The reference
    has no serving path; its rollout re-runs the whole prefix per frame
    (test.py:305-316)."""
    from .serve import run_server

    warmup = None
    if args.warmup:
        b, h, w = (int(v) for v in args.warmup.split("x"))
        warmup = (b, h, w)
    calib_frames = None
    if args.int8 and getattr(args, "int8_calib_npz", ""):
        import numpy as np

        from .data.npz_dataset import NPZSequenceDataset

        ds = NPZSequenceDataset(args.int8_calib_npz)
        n = min(args.int8_calib, len(ds))
        # raw frame blocks; StreamingPredictor normalizes with ITS
        # checkpoint manifest before calibrating
        calib_frames = [ds.get_batch_raw(np.asarray([i]))[0]
                        for i in range(n)]
    run_server(args.checkpoint, args.host, args.port, warmup=warmup,
               int8=args.int8, int8_calib_frames=calib_frames)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="unet_convlstm_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a model (reference main.py)")
    t.add_argument("--config", help="JSON TrainConfig file")
    t.add_argument("--npz", help="dataset npz path")
    t.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of steps 10-20")
    t.add_argument("--resume", default=None,
                   help="checkpoint dir to resume from (true resume: "
                        "optimizer + scheduler + epoch restored)")
    t.add_argument("overrides", nargs="*",
                   help="key=value config overrides (model.base_ch=32)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("evaluate",
                       help="metric suite (reference get_metrics.py)")
    e.add_argument("--checkpoint", required=True)
    e.add_argument("--npz", required=True)
    e.add_argument("--out-dir", default="eval_out")
    e.add_argument("--batch-size", type=int, default=8)
    e.add_argument("--use-mask", action="store_true")
    e.add_argument("--split", choices=["val", "all"], default="val")
    e.add_argument("--int8", action="store_true",
                   help="post-training int8 inference (ops/quant.py): "
                        "int8 MXU convs, ~2x batch throughput where bf16 "
                        "saturates the MXU; metrics shift by quantization "
                        "noise only")
    e.add_argument("--int8-calib", type=int, default=0, metavar="N",
                   help="with --int8: calibrate static per-conv activation "
                        "scales on N train-split batches before evaluating "
                        "(removes the dynamic amax passes; conv inputs "
                        "reach HBM at int8 width — ops/quant.py)")
    e.add_argument("--mesh-data", type=int, default=1,
                   help="data-parallel offline evaluation: shard each "
                        "eval batch over an N-device 'data' mesh (the "
                        "on-device metric reductions become psums; the "
                        "report is identical to the single-device pass). "
                        "batch-size must be divisible by N")
    e.set_defaults(fn=cmd_evaluate)

    r = sub.add_parser("rollout", help="rollout video (reference test.py)")
    r.add_argument("--checkpoint", required=True)
    r.add_argument("--npz", required=True)
    r.add_argument("--sequence-idx", type=int, default=2000)
    r.add_argument("--out", default="rollout.mp4")
    r.add_argument("--fps", type=int, default=2)
    r.add_argument("--csv", default=None, help="overpass CSV for geometry")
    r.add_argument("--pdf-dir", default=None)
    r.add_argument("--int8", action="store_true",
                   help="post-training int8 inference (see evaluate)")
    r.set_defaults(fn=cmd_rollout)

    o = sub.add_parser("overfit",
                       help="memorization gate (reference overfit_check.py)")
    o.add_argument("--npz", required=True)
    o.add_argument("--model-type", choices=["custom", "resnet18"],
                   default="custom")
    o.add_argument("--base-ch", type=int, default=64)
    o.add_argument("--num-samples", type=int, default=16)
    o.add_argument("--max-iters", type=int, default=3001)
    o.add_argument("--out-dir", default="checkpoints")
    o.set_defaults(fn=cmd_overfit)

    m = sub.add_parser("gen-mnist",
                       help="Moving-MNIST npz (reference build_moving_mnist)")
    m.add_argument("--out", default="moving_mnist_2dig_40seq.npz")
    m.add_argument("--seq-len", type=int, default=40)
    m.add_argument("--num-samples", type=int, default=10000)
    m.add_argument("--image-size", type=int, default=64)
    m.add_argument("--num-digits", type=int, default=2)
    m.add_argument("--seed", type=int, default=None)
    m.add_argument("--xy", action="store_true",
                   help="write X/Y training layout instead of 'data'")
    m.set_defaults(fn=cmd_gen_mnist)

    gp = sub.add_parser("gen-patches", help="stage A: netCDF -> patches")
    gp.add_argument("--input", required=True)
    gp.add_argument("--output", required=True)
    gp.add_argument("--start", type=int, default=None)
    gp.add_argument("--end", type=int, default=None)
    gp.set_defaults(fn=cmd_gen_patches)

    gr = sub.add_parser("gen-renders", help="stage B: patches -> radiance")
    gr.add_argument("--input", required=True)
    gr.add_argument("--output", required=True)
    gr.add_argument("--csv", required=True)
    gr.add_argument("--res", type=int, default=256)
    gr.add_argument("--fov", type=float, default=0.115)
    gr.add_argument("--g", type=float, default=0.85)
    gr.add_argument("--start", type=int, default=None)
    gr.add_argument("--end", type=int, default=None)
    gr.add_argument("--batch", type=int, default=1,
                    help="patches per dispatch (one vmapped SPMD program)")
    gr.add_argument("--data-parallel", action="store_true",
                    help="shard the patch batch over all devices "
                         "(jax.sharding mesh; implies --batch n_devices)")
    gr.add_argument("--ms-orders", type=int, default=1,
                    help="successive-order multiple scattering for the "
                         "deterministic renderer (1 = single scatter)")
    gr.add_argument("--ms-calibrate-spp", type=int, default=0,
                    help="> 0: calibrate each patch's diffuse term "
                         "against one MC reference view at this spp "
                         "(requires --ms-orders > 1)")
    gr.add_argument("--mc-spp", type=int, default=0,
                    help="> 0: Monte-Carlo path tracing at this spp "
                         "(volpath-class transport; reference uses "
                         "spp 8192, render_all.py:28-30)")
    gr.add_argument("--mc-max-depth", type=int, default=64,
                    help="MC: max real scattering events per path")
    gr.add_argument("--mc-seed", type=int, default=0,
                    help="MC: base seed (per-view seeds derive from it "
                         "deterministically)")
    gr.add_argument("--mc-majorant-cell", type=int, default=0,
                    help="MC: super-voxel majorant grid edge (voxels); "
                         "2.5x on dense-compact patches, changes the "
                         "RNG realization (0 = global majorant)")
    gr.add_argument("--mc-spp-chunk", type=int, default=0,
                    help="MC: samples per dispatch (same realization; "
                         "bounds single-kernel device time; 0 = all spp "
                         "in one dispatch)")
    gr.set_defaults(fn=cmd_gen_renders)

    gm = sub.add_parser("gen-maps", help="stage C: patches -> velocity maps")
    gm.add_argument("--input", required=True)
    gm.add_argument("--output", required=True)
    gm.add_argument("--csv", required=True)
    gm.add_argument("--mode", choices=["slice", "first_hit"],
                    default="slice")
    gm.add_argument("--res", type=int, default=256)
    gm.add_argument("--slice-height", type=float, default=1500.0)
    gm.add_argument("--csv-cameras", action="store_true",
                    help="use CSV camera positions instead of fixed nadir")
    gm.add_argument("--start", type=int, default=None)
    gm.add_argument("--end", type=int, default=None)
    gm.add_argument("--batch", type=int, default=1,
                    help="patches per dispatch (one vmapped SPMD program)")
    gm.add_argument("--data-parallel", action="store_true",
                    help="shard the patch batch over all devices "
                         "(jax.sharding mesh; implies --batch n_devices)")
    gm.set_defaults(fn=cmd_gen_maps)

    gs = sub.add_parser("gen-sequences",
                        help="stage D: renders+maps -> training npz")
    gs.add_argument("--images", required=True)
    gs.add_argument("--maps", required=True)
    gs.add_argument("--out", required=True)
    gs.add_argument("--seq-len", type=int, default=12)
    gs.add_argument("--num-samples", type=int, default=49)
    gs.add_argument("--map-type", default="w",
                    help="target channels: one or more of w/u/v; 'wvu' "
                         "builds the 3-channel target "
                         "(build_WVU_maps.py:161-174)")
    gs.add_argument("--map-suffix", default="slice_1500m",
                    help="suffix of the stage-C map pkls; the "
                         "default matches gen-maps' default "
                         "--slice-height 1500")
    gs.set_defaults(fn=cmd_gen_sequences)

    st = sub.add_parser("stats", help="dataset stats (get_data_min_max)")
    st.add_argument("--npz", required=True)
    st.add_argument("--key", default="Y")
    st.add_argument("--out-dir", default=None)
    st.set_defaults(fn=cmd_stats)

    ip = sub.add_parser("inspect", help="pkl/nc artifact browser "
                        "(read_pkl.py / read_nc.py)")
    ip.add_argument("path", help=".pkl or .nc file to summarize")
    ip.set_defaults(fn=cmd_inspect)

    cc = sub.add_parser("convert-checkpoint",
                        help="migrate a reference torch .pt checkpoint "
                             "(or export ours back with --to-torch)")
    cc.add_argument("--torch-ckpt", default=None,
                    help="reference .pt to import")
    cc.add_argument("--out-dir", default="checkpoints")
    cc.add_argument("--model-type", choices=["custom", "resnet18"],
                    default="custom",
                    help="fallback when the .pt has no embedded config")
    cc.add_argument("--checkpoint", default=None,
                    help="OUR checkpoint dir to export (with --to-torch)")
    cc.add_argument("--quantize", default=None, metavar="OUT_DIR",
                    help="write an int8-quantized copy of --checkpoint "
                         "(4x smaller conv kernels; loads directly into "
                         "evaluate/rollout/serve)")
    cc.add_argument("--to-torch", default=None, metavar="OUT.pt",
                    help="export --checkpoint to the reference's torch "
                         "checkpoint format")
    cc.set_defaults(fn=cmd_convert_checkpoint)

    b = sub.add_parser("bench", help="frames/sec benchmark")
    b.set_defaults(fn=cmd_bench)

    cg = sub.add_parser("cloud-gate",
                        help="thresholded synthetic-cloud acceptance run "
                             "(B/C/D pipeline + training)")
    cg.add_argument("--work-dir", required=True)
    cg.add_argument("--out", default=None, help="result json path")
    cg.add_argument("--production", action="store_true",
                    help="production geometry (128², base_ch 64; TPU)")
    cg.add_argument("--wvu", action="store_true",
                    help="3-channel u/v/w target (cloud_wvu.json family)")
    cg.add_argument("--ms-orders", type=int, default=1,
                    help="stage-B successive-order scattering")
    cg.add_argument("--ms-calibrate-spp", type=int, default=0,
                    help="stage-B MC energy calibration spp "
                         "(requires --ms-orders > 1)")
    cg.add_argument("--mc-spp", type=int, default=0,
                    help="stage B renders with the unbiased MC path "
                         "tracer at this spp (the volpath-class training "
                         "distribution; excludes --ms-orders)")
    cg.add_argument("--mc-majorant-cell", type=int, default=16,
                    help="MC: super-voxel majorant grid edge (voxels); "
                         "only with --mc-spp (0 = global majorant)")
    cg.add_argument("--mc-spp-chunk", type=int, default=8,
                    help="MC: samples per dispatch (bounds single-kernel "
                         "device time; 0 = all spp in one dispatch)")
    cg.add_argument("--from-nc", action="store_true", dest="from_nc",
                    help="start one stage earlier: synthesize BOMEX-layout"
                         " .nc snapshots and run the real L0 ingest "
                         "(lespatch 128/64 overlap tiling at production "
                         "geometry) instead of writing patch pkls directly"
                         " — the full .nc -> trained-model chain")
    cg.add_argument("--model-family", default="custom",
                    dest="model_family", choices=("custom", "resnet18"),
                    help="model family the gate trains: custom "
                         "(TemporalUNetDualView) or resnet18 "
                         "(PretrainedTemporalUNet, the reference driver's "
                         "default — main.py:213; encoder trained, no "
                         "ImageNet .pth exists in this image)")
    cg.add_argument("--render-batch", type=int, default=1,
                    help="stage-B patches per dispatch (one vmapped SPMD "
                         "program; amortizes dispatch on 1 chip)")
    cg.add_argument("--seq-len", type=int, default=None, dest="seq_len",
                    help="sequence length (reference contract: 12, "
                         "build_sequences.py:15)")
    cg.add_argument("--n-folders", type=int, default=None, dest="n_folders",
                    help="time folders (must be >= seq-len)")
    cg.add_argument("--n-samples", type=int, default=None, dest="n_samples",
                    help="patches per folder (reference: 49/chunk)")
    cg.add_argument("--epochs", type=int, default=None)
    cg.add_argument("--batch-size", type=int, default=None,
                    dest="batch_size")
    cg.add_argument("--seed", type=int, default=None,
                    help="cloud-synthesis seed (a different seed builds a "
                         "disjoint cloud corpus — used to hold out a "
                         "pretraining dataset)")
    cg.add_argument("--checkpoint-dir", default="", dest="checkpoint_dir",
                    help="save the gate's best checkpoint here (pretrain "
                         "flow: keep the trained weights for encoder "
                         "export)")
    cg.add_argument("--pretrained-path", default="",
                    dest="pretrained_path",
                    help="resnet18 family: local torchvision-format "
                         "encoder .pth to initialize from "
                         "(utils.save_resnet18_encoder_pth output or a "
                         "real ImageNet resnet18-*.pth)")
    cg.add_argument("--freeze-encoder", action="store_true",
                    dest="freeze_encoder",
                    help="resnet18 family: freeze the (pretrained) "
                         "encoder — the reference's frozen-ImageNet "
                         "configuration (main.py:213-214)")
    cg.add_argument("--reuse-dataset", action="store_true",
                    dest="reuse_dataset",
                    help="skip stages B/C/D when the work dir already "
                         "holds a dataset built with the same "
                         "dataset-shaping config (training-knob sweeps "
                         "cost seconds instead of re-rendering)")
    cg.set_defaults(fn=cmd_cloud_gate)

    sv = sub.add_parser("serve",
                        help="streaming-inference HTTP server (stateful "
                             "O(1)-per-frame sessions)")
    sv.add_argument("--checkpoint", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--warmup", default=None, metavar="BxHxW",
                    help="pre-compile for a geometry, e.g. 1x64x64")
    sv.add_argument("--int8", action="store_true",
                    help="post-training int8 inference (see evaluate)")
    sv.add_argument("--int8-calib-npz", default="", metavar="NPZ",
                    help="with --int8: calibrate static activation scales "
                        "on sequences from this dataset before serving "
                        "(removes the per-request dynamic amax passes — "
                        "ops/quant.py)")
    sv.add_argument("--int8-calib", type=int, default=4, metavar="N",
                    help="number of calibration sequence blocks to draw "
                        "from --int8-calib-npz (default 4)")
    sv.set_defaults(fn=cmd_serve)

    dr = sub.add_parser("doctor",
                        help="environment self-check (devices, native "
                             "build, virtual mesh) with bounded probes")
    dr.add_argument("--device-timeout", type=int, default=300,
                    help="seconds before the device probe is declared "
                         "unreachable (first TPU compile through a "
                         "tunnel can take minutes)")
    dr.add_argument("--platform", default=None,
                    choices=[None, "cpu"],
                    help="probe this platform instead of the default "
                         "backend (cpu = the test-suite configuration)")
    dr.set_defaults(fn=cmd_doctor)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # Persistent XLA compilation cache: repeat invocations of the same
    # program (gates, benches, resumed training) start warm instead of
    # paying a multi-minute tunnel recompile. Opt out:
    # UCT_NO_COMPILE_CACHE=1.
    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    try:
        args.fn(args)
    except BrokenPipeError:
        # stdout piped into a pager/head that exited — standard CLI
        # convention is a quiet exit, not a traceback
        import sys
        try:
            sys.stdout.close()
        except Exception:
            pass


if __name__ == "__main__":
    main()
