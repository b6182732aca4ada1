"""Offline evaluation suite — the reference's get_metrics.py computations.

Parity targets (reference train/get_metrics.py):

* Global denormalized MAE / RMSE / mean-error (bias) / error std over the
  validation split, masked or unmasked (:186-198).
* MAE as a function of time step (:280-314).
* GT / prediction / error histograms (:316-370).
* "Balanced scatter": ground truth digitized into 0.05 m/s bins over
  [-8, 8], at most 1000 points kept per bin (:55-58, 205-240).

TPU re-design: the reference runs batch-size-1 inference and keeps EVERY
pixel in host lists (:117-173). Here a jitted batch step reduces sums,
per-step sums and histogram counts on device; only the balanced-scatter
sampling pulls (a bounded random subset of) pixel values to host.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.npz_dataset import NPZSequenceDataset
from ..data.pipeline import SequenceLoader
from ..ops.normalize import compute_mask, denormalize_y, normalize_x, normalize_y


@dataclasses.dataclass
class EvalReport:
    mae: float
    rmse: float
    bias: float
    err_std: float
    n_pixels: float
    mae_over_time: np.ndarray          # [T]
    hist_bins: np.ndarray              # bin edges for gt/pred histograms
    gt_hist: np.ndarray
    pred_hist: np.ndarray
    err_bins: np.ndarray
    err_hist: np.ndarray
    scatter_gt: np.ndarray             # balanced scatter sample
    scatter_pred: np.ndarray
    # Per-output-channel stats (C=1 for the reference's single W map; the
    # multi-channel WVU config, BASELINE.json configs[3], reports one row
    # per channel). scatter_channel tags each scatter point with its
    # channel so callers can draw per-channel balanced scatters.
    mae_per_channel: Optional[np.ndarray] = None        # [C]
    rmse_per_channel: Optional[np.ndarray] = None       # [C]
    bias_per_channel: Optional[np.ndarray] = None       # [C]
    err_std_per_channel: Optional[np.ndarray] = None    # [C]
    scatter_channel: Optional[np.ndarray] = None        # like scatter_gt

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        return {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                for k, v in d.items()}


def _make_eval_batch_fn(apply_fn: Callable, stats, use_mask: bool,
                        hist_range=(-10.0, 10.0), hist_bins: int = 100,
                        err_range=(-5.0, 5.0), mesh=None,
                        variables_sharding=None):
    """``mesh``: shard the batch over the 'data' axis — every reduction
    here is a full sum, so XLA turns them into psums over ICI and the
    suite scales to all chips (the reference's get_metrics.py:117-125 is a
    batch-1 single-GPU loop). The scatter sampling is per-ROW
    (``sample_idx`` [B, k]) precisely so its gather stays device-local
    under the sharded batch axis."""
    lo, hi = hist_range
    elo, ehi = err_range

    def batch_fn(variables, x_raw, y_raw, sample_idx, n_valid):
        """``sample_idx``: [B, k] per-sample flat positions — only these
        pixels leave the device for the balanced-scatter pool (the
        reference ships every pixel to host lists, get_metrics.py:157-173).
        ``n_valid``: real rows of a zero-padded tail batch (static shapes,
        no retrace)."""
        x = normalize_x(x_raw, stats)
        y = normalize_y(y_raw, stats)
        mask = compute_mask(x_raw, stats)
        y_pred, _, _ = apply_fn(variables, x, train=False)
        pred_d = denormalize_y(y_pred.astype(jnp.float32), stats)
        gt_d = denormalize_y(y, stats)
        diff = pred_d - gt_d
        valid = (jnp.arange(x_raw.shape[0]) < n_valid).astype(jnp.float32)
        vmask = valid.reshape((-1,) + (1,) * (diff.ndim - 1))
        if use_mask:
            m = jnp.broadcast_to(mask, diff.shape).astype(jnp.float32) * vmask
        else:
            m = jnp.broadcast_to(vmask, diff.shape).astype(jnp.float32)
        # global sums
        n = jnp.sum(m)
        sums = jnp.stack([n, jnp.sum(jnp.abs(diff) * m),
                          jnp.sum(diff * diff * m), jnp.sum(diff * m)])
        # per-time-step sums over [B, T, H, W, C]
        axes = (0, 2, 3, 4)
        t_n = jnp.sum(m, axis=axes)
        t_abs = jnp.sum(jnp.abs(diff) * m, axis=axes)
        # per-channel sums (reference has C=1; WVU config reports u/v/w rows)
        caxes = (0, 1, 2, 3)
        c_sums = jnp.stack([jnp.sum(m, axis=caxes),
                            jnp.sum(jnp.abs(diff) * m, axis=caxes),
                            jnp.sum(diff * diff * m, axis=caxes),
                            jnp.sum(diff * m, axis=caxes)])  # [4, C]
        # histograms (weighted by the mask so invalid pixels drop out)
        gt_hist = jnp.histogram(gt_d, bins=hist_bins, range=(lo, hi),
                                weights=m)[0]
        pred_hist = jnp.histogram(pred_d, bins=hist_bins, range=(lo, hi),
                                  weights=m)[0]
        err_hist = jnp.histogram(diff, bins=hist_bins, range=(elo, ehi),
                                 weights=m)[0]
        # device-side bounded sampling for the balanced scatter — per-row
        # take_along_axis: each device gathers only from its own batch
        # rows, so a sharded batch axis adds no collective here
        B = x_raw.shape[0]
        pred_s = jnp.take_along_axis(pred_d.reshape(B, -1), sample_idx, 1)
        gt_s = jnp.take_along_axis(gt_d.reshape(B, -1), sample_idx, 1)
        m_s = jnp.take_along_axis(m.reshape(B, -1), sample_idx, 1)
        return sums, c_sums, t_n, t_abs, gt_hist, pred_hist, err_hist, \
            pred_s, gt_s, m_s

    kwargs: Dict[str, Any] = {}
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated_sharding

        rep = replicated_sharding(mesh)
        bat = batch_sharding(mesh)
        var = variables_sharding if variables_sharding is not None else rep
        kwargs["in_shardings"] = (var, bat, bat, bat, rep)
        kwargs["out_shardings"] = (rep,) * 7 + (bat, bat, bat)
    return jax.jit(batch_fn, **kwargs)


def balanced_scatter_sample(gt: np.ndarray, pred: np.ndarray,
                            bin_width: float = 0.05,
                            value_range=(-8.0, 8.0),
                            max_per_bin: int = 1000,
                            seed: int = 0):
    """Reference get_metrics.py:55-58,205-240: digitize GT into fixed bins,
    keep at most ``max_per_bin`` (gt, pred) pairs per bin."""
    lo, hi = value_range
    edges = np.arange(lo, hi + bin_width, bin_width)
    idx = np.digitize(gt, edges)
    rng = np.random.default_rng(seed)
    keep_gt, keep_pred = [], []
    for b in np.unique(idx):
        sel = np.flatnonzero(idx == b)
        if len(sel) > max_per_bin:
            sel = rng.choice(sel, max_per_bin, replace=False)
        keep_gt.append(gt[sel])
        keep_pred.append(pred[sel])
    if not keep_gt:
        return np.empty(0), np.empty(0)
    return np.concatenate(keep_gt), np.concatenate(keep_pred)


def evaluate_model(apply_fn: Callable, variables, dataset: NPZSequenceDataset,
                   indices: Optional[np.ndarray] = None,
                   batch_size: int = 8, use_mask: bool = True,
                   hist_bins: int = 100, hist_range=(-10.0, 10.0),
                   err_range=(-5.0, 5.0),
                   scatter_budget_per_batch: int = 65536,
                   seed: int = 0, train_frac: float = 0.8,
                   split_seed: int = 42, mesh=None,
                   variables_sharding=None) -> EvalReport:
    """Full evaluation pass over ``indices`` (default: the val split replayed
    exactly as during training — reference get_metrics.py:100-106; pass the
    training config's train_frac/split_seed when they differ from the
    defaults, or train samples leak into the 'val' metrics).

    ``mesh``: run the pass data-parallel — the batch is sharded over the
    mesh's 'data' axis and the on-device reductions become psums; the
    report is identical to the single-device pass (same per-row sample
    indices; tested in tests/test_parallel.py). Wrap ``apply_fn`` with
    ``flat_layout="batch"`` for a collective-free forward (models/layout.py)."""
    if indices is None:
        _, indices = dataset.train_val_split(train_frac, split_seed)
    if mesh is not None:
        n_data = mesh.shape["data"]
        if batch_size % n_data:
            raise ValueError(f"eval batch {batch_size} not divisible by "
                             f"mesh data degree {n_data}")
    stats = dataset.stats
    batch_fn = _make_eval_batch_fn(apply_fn, stats, use_mask,
                                   hist_range, hist_bins, err_range,
                                   mesh=mesh,
                                   variables_sharding=variables_sharding)
    loader = SequenceLoader(dataset, indices, batch_size, shuffle=False)

    T = dataset.T
    C = dataset.Y.shape[2] if dataset.Y.ndim >= 3 else 1
    sums = np.zeros(4)
    c_sums = np.zeros((4, C))
    t_n = np.zeros(T)
    t_abs = np.zeros(T)
    gt_h = np.zeros(hist_bins)
    pr_h = np.zeros(hist_bins)
    er_h = np.zeros(hist_bins)
    sc_gt, sc_pred, sc_ch = [], [], []
    rng = np.random.default_rng(seed)

    from ..data.pipeline import pad_batch

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated_sharding

        bat_shard = batch_sharding(mesh)
        variables = jax.device_put(
            variables, variables_sharding if variables_sharding is not None
            else replicated_sharding(mesh))

    for x_raw, y_raw in loader:
        # pad the ragged tail so every batch shares one compiled shape
        x_raw, y_raw, n_valid = pad_batch(x_raw, y_raw, batch_size)
        # per-row stratified sampling: k pixels from each sample's [T,H,W,C]
        # block (device-local gather under a sharded batch; the reference
        # ships EVERY pixel to host lists, get_metrics.py:157-173)
        row_px = int(np.prod(y_raw.shape[1:]))
        k = min(max(scatter_budget_per_batch // batch_size, 1), row_px)
        sample_idx_np = np.stack([rng.choice(row_px, k, replace=False)
                                  for _ in range(batch_size)])
        if mesh is not None:
            x_dev = jax.device_put(np.asarray(x_raw), bat_shard)
            y_dev = jax.device_put(np.asarray(y_raw), bat_shard)
            sample_idx = jax.device_put(sample_idx_np, bat_shard)
        else:
            x_dev, y_dev = jnp.asarray(x_raw), jnp.asarray(y_raw)
            sample_idx = jnp.asarray(sample_idx_np)
        out = batch_fn(variables, x_dev, y_dev, sample_idx, n_valid)
        s, cs, tn, ta, gh, ph, eh, pred_s, gt_s, m_s = jax.device_get(out)
        sums += s
        c_sums += cs
        t_n += tn
        t_abs += ta
        gt_h += gh
        pr_h += ph
        er_h += eh
        keep = (m_s > 0).ravel()
        if keep.any():
            sc_gt.append(gt_s.ravel()[keep])
            sc_pred.append(pred_s.ravel()[keep])
            # each row's flat layout is [T, H, W, C] with C fastest, so the
            # channel of a per-row flat position is idx % C
            sc_ch.append((sample_idx_np.ravel() % C)[keep])

    n = max(sums[0], 1e-12)
    mae = sums[1] / n
    mse = sums[2] / n
    bias = sums[3] / n
    err_std = max(mse - bias * bias, 0.0) ** 0.5

    gt_all = np.concatenate(sc_gt) if sc_gt else np.empty(0)
    pred_all = np.concatenate(sc_pred) if sc_pred else np.empty(0)
    ch_all = np.concatenate(sc_ch) if sc_ch else np.empty(0, np.int64)
    # balanced scatter per channel (C=1 reproduces the reference's single
    # scatter, get_metrics.py:205-240)
    s_gt_parts, s_pred_parts, s_ch_parts = [], [], []
    for c in range(C):
        in_c = ch_all == c
        g, p = balanced_scatter_sample(gt_all[in_c], pred_all[in_c],
                                       seed=seed)
        s_gt_parts.append(g)
        s_pred_parts.append(p)
        s_ch_parts.append(np.full(len(g), c, np.int64))
    s_gt = np.concatenate(s_gt_parts) if s_gt_parts else np.empty(0)
    s_pred = np.concatenate(s_pred_parts) if s_pred_parts else np.empty(0)
    s_ch = np.concatenate(s_ch_parts) if s_ch_parts else np.empty(0, np.int64)

    c_n = np.maximum(c_sums[0], 1e-12)
    c_mae = c_sums[1] / c_n
    c_mse = c_sums[2] / c_n
    c_bias = c_sums[3] / c_n

    lo, hi = hist_range
    elo, ehi = err_range
    return EvalReport(
        mae=float(mae), rmse=float(mse ** 0.5), bias=float(bias),
        err_std=float(err_std), n_pixels=float(sums[0]),
        mae_over_time=t_abs / np.maximum(t_n, 1e-12),
        hist_bins=np.linspace(lo, hi, hist_bins + 1),
        gt_hist=gt_h, pred_hist=pr_h,
        err_bins=np.linspace(elo, ehi, hist_bins + 1), err_hist=er_h,
        scatter_gt=s_gt, scatter_pred=s_pred,
        mae_per_channel=c_mae, rmse_per_channel=np.sqrt(c_mse),
        bias_per_channel=c_bias,
        err_std_per_channel=np.sqrt(np.maximum(c_mse - c_bias ** 2, 0.0)),
        scatter_channel=s_ch)
