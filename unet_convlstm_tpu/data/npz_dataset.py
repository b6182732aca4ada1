"""NPZ sequence dataset — the training-data contract.

Behavioral parity with reference ``train/unet.py:210-327`` (NPZSequenceDataset):

* Loads ``X [N,T,2,H,W]`` / ``Y [N,T,1,H,W]`` float32 from an npz.
* Statistics: X norm constant = max(max(X), 1); Y clip bounds from explicit
  (min_y, max_y) or percentiles (1e-5 / 99.99999); asinh / signed_log
  transform with scale = 99th percentile of |Y|; affine to [-1, 1].
* Per-sample: mask = raw x[:, 0:1] > 1.1 (BEFORE normalization); x /= norm
  const; y -> clip -> transform -> [-1, 1].
* ``denormalize`` inverts the Y chain back to physical units (m/s).

TPU-first differences: the statistics pass runs ONCE here on host (numpy
percentile semantics) and is frozen into an ``ops.normalize.NormStats``
manifest; the per-sample transforms are pure jnp functions applied on device
inside the jitted step (the reference re-runs them per __getitem__ on host).
This class also converts to NHWC on the way out — channels-last is the TPU
conv layout.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from ..ops.normalize import NormStats, compute_norm_stats


def _nchw_to_nhwc(a: np.ndarray) -> np.ndarray:
    """[N, T, C, H, W] -> [N, T, H, W, C]."""
    return np.ascontiguousarray(np.moveaxis(a, 2, -1))


class NPZSequenceDataset:
    """Host-side dataset: raw arrays + frozen normalization manifest.

    Unlike the reference (which normalizes in __getitem__), batches are served
    RAW and normalized on device — ``get_batch_raw`` for the pipeline,
    ``__getitem__`` for parity tests / host-side evaluation.
    """

    def __init__(self, npz_path: str,
                 min_y: Optional[float] = None,
                 max_y: Optional[float] = None,
                 lower_percentile: float = 0.00001,
                 upper_percentile: float = 99.99999,
                 clip_outliers: bool = True,
                 y_transform: str = "asinh",
                 y_transform_scale: Optional[float] = None,
                 y_transform_percentile: Optional[float] = 99,
                 stats: Optional[NormStats] = None,
                 mask_threshold: float = 1.1,
                 mmap: bool = False):
        if mmap:
            self.X, self.Y = self._mmap_arrays(npz_path)
        else:
            data = np.load(npz_path)
            if "X" in data:
                self.X = data["X"].astype(np.float32)
                self.Y = data["Y"].astype(np.float32)
            elif "data" in data:  # moving-mnist layout (digits generator)
                from .moving_mnist import moving_mnist_to_xy
                self.X, self.Y = moving_mnist_to_xy(data["data"])
            else:
                raise KeyError(f"{npz_path}: expected keys X/Y or data, "
                               f"found {sorted(data.keys())}")
        self.N, self.T = self.X.shape[:2]
        self.npz_path = npz_path
        self.mmap = mmap
        self.H, self.W = self.X.shape[-2:]

        manifest_path = npz_path + ".stats.json"
        norm_args = {"min_y": min_y, "max_y": max_y,
                     "lower_percentile": lower_percentile,
                     "upper_percentile": upper_percentile,
                     "clip_outliers": clip_outliers,
                     "y_transform": y_transform,
                     "y_transform_scale": y_transform_scale,
                     "y_transform_percentile": y_transform_percentile,
                     "mask_threshold": mask_threshold}
        if stats is not None:
            self.stats = stats
        else:
            cached = None
            if os.path.exists(manifest_path):
                try:
                    with open(manifest_path) as f:
                        manifest = json.load(f)
                except (json.JSONDecodeError, OSError):
                    manifest = {}  # torn write (crash mid-dump): recompute
                # a cached manifest is only valid for the SAME normalization
                # settings — changed args must recompute, not silently win
                if manifest.get("args") == norm_args:
                    cached = NormStats.from_dict(manifest["stats"])
            if cached is not None:
                self.stats = cached
            else:
                self.stats = compute_norm_stats(self.X, self.Y, **norm_args)
                try:
                    # temp + rename: a crash mid-dump must not leave a torn
                    # manifest that poisons every later construction
                    tmp = f"{manifest_path}.tmp{os.getpid()}"
                    with open(tmp, "w") as f:
                        json.dump({"args": norm_args,
                                   "stats": self.stats.to_dict()}, f)
                    os.replace(tmp, manifest_path)
                except OSError:
                    pass  # read-only data dir — stats stay in-memory

    @staticmethod
    def _mmap_arrays(npz_path: str):
        """Datasets larger than host RAM: extract X/Y once into raw .npy
        sidecars and memory-map them (the reference loads the whole npz into
        RAM, train/unet.py:212-215; at cloud scale that's tens of GB).
        Pages stream in on demand through the native gather kernel."""
        x_npy = npz_path + ".X.npy"
        y_npy = npz_path + ".Y.npy"
        src_mtime = os.path.getmtime(npz_path)
        fresh = (os.path.exists(x_npy) and os.path.exists(y_npy)
                 and os.path.getmtime(x_npy) >= src_mtime
                 and os.path.getmtime(y_npy) >= src_mtime)
        if not fresh:
            # a REGENERATED npz must invalidate the sidecars (mtime check),
            # and extraction must be atomic: temp + rename, so a killed or
            # concurrent extraction can never leave a truncated .npy that
            # later runs silently map
            data = np.load(npz_path)
            if "X" in data:
                arrays = {"X": data["X"].astype(np.float32),
                          "Y": data["Y"].astype(np.float32)}
            else:  # moving-mnist 'data' layout
                from .moving_mnist import moving_mnist_to_xy
                x, y = moving_mnist_to_xy(data["data"])
                arrays = {"X": x, "Y": y}
            for path, key in ((x_npy, "X"), (y_npy, "Y")):
                # tmp must END in .npy — np.save appends the suffix
                # otherwise and the rename source wouldn't exist
                tmp = f"{path[:-4]}.tmp{os.getpid()}.npy"
                np.save(tmp, arrays[key])
                os.replace(tmp, path)
        return (np.load(x_npy, mmap_mode="r"),
                np.load(y_npy, mmap_mode="r"))

    def __len__(self) -> int:
        return self.N

    # ---- host-side normalized access (parity with reference __getitem__) ----

    def __getitem__(self, idx: int):
        """Returns (x, y, mask) normalized, NCHW float32 — the reference's
        exact per-sample contract, for parity tests."""
        s = self.stats
        x_raw = self.X[idx]
        y_raw = self.Y[idx]
        mask = (x_raw[:, 0:1] > s.mask_threshold).astype(np.float32)
        x = x_raw / s.norm_const
        y = y_raw
        if s.clip_outliers:
            y = np.clip(y, s.min_vel, s.max_vel)
        if s.y_transform == "asinh":
            y_t = np.arcsinh(y / s.y_scale)
        elif s.y_transform == "signed_log":
            y_t = np.sign(y) * np.log1p(np.abs(y) / s.y_scale)
        else:
            y_t = y
        y_n = (2 * (y_t - s.trans_min) / (s.trans_max - s.trans_min) - 1.0)
        return x.astype(np.float32), y_n.astype(np.float32), mask

    def denormalize(self, y_norm: np.ndarray) -> np.ndarray:
        s = self.stats
        y_t = (np.asarray(y_norm) + 1.0) / 2.0 * (s.trans_max - s.trans_min) + s.trans_min
        if s.y_transform == "asinh":
            return np.sinh(y_t) * s.y_scale
        if s.y_transform == "signed_log":
            return np.sign(y_t) * (np.expm1(np.abs(y_t)) * s.y_scale)
        return y_t

    # ---- raw NHWC batch access (device normalizes) ----

    def get_batch_raw(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Raw (x, y) for ``indices``, NHWC: x [b,T,H,W,2], y [b,T,H,W,1].
        Uses the fused native gather+transpose kernel when available
        (data/fast_gather.py), numpy otherwise."""
        from .fast_gather import gather_transpose

        return (gather_transpose(self.X, indices),
                gather_transpose(self.Y, indices))

    def train_val_split(self, train_frac: float = 0.8, seed: int = 42):
        """Deterministic split (reference: seeded random_split replayed at
        eval time, main.py:241-244 / get_metrics.py:100-106)."""
        perm = np.random.default_rng(seed).permutation(self.N)
        n_train = int(train_frac * self.N)
        return perm[:n_train], perm[n_train:]
