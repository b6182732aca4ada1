"""Sample viewers — parity with the reference's misc inspection scripts:
Moving-MNIST digit+velocity animation (digits/visualizing_dataset.py),
single-sample panel (show_one_sample.py), pkl browser (read_pkl.py),
netCDF browser (read_nc.py). Headless: animations are written as mp4,
panels as PNG, browsers return dicts (CLI ``inspect`` prints them).
"""

from __future__ import annotations

import pickle
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from .geometry import fig_to_rgb  # noqa: E402


def moving_mnist_video(npz_path: str, out_path: str, sample_idx: int = 7,
                       fps: int = 5) -> str:
    """Digit + vx-map animation (reference digits/visualizing_dataset.py)."""
    import cv2

    data = np.load(npz_path)
    arr = data["data"] if "data" in data else None
    if arr is None:  # X/Y layout
        X, Y = data["X"], data["Y"]
        digits, vel = X[sample_idx, :, 0], Y[sample_idx, :, 0]
    else:
        digits, vel = arr[sample_idx, :, 0], arr[sample_idx, :, 1]
    writer = None
    for t in range(digits.shape[0]):
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 4.5))
        ax1.imshow(digits[t], cmap="gray", vmin=0, vmax=1)
        ax1.set_title(f"digit — t={t}")
        ax2.imshow(vel[t], cmap="hot", vmin=-5, vmax=5)
        ax2.set_title("velocity (vx)")
        for ax in (ax1, ax2):
            ax.axis("off")
        rgb = fig_to_rgb(fig)
        plt.close(fig)
        if writer is None:
            h, w = rgb.shape[:2]
            writer = cv2.VideoWriter(out_path,
                                     cv2.VideoWriter_fourcc(*"mp4v"),
                                     fps, (w, h))
        writer.write(rgb[..., ::-1])
    if writer is not None:
        writer.release()
    return out_path


def show_sample_panel(npz_path: str, out_path: str, sample_idx: int = 0,
                      t: int = 0) -> str:
    """One sample's inputs/target as a PNG (reference show_one_sample.py)."""
    data = np.load(npz_path)
    X, Y = data["X"], data["Y"]
    fig, axes = plt.subplots(1, 3, figsize=(13, 4.5))
    axes[0].imshow(X[sample_idx, t, 0], cmap="gray")
    axes[0].set_title("view 0")
    axes[1].imshow(X[sample_idx, t, 1], cmap="gray")
    axes[1].set_title("view 1")
    lim = np.percentile(np.abs(Y[sample_idx, t, 0]), 99) or 1.0
    im = axes[2].imshow(Y[sample_idx, t, 0], cmap="jet", vmin=-lim, vmax=lim)
    axes[2].set_title("target velocity")
    fig.colorbar(im, ax=axes[2], fraction=0.046)
    for ax in axes:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_path


def describe_nc(nc_path: str, coord_values: int = 16) -> dict:
    """Variable/dimension summary of a BOMEX .nc (reference read_nc.py:
    lists dimensions + variables and prints coordinate arrays). Small 1-D
    coordinate variables include their leading values; bulk variables get
    shape/dtype only (no full-volume load)."""
    from ..datagen.lespatch import _NCFile

    nc = _NCFile(nc_path)
    try:
        names = (list(nc._nc.variables) if nc._nc is not None
                 else list(nc._h5))
        out = {}
        for name in names:
            v = nc.var(name)
            entry = {"shape": tuple(v.shape), "dtype": str(v.dtype)}
            if len(v.shape) == 1 and v.shape[0] <= 4096:
                vals = np.asarray(v[:])
                entry["values"] = [
                    x.decode(errors="replace") if isinstance(x, bytes)
                    else x for x in vals[:coord_values].tolist()]
                # char/string coordinate variables (CF station names,
                # unit labels) have no numeric range
                if np.issubdtype(vals.dtype, np.number):
                    entry["min"] = float(vals.min())
                    entry["max"] = float(vals.max())
            out[name] = entry
        return out
    finally:
        nc.close()


def describe_pkl(pkl_path: str) -> dict:
    """Key/shape/dtype/stats summary of a pipeline pkl (read_pkl.py)."""
    with open(pkl_path, "rb") as f:
        d = pickle.load(f)
    out = {}
    for k, v in d.items():
        if isinstance(v, np.ndarray):
            out[k] = {"shape": v.shape, "dtype": str(v.dtype),
                      "min": float(np.nanmin(v)), "max": float(np.nanmax(v))}
        else:
            out[k] = {"type": type(v).__name__, "value": repr(v)[:80]}
    return out
