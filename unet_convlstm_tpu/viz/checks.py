"""Data-integrity / physics inspection tools.

Parity targets:

* ``divergence_check``  — ∇·v = du/dx + dv/dy + dw/dz via np.gradient at the
                          voxel resolution; 8-panel field/derivative figure
                          + divergence histogram; validates the LES data's
                          incompressibility (reference
                          preprocessing/divergent.py:37-155).
* ``spot_check_maps``   — raw PNGs of u/v/w maps next to the matching render
                          with min/max stats (reference
                          preprocessing/check_build_WVU_maps.py:13-98).
* ``volume_check``      — β-volume integrity view. The reference eyeballs a
                          marching-cubes isosurface via skimage
                          (check_preprocessing.py:10-67); skimage is not in
                          this image, so the default backend renders the
                          three maximum-intensity projections (same purpose:
                          patch continuity at a glance), with the isosurface
                          path used when skimage is importable.
* ``dataset_stats``     — global min/max + nonzero histogram of Y
                          (reference get_data_min_max.py:16-51).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def divergence_check(vol_u: np.ndarray, vol_v: np.ndarray,
                     vol_w: np.ndarray, vol_beta: np.ndarray,
                     voxel_res: float = 20.0,
                     save_dir: Optional[str] = None,
                     base_name: str = "patch") -> Dict[str, float]:
    """Returns divergence stats; writes the 8-panel map + histogram when
    ``save_dir`` is given. Volumes are [Z, Y, X]."""
    du_dx = np.gradient(vol_u, voxel_res)[2]
    dv_dy = np.gradient(vol_v, voxel_res)[1]
    dw_dz = np.gradient(vol_w, voxel_res)[0]
    div = du_dx + dv_dy + dw_dz
    stats = {
        "mean_abs_divergence": float(np.mean(np.abs(div))),
        "max_abs_divergence": float(np.max(np.abs(div))),
        "std_divergence": float(np.std(div)),
    }
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        occupancy = (vol_beta > 0.001).sum(axis=(1, 2))
        best_z = int(np.argmax(occupancy)) if occupancy.any() else len(vol_beta) // 2

        fig, axes = plt.subplots(2, 4, figsize=(22, 10))
        panels_top = [("cloud density β", vol_beta, "gray"),
                      ("U velocity", vol_u, "seismic"),
                      ("V velocity", vol_v, "seismic"),
                      ("W velocity", vol_w, "seismic")]
        for ax, (title, vol, cmap) in zip(axes[0], panels_top):
            lim = np.percentile(np.abs(vol), 99) or 1.0
            kw = {} if cmap == "gray" else dict(vmin=-lim, vmax=lim)
            im = ax.imshow(vol[best_z], cmap=cmap, **kw)
            ax.set_title(f"{title} (z={best_z})")
            fig.colorbar(im, ax=ax, fraction=0.046)
        panels_bot = [("du/dx", du_dx), ("dv/dy", dv_dy), ("dw/dz", dw_dz),
                      ("divergence ∇·v", div)]
        for ax, (title, vol) in zip(axes[1], panels_bot):
            lim = np.percentile(np.abs(vol), 99) or 1.0
            im = ax.imshow(vol[best_z], cmap="seismic", vmin=-lim, vmax=lim)
            ax.set_title(title)
            fig.colorbar(im, ax=ax, fraction=0.046)
        fig.tight_layout()
        fig.savefig(os.path.join(save_dir, f"{base_name}_divergence_maps.png"),
                    dpi=110)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(7, 5))
        ax.hist(div.ravel(), bins=200)
        ax.set_yscale("log")
        ax.set_xlabel("∇·v [1/s]")
        ax.set_title(f"divergence histogram — mean|∇·v| = "
                     f"{stats['mean_abs_divergence']:.2e}")
        fig.savefig(os.path.join(save_dir, f"{base_name}_divergence_hist.png"),
                    dpi=110)
        plt.close(fig)
    return stats


def divergence_check_pkl(pkl_path: str, voxel_res: float = 20.0,
                         save_dir: Optional[str] = None) -> Dict[str, float]:
    with open(pkl_path, "rb") as f:
        d = pickle.load(f)
    base = os.path.splitext(os.path.basename(pkl_path))[0]
    return divergence_check(d["U"], d["V"], d["W"], d["beta_ext"],
                            voxel_res, save_dir, base)


def spot_check_maps(map_pkl: str, render_pkl: Optional[str],
                    save_dir: str) -> Dict[str, Dict[str, float]]:
    """Dump raw PNGs of u/v/w maps (jet, NaN black) + matching render and
    print-style min/max stats (check_build_WVU_maps.py)."""
    os.makedirs(save_dir, exist_ok=True)
    with open(map_pkl, "rb") as f:
        maps = pickle.load(f)
    stats: Dict[str, Dict[str, float]] = {}
    cmap = plt.get_cmap("jet").copy()
    cmap.set_bad("black")
    for key in ("u_map", "v_map", "w_map"):
        arr = maps[key]
        stats[key] = {"min": float(np.nanmin(arr)),
                      "max": float(np.nanmax(arr)),
                      "nan_frac": float(np.isnan(arr).mean())}
        fig, ax = plt.subplots(figsize=(5, 5))
        im = ax.imshow(np.ma.masked_invalid(arr), cmap=cmap)
        fig.colorbar(im, ax=ax, fraction=0.046)
        ax.set_title(key)
        fig.savefig(os.path.join(save_dir, f"{key}.png"), dpi=110)
        plt.close(fig)
    if render_pkl:
        with open(render_pkl, "rb") as f:
            render = pickle.load(f)["render"]
        stats["render"] = {"min": float(np.nanmin(render)),
                           "max": float(np.nanmax(render)),
                           "nan_frac": float(np.isnan(render).mean())}
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.imshow(np.asarray(render) ** 0.5, cmap="gray")  # gamma-0.5 display
        ax.set_title("render (γ=0.5)")
        fig.savefig(os.path.join(save_dir, "render.png"), dpi=110)
        plt.close(fig)
    return stats


def volume_check(beta: np.ndarray, save_path: str,
                 level: float = 0.001) -> str:
    """β-volume integrity figure: isosurface when skimage exists, else the
    three maximum-intensity projections."""
    try:
        from skimage import measure  # type: ignore

        verts, faces, *_ = measure.marching_cubes(beta, level=level)
        fig = plt.figure(figsize=(7, 7))
        ax = fig.add_subplot(111, projection="3d")
        ax.plot_trisurf(verts[:, 2], verts[:, 1], faces, verts[:, 0],
                        lw=0, alpha=0.6)
        ax.set_title(f"β isosurface @ {level}")
    except (ImportError, ValueError, RuntimeError):
        # no skimage, OR marching_cubes rejecting the volume (level
        # outside the data range for an empty/thin patch) — either way
        # the MIP fallback is the point of this function
        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        for ax, (axis, name) in zip(axes, ((0, "top (z)"), (1, "side (y)"),
                                           (2, "side (x)"))):
            ax.imshow(beta.max(axis=axis), cmap="gray")
            ax.set_title(f"max-β projection, {name}")
    fig.savefig(save_path, dpi=110)
    plt.close(fig)
    return save_path


def dataset_stats(npz_path: str, key: str = "Y",
                  save_dir: Optional[str] = None,
                  bins: int = 200) -> Dict[str, float]:
    """Global min/max + nonzero histogram (get_data_min_max.py:16-51)."""
    data = np.load(npz_path)[key]
    nonzero = data[data != 0]
    stats = {"min": float(data.min()), "max": float(data.max()),
             "nonzero_fraction": float((data != 0).mean()),
             "nonzero_mean": float(nonzero.mean()) if nonzero.size else 0.0}
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fig, ax = plt.subplots(figsize=(7, 5))
        if nonzero.size:
            ax.hist(nonzero.ravel(), bins=bins)
        ax.set_yscale("log")
        ax.set_title(f"{key} nonzero histogram  "
                     f"[{stats['min']:.3f}, {stats['max']:.3f}]")
        fig.savefig(os.path.join(save_dir, f"{key}_hist.png"), dpi=110)
        plt.close(fig)
    return stats
