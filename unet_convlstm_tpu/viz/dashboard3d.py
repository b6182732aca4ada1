"""3-D dashboard video across time folders — parity with reference
``plots/create_video_dashboard3d_from_samples.py:205-392``
(create_dashboard_3d_padded): for one sample id, walk the numeric time
folders, and per timestamp compose [render | W map | satellite geometry]
into an mp4. Render/map pkls follow the stage B/C naming contracts.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from .geometry import fig_to_rgb, geometry_panel_3d, load_camera_csv  # noqa: E402


def _find(folder: str, pattern: str) -> Optional[str]:
    hits = glob.glob(os.path.join(folder, pattern))
    return hits[0] if hits else None


def create_dashboard_3d(root_images: str, root_maps: str, csv_path: str,
                        sample_idx: int, out_path: str,
                        map_type: str = "w",
                        map_suffix: str = "slice_1000m",
                        fps: int = 2, verbose: bool = True) -> int:
    """Returns the number of frames written."""
    import cv2

    log = print if verbose else (lambda *a, **k: None)
    times, lookup = load_camera_csv(csv_path)
    folders = sorted((f for f in os.listdir(root_images) if f.isdigit()),
                     key=int)
    sid = f"sample_{sample_idx:03d}"
    writer = None
    frames = 0
    for k, folder in enumerate(folders):
        f_render = _find(os.path.join(root_images, folder),
                         f"{sid}_*_view_0.pkl")
        f_map = _find(os.path.join(root_maps, folder),
                      f"{sid}_*_view_0_{map_suffix}.pkl")
        if not (f_render and f_map):
            continue
        with open(f_render, "rb") as f:
            render = pickle.load(f)["render"]
        with open(f_map, "rb") as f:
            wmap = pickle.load(f)[f"{map_type}_map"]
        t = times[k % len(times)]
        geo = geometry_panel_3d(times, lookup, t)

        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        axes[0].imshow(np.nan_to_num(render) ** 0.5, cmap="gray")
        axes[0].set_title(f"render — folder {folder}")
        lim = np.nanpercentile(np.abs(wmap), 99) or 1.0
        cmap = plt.get_cmap("jet").copy()
        cmap.set_bad("black")
        im = axes[1].imshow(np.ma.masked_invalid(wmap), cmap=cmap,
                            vmin=-lim, vmax=lim)
        axes[1].set_title(f"{map_type} map [m/s]")
        fig.colorbar(im, ax=axes[1], fraction=0.046)
        axes[2].imshow(geo)
        axes[2].axis("off")
        for ax in axes[:2]:
            ax.set_xticks([])
            ax.set_yticks([])
        fig.tight_layout()
        rgb = fig_to_rgb(fig)
        plt.close(fig)
        if writer is None:
            h, w = rgb.shape[:2]
            writer = cv2.VideoWriter(out_path,
                                     cv2.VideoWriter_fourcc(*"mp4v"),
                                     fps, (w, h))
        writer.write(rgb[..., ::-1])
        frames += 1
    if writer is not None:
        writer.release()
    log(f"[dashboard3d] {frames} frames -> {out_path}")
    return frames
