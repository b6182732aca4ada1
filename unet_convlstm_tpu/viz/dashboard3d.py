"""3-D dashboard video across time folders — parity with reference
``plots/create_video_dashboard3d_from_samples.py:205-392``
(create_dashboard_3d_padded): for one sample id, walk the numeric time
folders and per timestamp compose the padded dual-view layout

    [ render S0 | sep | render S1 | sep | geometry ]
    [  W map S0 |     |  W map S1 |     |  panel   ]

with gamma-0.5 grayscale renders (:290-310), symmetric-jet W maps with
black NaNs (:159-171), 20-px light separators and a 40-px dark border
(:317-378), text labels, and a 3-D or 2-D satellite-geometry panel with
global track bounds (:222-238). Missing velocity pkls fall back to zero
maps (:283-289). Render/map pkls follow the stage B/C naming contracts.
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

from .geometry import (fig_to_rgb, geometry_panel_2d,  # noqa: E402
                       geometry_panel_3d, load_camera_csv)


def _find(folder: str, pattern: str) -> Optional[str]:
    hits = glob.glob(os.path.join(folder, pattern))
    return hits[0] if hits else None


def _load_key(path: Optional[str], key: str) -> Optional[np.ndarray]:
    if path is None:
        return None
    with open(path, "rb") as f:
        return np.asarray(pickle.load(f)[key])


def gray_gamma_panel(img: np.ndarray, gamma: float = 0.5) -> np.ndarray:
    """Min-max normalize + gamma correct to uint8 RGB
    (reference norm_gray_with_gamma, :291-310)."""
    img = np.nan_to_num(np.asarray(img, np.float32))
    mi, ma = float(img.min()), float(img.max())
    norm = (img - mi) / (ma - mi) if ma > mi else np.zeros_like(img)
    u8 = (np.power(norm, gamma) * 255).astype(np.uint8)
    return np.repeat(u8[..., None], 3, axis=-1)


def jet_panel(data: np.ndarray) -> np.ndarray:
    """Symmetric jet at the 99th |.| percentile, NaNs black
    (reference apply_jet_colormap, :159-171). Returns uint8 RGB."""
    mask = np.isnan(data)
    clean = np.nan_to_num(data, nan=0.0)
    limit = float(np.percentile(np.abs(clean), 99)) or 1.0
    norm = (np.clip(clean, -limit, limit) + limit) / (2 * limit)
    colored = plt.get_cmap("jet")(norm)
    colored[mask] = [0, 0, 0, 1]
    return (colored[..., :3] * 255).astype(np.uint8)


def compose_dashboard_frame(renders, wmaps, geo_rgb,
                            label: str = "",
                            sep_px: int = 20, pad_px: int = 40
                            ) -> np.ndarray:
    """Pure layout: per-view [render; W map] columns + separators +
    geometry panel, labels, global dark padding. Returns uint8 RGB."""
    import cv2

    cols = []
    for r, w in zip(renders, wmaps):
        r_rgb = gray_gamma_panel(r)
        w_rgb = jet_panel(w if w is not None
                          else np.zeros_like(np.asarray(r)))
        cols.append(np.vstack([r_rgb, w_rgb]))
    h_col = cols[0].shape[0]
    sep = np.full((h_col, sep_px, 3), 230, np.uint8)

    if geo_rgb.shape[0] != h_col:
        new_w = max(1, int(geo_rgb.shape[1] * h_col / geo_rgb.shape[0]))
        geo_rgb = cv2.resize(geo_rgb, (new_w, h_col))
    parts = []
    for c in cols:
        parts += [c, sep]
    content = np.hstack(parts + [geo_rgb])

    h_r = cols[0].shape[0] // 2       # render row height
    w_r = cols[0].shape[1]
    put = cv2.putText
    font = cv2.FONT_HERSHEY_SIMPLEX
    if label:
        put(content, label, (10, 22), font, 0.5, (255, 255, 255), 1,
            cv2.LINE_AA)
    put(content, "Render Image", (10, 44), font, 0.45, (200, 200, 200), 1,
        cv2.LINE_AA)
    put(content, "W Map", (10, h_r + 20), font, 0.45, (200, 200, 200), 1,
        cv2.LINE_AA)
    for v in range(len(cols)):
        put(content, f"S{v}", (v * (w_r + sep_px) + 10, h_r - 12), font,
            0.5, (52, 152, 219), 1, cv2.LINE_AA)

    h_c, w_c, _ = content.shape
    padded = np.full((h_c + 2 * pad_px, w_c + 2 * pad_px, 3), 50, np.uint8)
    padded[pad_px:pad_px + h_c, pad_px:pad_px + w_c] = content
    return padded


def create_dashboard_3d(root_images: str, root_maps: str, csv_path: str,
                        sample_idx: int, out_path: str,
                        map_type: str = "w",
                        map_suffix: str = "slice_1500m",
                        n_views: int = 2,
                        start_folder: Optional[int] = None,
                        end_folder: Optional[int] = None,
                        geo_mode: str = "3d",
                        fps: int = 2, verbose: bool = True) -> int:
    """Compose the padded dual-view dashboard mp4. Returns frames written.

    Folder bounds and the cyclic folder→time assignment follow the
    reference (:250-259); velocity pkls use our stage-C ``_{suffix}``
    naming (reference build_WVU_maps.py:161-174), with a suffix-less
    fallback for reference-produced trees."""
    import cv2

    from ..datagen.overpass import enumerate_patch_folders

    log = print if verbose else (lambda *a, **k: None)
    times, lookup = load_camera_csv(csv_path)
    # (position, folder) with FULL-list positions: the cyclic time
    # assignment must match how stage B/C rendered these folders even on
    # a bounded run (a filtered-index k would label folder 5's frame with
    # times[0]'s satellite geometry)
    folders = enumerate_patch_folders(root_images, start_folder,
                                      end_folder)
    sid = f"sample_{sample_idx:03d}"
    geo_fn = geometry_panel_2d if geo_mode == "2d" else geometry_panel_3d
    writer = None
    frames = 0
    for k, folder in folders:
        renders, wmaps = [], []
        for v in range(n_views):
            f_render = _find(os.path.join(root_images, folder),
                             f"{sid}_*_view_{v}.pkl")
            f_map = (_find(os.path.join(root_maps, folder),
                           f"{sid}_*_view_{v}_{map_suffix}.pkl")
                     or _find(os.path.join(root_maps, folder),
                              f"{sid}_*_view_{v}.pkl"))
            renders.append(_load_key(f_render, "render"))
            wmaps.append(_load_key(f_map, f"{map_type}_map"))
        if any(r is None for r in renders):
            continue
        t = times[k % len(times)]
        geo = geo_fn(times, lookup, t)
        rgb = compose_dashboard_frame(
            renders, wmaps, geo, label=f"Folder: {folder} | Time: {t:g}")
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
