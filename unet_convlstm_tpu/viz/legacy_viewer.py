"""Legacy pre-rendered-sample sequence viewer.

Parity with reference ``visualizing_clouds_dataset.py`` (157 LoC): a
``PKLSequenceDataset`` over the legacy sample pkls (keys ``tensors``
[2,3,H,W], ``target``, ``target_slice`` [8+,1?,H,W], ``envelope``) with
sliding windows, and a multi-panel animation per sequence — camera views,
top-cloud W target, the 8 W slices and the envelope — written as mp4.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import List, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from .geometry import fig_to_rgb  # noqa: E402


class PKLSequenceDataset:
    """Sliding windows over legacy sample pkls grouped by location."""

    def __init__(self, folder: str, seq_len: int = 20, overlap: int = 10):
        self.seq_len = seq_len
        stride = seq_len - overlap
        by_loc = {}
        for f in sorted(glob.glob(os.path.join(folder, "*.pkl"))):
            parts = os.path.basename(f).split("_")
            t = int(parts[-3])
            loc = f"{parts[-2]}_{parts[-1].split('.')[0]}"
            by_loc.setdefault(loc, {})[t] = f
        self.windows: List[List[str]] = []
        for loc, tm in by_loc.items():
            times = sorted(tm)
            for i in range(0, len(times) - seq_len + 1, stride):
                self.windows.append([tm[t] for t in times[i:i + seq_len]])

    def __len__(self) -> int:
        return len(self.windows)

    def load(self, idx: int) -> List[dict]:
        out = []
        for path in self.windows[idx]:
            with open(path, "rb") as f:
                out.append(pickle.load(f))
        return out


def animate_sequence(dataset: PKLSequenceDataset, idx: int, out_path: str,
                     fps: int = 2) -> str:
    """15-panel animation: 3 camera views, top-cloud W, envelope, 8 W
    slices (reference visualizing_clouds_dataset.py layout); → mp4."""
    import cv2

    frames = dataset.load(idx)
    writer = None
    for t, d in enumerate(frames):
        tensors = np.asarray(d["tensors"])
        views = tensors[0] if tensors.ndim == 4 else tensors
        slices = np.asarray(d["target_slice"])
        target = np.asarray(d.get("target", slices[-1]))
        envelope = np.asarray(d.get("envelope", np.zeros(views.shape[-2:])))

        fig, axes = plt.subplots(3, 5, figsize=(20, 12))
        for i in range(min(3, views.shape[0])):
            axes[0, i].imshow(views[i], cmap="gray")
            axes[0, i].set_title(f"camera {i} — t={t}")
        lim = np.nanpercentile(np.abs(target), 99) or 1.0
        axes[0, 3].imshow(np.squeeze(target), cmap="jet",
                          vmin=-lim, vmax=lim)
        axes[0, 3].set_title("top-cloud W")
        axes[0, 4].imshow(np.squeeze(envelope), cmap="viridis")
        axes[0, 4].set_title("envelope")
        n_slices = min(8, slices.shape[0])
        for s in range(n_slices):
            ax = axes[1 + s // 5, s % 5]
            sl = np.squeeze(slices[s])
            if sl.ndim == 3:
                sl = sl[0]
            ax.imshow(sl, cmap="jet", vmin=-lim, vmax=lim)
            ax.set_title(f"W slice {s}")
        for ax in axes.ravel():
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
    if writer is not None:
        writer.release()
    return out_path
