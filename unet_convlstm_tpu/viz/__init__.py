"""Visualization & inspection layer (host-side matplotlib/cv2/PIL).

Capability parity with the reference's L7 components (SURVEY.md §2.3):

* ``figures``         — the get_metrics.py figure suite: balanced scatter,
                        MAE-over-time, GT/pred/error histograms, composed
                        3×2 summary grid (reference train/get_metrics.py).
* ``rollout_video``   — per-frame rollout dashboard mp4 (sat views, GT/pred
                        velocity with SymLog jet colormap, mask, satellite
                        geometry; reference test.py:369-577).
* ``dashboard3d``     — 3-D satellite-geometry dashboard video across time
                        folders (reference
                        plots/create_video_dashboard3d_from_samples.py).
* ``sequences_video`` — mask-threshold tuning video with per-frame pixel
                        histogram (reference plots/show_sequences.py).
* ``checks``          — physics divergence check (preprocessing/divergent.py),
                        map/render spot check (check_build_WVU_maps.py),
                        volume integrity check (check_preprocessing.py),
                        dataset stats (get_data_min_max.py).
* ``viewers``         — Moving-MNIST / sample animations
                        (digits/visualizing_dataset.py, show_one_sample.py).
"""

import matplotlib

matplotlib.use("Agg")  # headless everywhere; files are the product

from .figures import save_metrics_figures  # noqa: F401,E402
from .checks import (  # noqa: F401,E402
    divergence_check, dataset_stats, spot_check_maps, volume_check,
)
