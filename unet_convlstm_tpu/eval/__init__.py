"""Evaluation: offline metric suites, streaming rollout, image metrics.

Capability parity with the reference's evaluation layer:

* ``metrics``       — global MAE/RMSE/bias/err-std, MAE-vs-time-step,
                      GT/pred/error histograms, balanced scatter sampling
                      (reference train/get_metrics.py).
* ``rollout``       — autoregressive / incremental-context inference. The
                      reference re-runs the model on every prefix — O(T²)
                      (test.py:305-316); here the recurrent carry streams,
                      O(T), with a parity mode reproducing prefix semantics.
* ``image_metrics`` — PSNR / SSIM (the driver's rollout-parity metrics).
"""

from .metrics import evaluate_model, EvalReport  # noqa: F401
from .rollout import (rollout_streaming, rollout_scan,  # noqa: F401
                      rollout_prefix_rerun)
from .image_metrics import psnr, ssim  # noqa: F401
