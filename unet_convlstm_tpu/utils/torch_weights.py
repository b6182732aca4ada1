"""torch → JAX weight conversion for the ResNet18 encoder.

The reference gets ImageNet initialization through
``smp.Unet(encoder_name="resnet18", encoder_weights="imagenet",
in_channels=2)`` (reference train/resnet18.py:26-33), which downloads
torchvision weights and adapts the first conv to 2 input channels. This
environment has no network egress, so conversion works from a local
state-dict file (torchvision ``resnet18`` layout); without one the encoder
falls back to random init.

Layout mapping: torch OIHW conv kernels → our HWIO; ``layerL.B.*`` →
``layerL_B`` blocks; BN weight/bias → scale/bias params, running_mean/var →
stats. First-conv adaptation follows smp's scheme: input channels cycled
mod 3 and scaled by 3/new_in so activation magnitude is preserved.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _adapt_first_conv(w_oihw: np.ndarray, in_channels: int) -> np.ndarray:
    """smp-style first-conv channel adaptation (cycle mod 3, rescale)."""
    if in_channels == w_oihw.shape[1]:
        return w_oihw
    out = np.stack([w_oihw[:, i % w_oihw.shape[1]]
                    for i in range(in_channels)], axis=1)
    return out * (w_oihw.shape[1] / in_channels)


def convert_resnet18_state_dict(sd: Dict[str, Any],
                                in_channels: int = 2) -> Dict[str, Any]:
    """torchvision resnet18 state_dict (numpy-convertible tensors) →
    {'params': ..., 'stats': ...} matching
    ``models.resnet_unet.resnet18_encoder_init``."""

    def arr(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    def bn(prefix):
        p = {"scale": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}
        s = {"mean": arr(f"{prefix}.running_mean"),
             "var": arr(f"{prefix}.running_var")}
        return p, s

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    w1 = _adapt_first_conv(arr("conv1.weight"), in_channels)
    params["conv1"] = {"w": _oihw_to_hwio(w1)}
    params["bn1"], stats["bn1"] = bn("bn1")

    for li in range(1, 5):
        for bi in range(2):
            src = f"layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            p: Dict[str, Any] = {
                "conv1": {"w": _oihw_to_hwio(arr(f"{src}.conv1.weight"))},
                "conv2": {"w": _oihw_to_hwio(arr(f"{src}.conv2.weight"))},
            }
            s: Dict[str, Any] = {}
            p["bn1"], s["bn1"] = bn(f"{src}.bn1")
            p["bn2"], s["bn2"] = bn(f"{src}.bn2")
            if f"{src}.downsample.0.weight" in sd:
                p["down_conv"] = {
                    "w": _oihw_to_hwio(arr(f"{src}.downsample.0.weight"))}
                p["down_bn"], s["down_bn"] = bn(f"{src}.downsample.1")
            params[dst], stats[dst] = p, s
    return {"params": params, "stats": stats}


def load_torch_resnet18(path: str, in_channels: int = 2) -> Dict[str, Any]:
    """Load + convert a local torchvision resnet18 checkpoint (.pth)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_resnet18_state_dict(sd, in_channels)
