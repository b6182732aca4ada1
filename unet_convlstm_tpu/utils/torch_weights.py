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

import os
from typing import Any, Dict, Optional

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
    w1 = arr("conv1.weight")
    if in_channels is not None:  # None → keep the checkpoint's channels
        w1 = _adapt_first_conv(w1, in_channels)
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


# ---------------------------------------------------------------------------
# Reference-checkpoint conversion (switch-over path for reference users)
# ---------------------------------------------------------------------------

def _conv_entry(sd, arr, prefix) -> Dict[str, Any]:
    out = {"w": _oihw_to_hwio(arr(f"{prefix}.weight"))}
    if f"{prefix}.bias" in sd:
        out["b"] = arr(f"{prefix}.bias")
    return out


def _make_arr(sd):
    def arr(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)
    return arr


def _double_conv_entry(sd, arr, prefix):
    """torch DoubleConv ``<prefix>.net.{0,1,3,4}`` (conv,bn,conv,bn —
    reference train/unet.py:66-75) → our {conv1,bn1,conv2,bn2}."""
    params = {"conv1": _conv_entry(sd, arr, f"{prefix}.net.0"),
              "conv2": _conv_entry(sd, arr, f"{prefix}.net.3"),
              "bn1": {"scale": arr(f"{prefix}.net.1.weight"),
                      "bias": arr(f"{prefix}.net.1.bias")},
              "bn2": {"scale": arr(f"{prefix}.net.4.weight"),
                      "bias": arr(f"{prefix}.net.4.bias")}}
    stats = {"bn1": {"mean": arr(f"{prefix}.net.1.running_mean"),
                     "var": arr(f"{prefix}.net.1.running_var")},
             "bn2": {"mean": arr(f"{prefix}.net.4.running_mean"),
                     "var": arr(f"{prefix}.net.4.running_var")}}
    return params, stats


def _convlstm_entry(sd, arr, prefix):
    """torch ConvLSTM ``<prefix>.layers.{l}.conv`` (reference
    train/unet.py:39-44) → our {layer{l}: {conv}}."""
    params = {}
    l = 0
    while f"{prefix}.layers.{l}.conv.weight" in sd:
        params[f"layer{l}"] = {
            "conv": _conv_entry(sd, arr, f"{prefix}.layers.{l}.conv")}
        l += 1
    return params


def convert_temporal_unet_checkpoint(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference TemporalUNetDualView ``model_state`` (the dict torch.save'd
    at reference main.py:307-323 / overfit_check.py:121-130) → our
    {'params', 'stats'} variables, ready for ``temporal_unet_apply``.

    Layer map (reference train/unet.py:131-159): inc/down1..3/bottleneck
    DoubleConvs (Down prefixes its DoubleConv with ``net.1``), ``temporal``
    ConvLSTM stack, optional ``lstm_skip3``/``lstm_skip2`` and
    ``attention.conv``, decoder ``up3..up0`` (ConvTranspose ``up`` + concat
    DoubleConv ``conv``), ``outc.conv`` head.
    """
    arr = _make_arr(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["inc"], stats["inc"] = _double_conv_entry(sd, arr, "inc")
    for name in ("down1", "down2", "down3", "bottleneck"):
        params[name], stats[name] = _double_conv_entry(sd, arr,
                                                       f"{name}.net.1")
    params["temporal"] = _convlstm_entry(sd, arr, "temporal")
    if "lstm_skip3.layers.0.conv.weight" in sd:
        params["skip3"] = _convlstm_entry(sd, arr, "lstm_skip3")
        params["skip2"] = _convlstm_entry(sd, arr, "lstm_skip2")
    if "attention.conv.weight" in sd:
        params["attention"] = {"w": _oihw_to_hwio(arr("attention.conv.weight"))}

    for name in ("up3", "up2", "up1", "up0"):
        w_t = arr(f"{name}.up.weight")  # torch ConvTranspose: (in,out,kh,kw)
        up_p = {"wt": np.ascontiguousarray(np.transpose(w_t, (2, 3, 1, 0)))}
        if f"{name}.up.bias" in sd:
            up_p["b"] = arr(f"{name}.up.bias")
        dc_p, dc_s = _double_conv_entry(sd, arr, f"{name}.conv")
        params[name] = {"up": up_p, "conv": dc_p}
        stats[name] = {"conv": dc_s}
    params["outc"] = _conv_entry(sd, arr, "outc.conv")
    return {"params": params, "stats": stats}


def convert_pretrained_temporal_unet_checkpoint(sd: Dict[str, Any]
                                                ) -> Dict[str, Any]:
    """Reference PretrainedTemporalUNet ``model_state`` → our resnet_unet
    variables. Maps: smp ResNet18 encoder (``encoder.*`` torchvision
    names), smp UnetDecoder (``decoder.blocks.{i}.conv{1,2}.{0,1}``),
    ``segmentation_head.0``, ``lstm.layers.*`` bottleneck ConvLSTM and
    ``lstm_skips.{i}.layers.*`` — the reference builds one skip-LSTM per
    encoder feature INCLUDING the stage-0 identity whose output its decoder
    discards (reference train/resnet18.py:64-74; SURVEY.md #6), so
    ``lstm_skips.{i+1}`` maps to our ``skip{i}``."""
    arr = _make_arr(sd)
    enc_sd = {k[len("encoder."):]: sd[k] for k in sd
              if k.startswith("encoder.")}
    conv = convert_resnet18_state_dict(enc_sd, in_channels=None)
    params: Dict[str, Any] = {"encoder": conv["params"]}
    stats: Dict[str, Any] = {"encoder": conv["stats"]}

    dec_p: Dict[str, Any] = {}
    dec_s: Dict[str, Any] = {}
    for i in range(5):
        pre = f"decoder.blocks.{i}"
        p = {"conv1": _conv_entry(sd, arr, f"{pre}.conv1.0"),
             "conv2": _conv_entry(sd, arr, f"{pre}.conv2.0"),
             "bn1": {"scale": arr(f"{pre}.conv1.1.weight"),
                     "bias": arr(f"{pre}.conv1.1.bias")},
             "bn2": {"scale": arr(f"{pre}.conv2.1.weight"),
                     "bias": arr(f"{pre}.conv2.1.bias")}}
        s = {"bn1": {"mean": arr(f"{pre}.conv1.1.running_mean"),
                     "var": arr(f"{pre}.conv1.1.running_var")},
             "bn2": {"mean": arr(f"{pre}.conv2.1.running_mean"),
                     "var": arr(f"{pre}.conv2.1.running_var")}}
        dec_p[f"block{i}"], dec_s[f"block{i}"] = p, s
    dec_p["head"] = _conv_entry(sd, arr, "segmentation_head.0")
    params["decoder"], stats["decoder"] = dec_p, dec_s

    params["temporal"] = _convlstm_entry(sd, arr, "lstm")
    # Decide the skip-LSTM index offset ONCE: 5 entries means lstm_skips.0
    # acted on the identity feature the smp decoder drops (skip it); 4
    # entries map one-to-one.
    offset = 1 if f"lstm_skips.4.layers.0.conv.weight" in sd else 0
    for i in range(4):
        params[f"skip{i}"] = _convlstm_entry(sd, arr,
                                             f"lstm_skips.{i + offset}")
    return {"params": params, "stats": stats}


# ---------------------------------------------------------------------------
# Reverse export: our checkpoint → reference torch state_dict (switch-BACK
# path — users can train here and keep serving/analysing with the
# reference's torch scripts)
# ---------------------------------------------------------------------------

def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32),
                                             (3, 2, 0, 1)))


def _np(v) -> np.ndarray:
    return np.asarray(v, np.float32)


def _export_conv(out: Dict[str, np.ndarray], prefix: str, p: Dict[str, Any]):
    out[f"{prefix}.weight"] = _hwio_to_oihw(p["w"])
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"])


def _export_bn(out: Dict[str, np.ndarray], prefix: str, p, s):
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])
    out[f"{prefix}.running_mean"] = _np(s["mean"])
    out[f"{prefix}.running_var"] = _np(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _export_double_conv(out, prefix: str, p, s):
    """Inverse of ``_double_conv_entry``: our {conv1,bn1,conv2,bn2} →
    reference DoubleConv ``<prefix>.net.{0,1,3,4}``."""
    _export_conv(out, f"{prefix}.net.0", p["conv1"])
    _export_bn(out, f"{prefix}.net.1", p["bn1"], s["bn1"])
    _export_conv(out, f"{prefix}.net.3", p["conv2"])
    _export_bn(out, f"{prefix}.net.4", p["bn2"], s["bn2"])


def _export_convlstm(out, prefix: str, p):
    for name, cell in sorted(p.items()):
        l = int(name[len("layer"):])
        _export_conv(out, f"{prefix}.layers.{l}.conv", cell["conv"])


def export_temporal_unet_checkpoint(variables: Dict[str, Any]
                                    ) -> Dict[str, np.ndarray]:
    """Our TemporalUNetDualView {'params','stats'} → the reference model's
    ``state_dict`` (numpy arrays; wrap in torch tensors for torch.save).
    Exact inverse of ``convert_temporal_unet_checkpoint`` — a round-trip is
    the identity, and the exported dict strict-loads into reference
    ``train/unet.py::TemporalUNetDualView`` (tested against the reference
    as a black-box oracle)."""
    p, s = variables["params"], variables["stats"]
    out: Dict[str, np.ndarray] = {}
    _export_double_conv(out, "inc", p["inc"], s["inc"])
    for name in ("down1", "down2", "down3", "bottleneck"):
        _export_double_conv(out, f"{name}.net.1", p[name], s[name])
    _export_convlstm(out, "temporal", p["temporal"])
    if "skip3" in p:
        _export_convlstm(out, "lstm_skip3", p["skip3"])
        _export_convlstm(out, "lstm_skip2", p["skip2"])
    if "attention" in p:
        out["attention.conv.weight"] = _hwio_to_oihw(p["attention"]["w"])
    for name in ("up3", "up2", "up1", "up0"):
        # our ConvTranspose weights are (kh, kw, out, in); torch
        # ConvTranspose2d.weight is (in, out, kh, kw). "w" accepted for
        # checkpoints written before the structural "wt" rename.
        up = p[name]["up"]
        out[f"{name}.up.weight"] = np.ascontiguousarray(np.transpose(
            _np(up["wt"] if "wt" in up else up["w"]), (3, 2, 0, 1)))
        if "b" in p[name]["up"]:
            out[f"{name}.up.bias"] = _np(p[name]["up"]["b"])
        _export_double_conv(out, f"{name}.conv", p[name]["conv"],
                            s[name]["conv"])
    _export_conv(out, "outc.conv", p["outc"])
    return out


def export_pretrained_temporal_unet_checkpoint(variables: Dict[str, Any]
                                               ) -> Dict[str, np.ndarray]:
    """Our resnet_unet {'params','stats'} → the reference
    PretrainedTemporalUNet ``state_dict`` naming (torchvision encoder under
    ``encoder.``, smp UnetDecoder blocks, ``segmentation_head.0``,
    bottleneck ``lstm`` and per-skip ``lstm_skips``). Inverse of
    ``convert_pretrained_temporal_unet_checkpoint``.

    The reference builds one extra skip-LSTM for the stage-0 identity
    feature whose output the smp decoder drops (reference
    train/resnet18.py:69-74 with encoder_out_channels[:-1]; smp UnetDecoder
    discards features[0]) — our model has no counterpart, so
    ``lstm_skips.0`` is emitted zero-filled: inference through the
    reference is unaffected."""
    p, s = variables["params"], variables["stats"]
    out: Dict[str, np.ndarray] = {}

    enc_p, enc_s = p["encoder"], s["encoder"]
    _export_conv(out, "encoder.conv1", enc_p["conv1"])
    _export_bn(out, "encoder.bn1", enc_p["bn1"], enc_s["bn1"])
    for li in range(1, 5):
        for bi in range(2):
            src = f"layer{li}_{bi}"
            dst = f"encoder.layer{li}.{bi}"
            bp, bs = enc_p[src], enc_s[src]
            _export_conv(out, f"{dst}.conv1", bp["conv1"])
            _export_conv(out, f"{dst}.conv2", bp["conv2"])
            _export_bn(out, f"{dst}.bn1", bp["bn1"], bs["bn1"])
            _export_bn(out, f"{dst}.bn2", bp["bn2"], bs["bn2"])
            if "down_conv" in bp:
                _export_conv(out, f"{dst}.downsample.0", bp["down_conv"])
                _export_bn(out, f"{dst}.downsample.1", bp["down_bn"],
                           bs["down_bn"])

    dec_p, dec_s = p["decoder"], s["decoder"]
    for i in range(5):
        bp, bs = dec_p[f"block{i}"], dec_s[f"block{i}"]
        pre = f"decoder.blocks.{i}"
        _export_conv(out, f"{pre}.conv1.0", bp["conv1"])
        _export_conv(out, f"{pre}.conv2.0", bp["conv2"])
        _export_bn(out, f"{pre}.conv1.1", bp["bn1"], bs["bn1"])
        _export_bn(out, f"{pre}.conv2.1", bp["bn2"], bs["bn2"])
    _export_conv(out, "segmentation_head.0", dec_p["head"])

    _export_convlstm(out, "lstm", p["temporal"])
    for i in range(4):
        _export_convlstm(out, f"lstm_skips.{i + 1}", p[f"skip{i}"])
    # zero-filled identity-stage LSTM (see docstring); its geometry follows
    # the model input channels and the skip lstm depth
    cin = int(np.shape(enc_p["conv1"]["w"])[2])
    n_layers = len(p["skip0"])
    for l in range(n_layers):
        in_dim = cin
        out[f"lstm_skips.0.layers.{l}.conv.weight"] = np.zeros(
            (4 * cin, in_dim + cin, 3, 3), np.float32)
        out[f"lstm_skips.0.layers.{l}.conv.bias"] = np.zeros(
            (4 * cin,), np.float32)
    return out


def export_resnet18_encoder_state_dict(variables: Dict[str, Any]
                                       ) -> Dict[str, np.ndarray]:
    """Our resnet_unet {'params','stats'} → a torchvision-format resnet18
    state_dict holding ONLY the encoder (``conv1.weight``, ``bn1.*``,
    ``layer{1..4}.{0,1}.*`` — the naming ``load_torch_resnet18`` /
    ``convert_resnet18_state_dict`` consume). Inverse of the encoder half
    of ``convert_resnet18_state_dict``; round-trips bit-exact when the
    input channel count matches (``_adapt_first_conv`` no-op).

    This is the save side of LOCAL encoder pretraining: train the JAX
    ResNet18-UNet on any local task, export its encoder with this, and
    feed the ``.pth`` back as ``pretrained_path`` — the same frozen-
    feature configuration the reference gets from ImageNet downloads
    (reference train/resnet18.py:26-33,41-44), with no network."""
    p, s = variables["params"]["encoder"], variables["stats"]["encoder"]
    out: Dict[str, np.ndarray] = {}
    _export_conv(out, "conv1", p["conv1"])
    _export_bn(out, "bn1", p["bn1"], s["bn1"])
    for li in range(1, 5):
        for bi in range(2):
            src = f"layer{li}_{bi}"
            dst = f"layer{li}.{bi}"
            bp, bs = p[src], s[src]
            _export_conv(out, f"{dst}.conv1", bp["conv1"])
            _export_conv(out, f"{dst}.conv2", bp["conv2"])
            _export_bn(out, f"{dst}.bn1", bp["bn1"], bs["bn1"])
            _export_bn(out, f"{dst}.bn2", bp["bn2"], bs["bn2"])
            if "down_conv" in bp:
                _export_conv(out, f"{dst}.downsample.0", bp["down_conv"])
                _export_bn(out, f"{dst}.downsample.1", bp["down_bn"],
                           bs["down_bn"])
    return out


def save_resnet18_encoder_pth(variables: Dict[str, Any], path: str) -> str:
    """Write the encoder of a resnet_unet checkpoint as a torch ``.pth``
    consumable by ``pretrained_path`` (torchvision resnet18 naming)."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_resnet18_encoder_state_dict(variables).items()}
    torch.save(sd, path)
    return path


def load_torch_resnet18(path: str, in_channels: int = 2) -> Dict[str, Any]:
    """Load + convert a local torchvision resnet18 checkpoint (.pth)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_resnet18_state_dict(sd, in_channels)


def find_resnet18_weights(root: Optional[str] = None) -> Optional[str]:
    """Locate an ImageNet resnet18 ``.pth`` in the standard torch hub cache
    layout (the place ``torchvision``/smp would have downloaded it to,
    reference train/resnet18.py:26-33), without any network access.

    Searched (first hit wins): an explicit ``root``, ``$TORCH_HOME``,
    ``~/.cache/torch``, and ``./data`` — each with and without the
    ``hub/checkpoints`` suffix. Returns the path or None."""
    import glob as _glob

    bases = []
    if root:
        bases.append(root)
    if os.environ.get("TORCH_HOME"):
        bases.append(os.environ["TORCH_HOME"])
    bases += [os.path.expanduser("~/.cache/torch"), "./data"]
    for base in bases:
        for sub in ("hub/checkpoints", "checkpoints", ""):
            hits = sorted(_glob.glob(
                os.path.join(base, sub, "resnet18-*.pth")))
            if hits:
                return hits[0]
    return None
