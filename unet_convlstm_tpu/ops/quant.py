"""Post-training int8 quantization for inference.

The reference has no quantized path (it trains and infers in f32/TF32 —
main.py:230 just picks cuda). This is a TPU-native performance feature:
the v5e MXU executes int8×int8→int32 at 2× its bf16 FLOP rate (394 vs
197 peak T-ops), and the production-geometry forward pass is FLOP-bound
(docs/PERF.md "Production cloud config" — arithmetic intensity above the
ridge), so quantized batch inference targets up to ~2× throughput where
bf16 already saturates the MXU.

Scheme (standard symmetric PTQ):

* **Weights**: per-output-channel symmetric int8 — ``w_q = round(w / s)``
  with ``s = max|w| / 127`` reduced over all axes except the output
  channel. Quantized offline, once, by :func:`quantize_tree`.
* **Activations**: dynamic per-tensor symmetric int8 at each conv — the
  scale is ``max|x| / 127`` computed on the fly (one reduction, fused by
  XLA into the surrounding elementwise work). No calibration pass needed;
  ReLU/BN keep activation ranges benign in this architecture.
* **Accumulation**: int32 inside the conv (``preferred_element_type``),
  dequantized by the scalar product of the two scales; bias added in f32.

Dispatch is transparent: :func:`quantize_tree` rewrites every conv-kernel
leaf ``{"w": f32 [kh,kw,I,O]}`` to ``{"w_q": int8, "w_s": f32 [O]}``, and
``ops.conv.conv2d`` / ``conv_transpose2d`` route to the int8 kernels when
they see ``w_q`` — model code is untouched, and the ConvLSTM stack simply
takes its fused (non-hoisted) branch for quantized cells. BatchNorm
statistics, biases and all non-conv parameters stay in f32.

Inference-only: ``round`` has no useful gradient and none is defined —
training stays bf16/f32 (the measured roofline there is HBM/FLOP-bound in
ways PTQ doesn't address; docs/PERF.md).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

INT8_MAX = 127.0


def _quantize_weight(w: jax.Array, out_axis: int) -> Tuple[jax.Array,
                                                           jax.Array]:
    """Per-output-channel symmetric int8: returns (w_q int8, scale f32 [O])."""
    w = w.astype(jnp.float32)
    reduce_axes = tuple(a for a in range(w.ndim) if a != out_axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.where(amax > 0, amax / INT8_MAX, 1.0)
    shape = [1] * w.ndim
    shape[out_axis] = -1
    w_q = jnp.clip(jnp.round(w / scale.reshape(shape)),
                   -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return w_q, scale


def _quantize_act(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-tensor symmetric int8: returns (x_q int8, scale f32 [])."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x))
    scale = jnp.where(amax > 0, amax / INT8_MAX, 1.0)
    x_q = jnp.clip(jnp.round(x / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return x_q, scale


def quantize_conv_params(params: dict, out_axis: int | None = None) -> dict:
    """``{"w", "b"?}`` → ``{"w_q", "w_s", "b"?}`` and
    ``{"wt", "b"?}`` → ``{"wt_q", "wt_s", "b"?}``.

    The layout is detected STRUCTURALLY from the weight key: ``"w"`` is an
    HWIO conv2d kernel (out axis 3), ``"wt"`` is an HWOI transposed kernel
    (out axis 2 — ops/conv.py ``transpose_kernel=True`` layout, written by
    ``conv_transpose2d_init``). ``out_axis`` overrides only for exotic
    layouts."""
    if "wt" in params:
        w_q, w_s = _quantize_weight(params["wt"],
                                    2 if out_axis is None else out_axis)
        out = {"wt_q": w_q, "wt_s": w_s}
    else:
        w_q, w_s = _quantize_weight(params["w"],
                                    3 if out_axis is None else out_axis)
        out = {"w_q": w_q, "w_s": w_s}
    if "b" in params:
        out["b"] = params["b"]
    return out


def conv2d_int8(params: dict, x: jax.Array, stride: int = 1,
                padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                out_dtype=jnp.float32) -> jax.Array:
    """int8 NHWC conv: dynamic per-tensor activation quant, int32 MXU
    accumulation, per-channel dequant. Output in ``out_dtype``."""
    if params["w_s"].shape[0] != params["w_q"].shape[3]:
        raise ValueError(
            f"w_s has {params['w_s'].shape[0]} scales but the HWIO kernel "
            f"has {params['w_q'].shape[3]} output channels — was a "
            "transposed (HWOI) kernel quantized as a regular conv? "
            "Transposed kernels must live under the structural 'wt' key "
            "(ops/conv.py::conv_transpose2d_init) so quantize_tree scales "
            "them on out_axis=2")
    x_q, x_s = _quantize_act(x)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = lax.conv_general_dilated(
        x_q, params["w_q"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32,
    )
    scale = x_s * params["w_s"].astype(jnp.float32)   # [O], broadcast on C
    y = y.astype(jnp.float32) * scale
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def conv_transpose2d_int8(params: dict, x: jax.Array, stride: int = 2,
                          out_dtype=jnp.float32) -> jax.Array:
    """int8 transposed conv (kernel in the HWOI gradient-of-conv layout,
    matching ops/conv.conv_transpose2d; quantized leaves keyed ``wt_q`` /
    ``wt_s`` to preserve the structural layout tag)."""
    if params["wt_s"].shape[0] != params["wt_q"].shape[2]:
        raise ValueError(
            f"wt_s has {params['wt_s'].shape[0]} scales but the HWOI kernel "
            f"has {params['wt_q'].shape[2]} output channels — quantize "
            "transposed kernels via quantize_conv_params on their 'wt' leaf")
    x_q, x_s = _quantize_act(x)
    y = lax.conv_transpose(
        x_q, params["wt_q"],
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        preferred_element_type=jnp.int32,
    )
    scale = x_s * params["wt_s"].astype(jnp.float32)
    y = y.astype(jnp.float32) * scale
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(out_dtype)


def quantize_tree(variables: dict) -> dict:
    """Rewrite every conv-kernel leaf dict in a model's ``variables`` to
    its int8 form (``params`` subtree only; BN ``stats`` pass through).

    A conv leaf is any dict holding a 4-D ``"w"`` (HWIO, scale axis 3) or
    a 4-D ``"wt"`` (HWOI transposed layout, scale axis 2). The layout is
    a STRUCTURAL property of the leaf key — written by conv2d_init /
    conv_transpose2d_init respectively — so a new model family can never
    silently quantize a transposed kernel on the wrong axis by storing it
    under an unexpected block name. Legacy trees (pre-rename checkpoints)
    that still hold a transposed kernel as ``"w"`` under an ``"up"`` block
    are refused loudly. Returns a NEW tree; the input is not mutated.
    """
    def walk(node, key=None):
        if isinstance(node, dict):
            if "wt" in node and getattr(node["wt"], "ndim", 0) == 4:
                return quantize_conv_params(node)
            if "w" in node and getattr(node["w"], "ndim", 0) == 4:
                if key == "up":
                    raise ValueError(
                        "legacy checkpoint: transposed kernel stored as "
                        "'w' under an 'up' block — re-save the checkpoint "
                        "(the float path still loads it) so the kernel "
                        "carries its structural 'wt' tag before int8 "
                        "quantization")
                return quantize_conv_params(node)
            return {k: walk(v, k) for k, v in node.items()}
        return node

    out = dict(variables)
    if "params" in out:
        out["params"] = walk(out["params"])
    else:
        out = walk(out)
    return out
