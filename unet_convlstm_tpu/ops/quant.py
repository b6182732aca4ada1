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
* **Activations**: two modes.
  - *Dynamic* (default): per-tensor symmetric int8 at each conv — the
    scale is ``max|x| / 127`` computed on the fly. Zero setup, but the
    amax REDUCTION forces every conv input to materialize in bf16/f32
    first (a full extra read+write per conv) — measured as the reason
    weight-only int8 capped at 1.10× on the HBM-bound resnet family
    (docs/PERF.md round 4).
  - *Calibrated static* (:func:`calibrate_tree`): per-site scales are
    measured once over N calibration batches and stored as compile-time
    constants (``x_s`` leaves). The quantize chain
    ``round(x/x_s)→clip→int8`` is then pure elementwise, so XLA fuses it
    into the producer's epilogue and the conv input only ever hits HBM
    at int8 width — the activation-byte reduction named as the resnet
    family's remaining lever (VERDICT r4 #2). Inputs beyond the
    calibration range clip at ±127; calibrate on data that covers the
    deployment distribution.
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

import contextlib
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

INT8_MAX = 127.0


class SiteTag:
    """Static per-conv-site identity for activation calibration.

    Registered as a pytree node with NO leaves (the id rides in the aux
    data), so under ``jit`` it stays a concrete Python value at trace
    time — which is what lets the calibration callback key its recordings
    by site, and lets ``attach_act_scales`` map them back onto the tree.
    ``tree_map`` / ``device_put`` / sharding all pass it through untouched
    (no array leaves)."""

    def __init__(self, sid: int):
        self.sid = sid

    def __repr__(self):
        return f"SiteTag({self.sid})"

    def __eq__(self, other):
        return isinstance(other, SiteTag) and other.sid == self.sid

    def __hash__(self):
        return hash(("SiteTag", self.sid))


jax.tree_util.register_pytree_node(
    SiteTag, lambda t: ((), t.sid), lambda sid, _: SiteTag(sid))

# site id -> running amax (host floats), active only inside
# act_calibration(); conv ops consult this at TRACE time, so functions
# jitted outside a calibration context carry zero recording overhead
_CALIB: Optional[Dict[int, float]] = None


def _record_amax(sid: int, amax) -> None:
    cur = _CALIB.get(sid, 0.0) if _CALIB is not None else 0.0
    if _CALIB is not None:
        _CALIB[sid] = max(cur, float(amax))


def _calib_hook(params: dict, x_f32: jax.Array) -> None:
    """Inside an active calibration context, record this site's |x| max —
    via ``io_callback`` so it works under jit AND inside ``lax.scan``
    (the quantized ConvLSTM cell's conv lives in the scan body)."""
    if _CALIB is None:
        return
    tag = params.get("site")
    if tag is None:
        return
    from jax.experimental import io_callback
    from functools import partial

    io_callback(partial(_record_amax, tag.sid), None,
                jnp.max(jnp.abs(x_f32)), ordered=False)


@contextlib.contextmanager
def act_calibration():
    """Collect per-site activation ranges from every quantized conv that
    executes inside this context (dynamic-quant mode). Yields the
    site→amax dict; pass it to :func:`attach_act_scales`.

    Functions must be TRACED inside the context for recording to be
    compiled in — use a fresh ``jax.jit`` (or eager calls), not a
    previously-compiled one, and ``block_until_ready`` the last output
    before leaving the context so the async callbacks have landed."""
    global _CALIB
    if _CALIB is not None:
        raise RuntimeError("act_calibration() contexts do not nest")
    _CALIB = {}
    try:
        yield _CALIB
    finally:
        _CALIB = None


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
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    if "x_s" not in params and _CALIB is not None:
        # CALIBRATION pass: record the input range, then run the conv in
        # f32 with dequantized weights — textbook PTQ observes ranges on
        # the float model, and the CPU backend (where calibration runs,
        # see calibrate_tree) executes int8 convs orders of magnitude
        # slower than f32 ones. The int8 path below is never traced here.
        _calib_hook(params, x.astype(jnp.float32))
        w = (params["w_q"].astype(jnp.float32)
             * params["w_s"].reshape(1, 1, 1, -1))
        y = lax.conv_general_dilated(
            x.astype(jnp.float32), w, window_strides=(stride, stride),
            padding=padding, dimension_numbers=dimension_numbers)
        if "b" in params:
            y = y + params["b"].astype(jnp.float32)
        return y.astype(out_dtype)
    if "x_s" in params:
        # calibrated static scale: pure elementwise quantize — XLA fuses
        # it into the producer, the input reaches HBM at int8 width only
        x_s = params["x_s"].astype(jnp.float32)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_s),
                       -INT8_MAX, INT8_MAX).astype(jnp.int8)
    else:
        x_q, x_s = _quantize_act(x)
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
    if "x_s" not in params and _CALIB is not None:
        # calibration pass: record + f32 conv with dequantized weights
        # (see conv2d_int8)
        _calib_hook(params, x.astype(jnp.float32))
        w = (params["wt_q"].astype(jnp.float32)
             * params["wt_s"].reshape(1, 1, -1, 1))
        y = lax.conv_transpose(
            x.astype(jnp.float32), w, strides=(stride, stride),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        if "b" in params:
            y = y + params["b"].astype(jnp.float32)
        return y.astype(out_dtype)
    if "x_s" in params:
        x_s = params["x_s"].astype(jnp.float32)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_s),
                       -INT8_MAX, INT8_MAX).astype(jnp.int8)
    else:
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
    counter = [0]

    def tagged(node):
        q = quantize_conv_params(node)
        # deterministic tree-walk site id (dicts iterate insertion-
        # ordered) — the calibration key attach_act_scales maps back
        q["site"] = SiteTag(counter[0])
        counter[0] += 1
        return q

    def walk(node, key=None):
        if isinstance(node, dict):
            if "wt" in node and getattr(node["wt"], "ndim", 0) == 4:
                return tagged(node)
            if "w" in node and getattr(node["w"], "ndim", 0) == 4:
                if key == "up":
                    raise ValueError(
                        "legacy checkpoint: transposed kernel stored as "
                        "'w' under an 'up' block — re-save the checkpoint "
                        "(the float path still loads it) so the kernel "
                        "carries its structural 'wt' tag before int8 "
                        "quantization")
                return tagged(node)
            return {k: walk(v, k) for k, v in node.items()}
        return node

    out = dict(variables)
    if "params" in out:
        out["params"] = walk(out["params"])
    else:
        out = walk(out)
    return out


def attach_act_scales(qvariables: dict, ranges: Dict[int, float]) -> dict:
    """Attach calibrated static activation scales to a quantized tree.

    ``ranges``: site id → measured |x| max (from :func:`act_calibration`).
    Each quantized conv leaf whose site has a positive recorded range gets
    ``x_s = amax / 127`` as a compile-time-constant scalar; sites never
    executed during calibration keep dynamic quantization (and a site
    with amax == 0 — an all-zero activation — also stays dynamic rather
    than pinning a degenerate scale). Returns a NEW tree."""

    def walk(node):
        if isinstance(node, dict):
            tag = node.get("site")
            if isinstance(tag, SiteTag) and ("w_q" in node
                                             or "wt_q" in node):
                amax = ranges.get(tag.sid, 0.0)
                if amax > 0.0:
                    out = dict(node)
                    out["x_s"] = jnp.float32(amax / INT8_MAX)
                    return out
                return node
            return {k: walk(v) for k, v in node.items()}
        return node

    out = dict(qvariables)
    if "params" in out:
        out["params"] = walk(out["params"])
    else:
        out = walk(out)
    return out


def calibrate_tree(apply_fn, qvariables: dict, batches,
                   device=None, **apply_kw) -> dict:
    """Turnkey static-activation calibration (VERDICT r4 #2).

    Runs ``apply_fn(qvariables, x, train=False)`` over the calibration
    ``batches`` (an iterable of [B,T,H,W,C] arrays, already normalized —
    the same tensors inference will see) under a PRIVATE jit inside an
    :func:`act_calibration` context, then returns the tree with static
    per-site ``x_s`` scales attached. The calibration forward is pinned
    to the CPU BACKEND by default — range collection needs host
    callbacks (``io_callback``), which the axon TPU runtime does not
    support (``UNIMPLEMENTED: axon_pjrt does not support host send/recv
    callbacks``) — and runs EAGER, not jitted: activation maxima are
    device-agnostic, and a monolithic XLA-CPU compile of the production
    model costs minutes for a one-off pass. The returned tree's arrays
    are the ones passed in (still wherever the caller put them) plus
    host-scalar ``x_s``."""
    if device is None:
        try:
            device = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            device = None  # no CPU backend: run wherever we are
    qv = jax.device_put(qvariables, device) if device is not None \
        else qvariables
    ctx = (jax.default_device(device) if device is not None
           else contextlib.nullcontext())
    with act_calibration() as ranges, ctx:
        # EAGER on purpose: a monolithic jit of the production model for
        # the CPU backend costs minutes of XLA-CPU compile for a one-off
        # pass; eager dispatch only compiles the small per-op kernels
        # (the scan bodies still trace, which io_callback handles)
        out = None
        for xb in batches:
            y, _, _ = apply_fn(qv, jnp.asarray(xb), train=False,
                               **apply_kw)
            out = y
        if out is None:
            raise ValueError("calibrate_tree: no calibration batches given")
        jax.block_until_ready(out)
    return attach_act_scales(qvariables, ranges)
