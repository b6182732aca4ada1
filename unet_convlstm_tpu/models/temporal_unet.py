"""TemporalUNetDualView — dual-satellite UNet with ConvLSTM bottleneck/skips.

Capability parity with reference ``train/unet.py:131-204`` (TemporalUNetDualView):

* Encoder inc/down1..3/bottleneck with channels base_ch*{1,2,4,8,16}.
* Optional CBAM spatial attention at the bottleneck.
* ConvLSTM (``lstm_layers`` deep) over the bottleneck sequence.
* Optional ConvLSTMs on the two deepest skips (x3: 8*base_ch, x2: 4*base_ch).
* Per-frame decoder up3..up0 + 1x1 head.
* Input: a [B, T, H, W, 2*in_channels_per_sat] sequence (one channel per
  satellite view); output [B, T, H, W, out_channels] + recurrent state.

TPU-first re-design (NOT a translation):

* The encoder and decoder run **batched over B*T** (one big NHWC conv batch
  that keeps the MXU full); the reference loops frames in Python for this
  model (unet.py:179-181,195-202).
* Only the recurrences are sequential, via ``lax.scan`` (ops/convlstm.py).
* A streaming carry (``state``) makes autoregressive rollout O(1) per frame —
  the reference recomputes the whole prefix per step (test.py:305-316).
* BatchNorm batch statistics are computed over B*T frames (the reference
  custom model normalized each frame separately in train mode; eval-mode
  behaviour is identical).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, DEFAULT_POLICY
from ..ops.blocks import (
    double_conv_init, double_conv,
    down_init, down,
    up_init, up,
    out_conv_init, out_conv,
    spatial_attention_init, spatial_attention,
)
from ..ops.convlstm import convlstm_init, convlstm, convlstm_zero_state


@dataclasses.dataclass(frozen=True)
class TemporalUNetConfig:
    in_channels_per_sat: int = 1
    out_channels: int = 1
    base_ch: int = 32
    lstm_layers: int = 1
    use_skip_lstm: bool = False
    use_attention: bool = False

    @property
    def in_ch_total(self) -> int:
        return self.in_channels_per_sat * 2

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in {f.name for f in dataclasses.fields(cls)}})


def temporal_unet_init(key, cfg: TemporalUNetConfig):
    bc = cfg.base_ch
    names = ["inc", "down1", "down2", "down3", "bottleneck",
             "temporal", "skip3", "skip2", "attention",
             "up3", "up2", "up1", "up0", "outc"]
    keys = dict(zip(names, jax.random.split(key, len(names))))

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["inc"], stats["inc"] = double_conv_init(keys["inc"], cfg.in_ch_total, bc)
    params["down1"], stats["down1"] = down_init(keys["down1"], bc, bc * 2)
    params["down2"], stats["down2"] = down_init(keys["down2"], bc * 2, bc * 4)
    params["down3"], stats["down3"] = down_init(keys["down3"], bc * 4, bc * 8)
    params["bottleneck"], stats["bottleneck"] = down_init(keys["bottleneck"], bc * 8, bc * 16)

    if cfg.use_attention:
        params["attention"] = spatial_attention_init(keys["attention"])

    params["temporal"] = convlstm_init(keys["temporal"], bc * 16, bc * 16,
                                       cfg.lstm_layers)
    if cfg.use_skip_lstm:
        params["skip3"] = convlstm_init(keys["skip3"], bc * 8, bc * 8)
        params["skip2"] = convlstm_init(keys["skip2"], bc * 4, bc * 4)

    params["up3"], stats["up3"] = up_init(keys["up3"], bc * 16, bc * 8)
    params["up2"], stats["up2"] = up_init(keys["up2"], bc * 8, bc * 4)
    params["up1"], stats["up1"] = up_init(keys["up1"], bc * 4, bc * 2)
    params["up0"], stats["up0"] = up_init(keys["up0"], bc * 2, bc)
    params["outc"] = out_conv_init(keys["outc"], bc, cfg.out_channels)

    return {"params": params, "stats": stats}


def temporal_unet_init_state(cfg: TemporalUNetConfig, batch: int,
                             height: int, width: int, dtype=jnp.float32):
    """Zero recurrent state for streaming rollout (h//16 x w//16 bottleneck)."""
    bc = cfg.base_ch
    h16, w16 = height // 16, width // 16
    state = {
        "temporal": [convlstm_zero_state(batch, h16, w16, bc * 16, dtype)
                     for _ in range(cfg.lstm_layers)],
    }
    if cfg.use_skip_lstm:
        state["skip3"] = [convlstm_zero_state(batch, height // 8, width // 8,
                                              bc * 8, dtype)]
        state["skip2"] = [convlstm_zero_state(batch, height // 4, width // 4,
                                              bc * 4, dtype)]
    return state


def _encode(params, stats, x_bt, cfg: TemporalUNetConfig, train: bool,
            policy: Policy, fused: bool = False):
    """x_bt: [B*T, H, W, Cin] → (bottleneck, skips, new_stats)."""
    ns: Dict[str, Any] = {}
    x0, ns["inc"] = double_conv(params["inc"], stats["inc"], x_bt, train,
                                policy, fused=fused)
    x1, ns["down1"] = down(params["down1"], stats["down1"], x0, train,
                           policy, fused=fused)
    x2, ns["down2"] = down(params["down2"], stats["down2"], x1, train,
                           policy, fused=fused)
    x3, ns["down3"] = down(params["down3"], stats["down3"], x2, train,
                           policy, fused=fused)
    xb, ns["bottleneck"] = down(params["bottleneck"], stats["bottleneck"], x3,
                                train, policy, fused=fused)
    if cfg.use_attention:
        xb = spatial_attention(params["attention"], xb, policy)
    return xb, (x3, x2, x1, x0), ns


def _decode(params, stats, xb_bt, skips_bt, cfg: TemporalUNetConfig,
            train: bool, policy: Policy, fused: bool = False):
    ns: Dict[str, Any] = {}
    x3, x2, x1, x0 = skips_bt
    d3, ns["up3"] = up(params["up3"], stats["up3"], xb_bt, x3, train,
                       policy, fused=fused)
    d2, ns["up2"] = up(params["up2"], stats["up2"], d3, x2, train,
                       policy, fused=fused)
    d1, ns["up1"] = up(params["up1"], stats["up1"], d2, x1, train,
                       policy, fused=fused)
    d0, ns["up0"] = up(params["up0"], stats["up0"], d1, x0, train,
                       policy, fused=fused)
    y = out_conv(params["outc"], d0, policy)
    return y, ns


from .layout import (flatten_seq as _flatten_seq,  # noqa: E402
                     unflatten_seq as _unflatten_seq,
                     to_time_major as _to_time_major,
                     to_batch_major as _to_batch_major)


def temporal_unet_apply(variables, x_seq: jax.Array,
                        cfg: TemporalUNetConfig,
                        state: Optional[Dict[str, Any]] = None,
                        train: bool = False,
                        policy: Policy = DEFAULT_POLICY,
                        use_pallas: bool = False,
                        use_fused_doubleconv: bool = False,
                        unroll: int = 1,
                        remat: bool = False,
                        flat_layout: str = "time"
                        ) -> Tuple[jax.Array, Dict[str, Any], Dict[str, Any]]:
    """Forward over a full sequence.

    x_seq: [B, T, H, W, 2*in_per_sat]  →  (y_seq [B,T,H,W,out], new_state,
    new_stats).  Pass ``state`` from a previous call for streaming rollout.
    ``flat_layout``: "time" (single-chip fastest) or "batch"
    (sharding-stable under a data mesh) — see models/layout.py.
    """
    params, stats = variables["params"], variables["stats"]
    B, T = x_seq.shape[0], x_seq.shape[1]

    # --- Encoder, batched over all T*B frames (MXU-friendly) ---
    # BatchNorm batch statistics are order-invariant, so both flatten
    # layouts compute the same function (models/layout.py).
    x_bt = _flatten_seq(x_seq, flat_layout)
    encode = (jax.checkpoint(_encode, static_argnums=(3, 4, 5, 6))
              if remat else _encode)
    xb, skips, enc_stats = encode(params, stats, x_bt, cfg, train, policy,
                                  use_fused_doubleconv)

    # --- Temporal recurrence at the bottleneck (lax.scan) ---
    xb_tm = _to_time_major(xb, B, T, flat_layout)
    lstm_state = None if state is None else state.get("temporal")
    xb_out_tm, new_temporal = convlstm(params["temporal"], xb_tm,
                                       state=lstm_state, policy=policy,
                                       use_pallas=use_pallas, unroll=unroll,
                                       flat_layout=flat_layout)
    new_state: Dict[str, Any] = {"temporal": new_temporal}

    # --- Optional skip recurrences ---
    x3, x2, x1, x0 = skips
    if cfg.use_skip_lstm:
        x3_tm = _to_time_major(x3, B, T, flat_layout)
        x2_tm = _to_time_major(x2, B, T, flat_layout)
        s3 = None if state is None else state.get("skip3")
        s2 = None if state is None else state.get("skip2")
        x3_out, new_s3 = convlstm(params["skip3"], x3_tm, state=s3,
                                  policy=policy, use_pallas=use_pallas,
                                  unroll=unroll,
                                  flat_layout=flat_layout)
        x2_out, new_s2 = convlstm(params["skip2"], x2_tm, state=s2,
                                  policy=policy, use_pallas=use_pallas,
                                  unroll=unroll,
                                  flat_layout=flat_layout)
        x3 = _to_batch_major(x3_out, B, T, flat_layout)
        x2 = _to_batch_major(x2_out, B, T, flat_layout)
        new_state["skip3"] = new_s3
        new_state["skip2"] = new_s2

    # --- Decoder, batched over B*T ---
    # remat covers the decoder too: its up-sampled activations are the
    # LARGEST live tensors of the backward pass (full-res maps at base_ch
    # width) — recomputing them is what lets B=64 fit the production
    # config's HBM (docs/PERF.md knob sweep).
    xb_bt = _to_batch_major(xb_out_tm, B, T, flat_layout)
    decode = (jax.checkpoint(_decode, static_argnums=(4, 5, 6, 7))
              if remat else _decode)
    y_bt, dec_stats = decode(params, stats, xb_bt.astype(x_bt.dtype),
                             (x3, x2, x1, x0), cfg, train, policy,
                             use_fused_doubleconv)

    # back to [B, T, ...] only at the (small, out_ch-wide) output
    y_seq = _unflatten_seq(y_bt, B, T, flat_layout)
    new_stats = {**enc_stats, **dec_stats}
    return y_seq, new_state, new_stats
