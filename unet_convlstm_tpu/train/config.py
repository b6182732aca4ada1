"""Training configuration — one dataclass tree + CLI overrides.

Replaces the reference's edit-in-place module constants (main.py:212-228)
with a serializable config that is embedded into every checkpoint (keeping
the reference's dispatch-on-saved-config capability, get_metrics.py:67-90).
Defaults mirror reference main.py:215-228.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional


@dataclasses.dataclass
class TrainConfig:
    # data
    npz_path: str = ""
    min_y: Optional[float] = None
    max_y: Optional[float] = None
    train_frac: float = 0.8
    split_seed: int = 42          # reference main.py:244
    # optimization (reference main.py:215-218, 106, 278-280)
    batch_size: int = 32
    # gradient accumulation: batch_size is processed as accum_steps scanned
    # microbatches before each optimizer update — effective batch batch_size
    # at the HBM footprint of batch_size/accum_steps (docs/PERF.md: B=64
    # OOMs resident, remat fits-but-loses; this is the third option)
    accum_steps: int = 1
    epochs: int = 200
    lr: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    plateau_factor: float = 0.5
    plateau_patience: int = 3
    min_lr: float = 0.0           # LR floor for plateau + guard cuts
    use_mask: bool = False        # reference main.py:219
    # raw-radiance cloud threshold (reference unet.py:279 hardcodes 1.1;
    # plots/show_sequences.py exists to tune it — here it is a config knob)
    mask_threshold: float = 1.1
    # model (type-dispatched; reference main.py:213, 224-228)
    model: Dict[str, Any] = dataclasses.field(default_factory=lambda: {
        "type": "custom", "base_ch": 64, "use_attention": False,
        "use_skip_lstm": True, "lstm_layers": 1,
    })
    # runtime
    seed: int = 42
    use_pallas: bool = False      # fused gate kernel (XLA fuses equally well)
    # sequence-flatten layout for the conv path (models/layout.py):
    # "auto" → "batch" (sharding-stable, zero batch collectives) when the
    # mesh's data degree > 1, else "time" (single-chip fastest, +0.7%)
    flat_layout: str = "auto"

    unroll: int = 10              # lax.scan unroll for the recurrences
    remat: bool = False           # jax.checkpoint the per-frame encoder
    mesh_data: Optional[int] = None   # None → all devices
    mesh_model: int = 1
    zero1: bool = False           # shard AdamW moments over 'data' (ZeRO-1)
    checkpoint_dir: str = "checkpoints"
    # periodic crash-recovery checkpoint: every N healthy epochs the
    # `<model>_last` checkpoint is refreshed (async Orbax save), so a
    # cold kill (SIGKILL/OOM/preemption) mid-run loses at most ~2N
    # epochs on resume — the save call itself plus the async commit,
    # whose device→host transfer shares the training link and can lag
    # by up to one more period (measured: endurance run killed at 90
    # resumed from 70 with N=10) — instead of rewinding to the last
    # BEST epoch (the only checkpoint the reference ever writes,
    # main.py:307-323). 0 = off (the _last checkpoint is then written
    # only at clean exit).
    save_last_every: int = 0
    tensorboard_dir: str = ""     # optional TB scalar logging
    log_every: int = 50
    # failure detection (train/guard.py — the reference has none, SURVEY §5)
    guard: bool = False           # epoch-level rollback on NaN/spiked loss
    guard_spike_factor: float = 10.0  # val loss > factor x median → rollback
    guard_max_events: int = 8     # rollback budget before giving up
    # where the guard keeps its rollback snapshot. "device" copies the
    # train state inside HBM (milliseconds; costs one extra state copy of
    # HBM). "host" pulls it to host RAM (free HBM, but a full params+
    # optimizer device_get per epoch — ~45 s/epoch for the production
    # cloud model through the TPU tunnel). Use "host" only when HBM is
    # within one state copy of full.
    guard_snapshot: str = "device"
    skip_nonfinite_updates: Optional[int] = None  # on-device grad-NaN skip:
    # max consecutive skipped steps (optax.apply_if_finite), None = off

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def apply_overrides(self, overrides: Dict[str, str]) -> "TrainConfig":
        """Apply 'key=value' CLI overrides ('model.base_ch=32' supported).
        Coerces by the current value's type; None-defaulted fields
        (mesh_data, min_y, ...) parse as int/float/bool/None literals."""
        d = self.to_dict()
        for key, val in overrides.items():
            tgt = d
            parts = key.split(".")
            # typo'd top-level keys must fail loudly, not train with the
            # override silently ignored ('model.*' stays open-ended — model
            # configs are type-specific dicts)
            if parts[0] not in d:
                raise KeyError(
                    f"unknown config key {parts[0]!r} in override {key!r}; "
                    f"valid keys: {sorted(d)}")
            for p in parts[:-1]:
                tgt = tgt[p]
            old = tgt.get(parts[-1])
            if isinstance(old, bool):
                tgt[parts[-1]] = val.lower() in ("1", "true", "yes")
            elif isinstance(old, int):
                tgt[parts[-1]] = int(val)
            elif isinstance(old, float):
                tgt[parts[-1]] = float(val)
            elif old is None:
                if val.lower() in ("none", "null"):
                    tgt[parts[-1]] = None
                elif val.lower() in ("true", "false", "yes", "no"):
                    # model.freeze_encoder=false etc.: keys absent from the
                    # default dict must not silently become truthy strings
                    tgt[parts[-1]] = val.lower() in ("true", "yes")
                else:
                    try:
                        tgt[parts[-1]] = int(val)
                    except ValueError:
                        try:
                            tgt[parts[-1]] = float(val)
                        except ValueError:
                            tgt[parts[-1]] = val
            else:
                tgt[parts[-1]] = val
        return TrainConfig.from_dict(d)
