"""Training subsystem: jitted steps, optimizer, LR plateau schedule,
on-device metrics, Orbax checkpointing and the epoch driver.

Capability parity with reference main.py (config at main.py:211-228, loops at
main.py:77-205, checkpointing at main.py:306-323), re-designed TPU-first:

* ``steps``      — one fused jitted train/eval step: device-side
                   normalization, forward, loss, backward, optimizer update,
                   metric reduction. Donated buffers; zero per-step host math.
* ``optim``      — optax AdamW + global-norm clip with a runtime-adjustable
                   learning rate (ReduceLROnPlateau equivalent) and optional
                   frozen-parameter masking.
* ``metrics``    — sum/count/sumsq accumulators in denormalized units
                   (replaces the reference's O(pixels) host lists,
                   main.py:125-133).
* ``checkpoint`` — Orbax checkpoints carrying params + BN stats + optimizer
                   state + step + config (the reference saves no optimizer
                   state — no true resume; we do).
* ``loop``       — epoch driver wiring it all together.
"""

from .config import TrainConfig  # noqa: F401
from .metrics import MetricSums, metric_sums_init, metric_sums_update  # noqa: F401
from .optim import make_optimizer, ReduceLROnPlateau, set_learning_rate  # noqa: F401
from .steps import make_train_step, make_eval_step  # noqa: F401
from .checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint  # noqa: F401
from .loop import fit  # noqa: F401
