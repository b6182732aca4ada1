"""unet_convlstm_tpu — a TPU-native (JAX/XLA/Pallas) spatiotemporal cloud-velocity
prediction framework.

Re-designed from scratch for TPU hardware with the same capabilities as the
reference PyTorch/CUDA pipeline (dordanino12/unet-convlstm):

* ``ops``      — conv/UNet blocks, scan-based ConvLSTM (+ Pallas fused step),
                 losses, normalization, area resize.
* ``models``   — TemporalUNetDualView and PretrainedTemporalUNet (ResNet18-UNet).
* ``data``     — Moving-MNIST generator (call-order compatible with the
                 reference), NPZ sequence dataset and device-feeding pipeline.
* ``datagen``  — LES-patch ingest, microphysics → extinction, JAX ray-caster
                 (first-hit / z-slice), volumetric renderer, sequence assembly.
* ``train``    — jitted train/eval steps, AdamW + ReduceLROnPlateau, Orbax
                 checkpoints, on-device metric reductions.
* ``parallel`` — mesh construction and sharding rules (DP over ICI; optional
                 channel/spatial sharding for scale-up).
* ``eval``     — metric suites, streaming rollout.

Design principles (TPU-first, not a port):

* NHWC layout everywhere on device; the time axis is driven by
  ``jax.lax.scan`` — never a host-side Python loop.
* Encoder/decoder run batched over ``B*T``; only the recurrence is scanned.
* bfloat16 compute with float32 params/accumulation by default.
* All normalization/denormalization/metrics are pure jittable functions;
  metric accumulation happens on device (sum/count/sumsq), not host lists.
"""

__version__ = "0.1.0"
