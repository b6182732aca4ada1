"""Mixed-precision policy.

TPU MXU throughput doubles in bfloat16 and HBM traffic halves, so the default
policy computes convolutions in bf16 while keeping parameters, BatchNorm
statistics, losses and optimizer state in float32.  On TPU the MXU
accumulates bf16 convs in f32 natively; ``conv2d`` deliberately does NOT
force a ``preferred_element_type`` upcast (ops/conv.py explains why —
the f32 output would break the conv gradient rule and double the HBM
write), so on non-TPU backends the conv output precision is the
backend's bf16-conv default. Reductions that need guaranteed f32 (BN
stats, losses, the recurrence) upcast explicitly at their call sites.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32
    # XLA dot/conv precision. bf16 compute uses DEFAULT (native MXU bf16);
    # f32 compute requests HIGHEST so results are true fp32 (JAX's default
    # otherwise runs f32 convs in lower-precision passes).
    precision: lax.Precision = lax.Precision.DEFAULT

    def cast_input(self, x):
        return x.astype(self.compute_dtype)

    def cast_param(self, p):
        # integer leaves (int8 quantized kernels, ops/quant.py) keep their
        # dtype — casting them to the float compute dtype would silently
        # dequantize without the scale
        if not jnp.issubdtype(p.dtype, jnp.floating):
            return p
        return p.astype(self.compute_dtype)

    def cast_output(self, y):
        return y.astype(self.accum_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32,
                     precision=lax.Precision.HIGHEST)
