"""Sequence parallelism: the time-pipelined ConvLSTM must equal the
single-device scan exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_convlstm_tpu.core.dtypes import FP32_POLICY
from unet_convlstm_tpu.ops.convlstm import (
    convlstm_cell_init, convlstm, convlstm_zero_state,
)
from unet_convlstm_tpu.ops.convlstm_sp import convlstm_time_pipelined
from unet_convlstm_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("microbatches", [1, 2])
def test_time_pipelined_matches_scan(rng, microbatches):
    mesh = make_mesh(data=4, model=1)
    T, B, H, W, Cin, hidden = 8, 4, 4, 4, 3, 4
    params = convlstm_cell_init(jax.random.PRNGKey(0), Cin, hidden)
    x = jnp.asarray(rng.standard_normal((T, B, H, W, Cin),
                                        dtype=np.float32))

    ref_out, ref_states = convlstm({"layer0": params}, x,
                                   policy=FP32_POLICY)
    h_ref, c_ref = ref_states[0]

    y, (h, c) = convlstm_time_pipelined(params, x, mesh, axis="data",
                                        microbatches=microbatches,
                                        policy=FP32_POLICY)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,B,microbatches", [
    (6, 4, 2),   # T=6 not divisible by S=4 (padded time)
    (8, 3, 2),   # B=3 not divisible by M=2 (padded batch)
    (5, 3, 2),   # both non-divisible
    (3, 2, 1),   # T < S: some devices hold only padding
])
def test_time_pipelined_handles_non_divisible_shapes(rng, T, B,
                                                     microbatches):
    """Round 1 hard-required T % S == 0 and B % M == 0; padding + carry
    masking lift both restrictions with exact numerics (VERDICT #9)."""
    mesh = make_mesh(data=4, model=1)
    params = convlstm_cell_init(jax.random.PRNGKey(0), 3, 4)
    x = jnp.asarray(rng.standard_normal((T, B, 4, 4, 3), dtype=np.float32))

    ref_out, ref_states = convlstm({"layer0": params}, x,
                                   policy=FP32_POLICY)
    h_ref, c_ref = ref_states[0]
    y, (h, c) = convlstm_time_pipelined(params, x, mesh, axis="data",
                                        microbatches=microbatches,
                                        policy=FP32_POLICY)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)


def test_time_pipelined_rejects_bad_microbatches():
    mesh = make_mesh(data=4, model=1)
    params = convlstm_cell_init(jax.random.PRNGKey(0), 2, 4)
    with pytest.raises(ValueError, match="microbatches"):
        convlstm_time_pipelined(params, jnp.zeros((8, 4, 8, 8, 2)), mesh,
                                microbatches=0)
