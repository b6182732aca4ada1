"""Native hostio extension: build, correctness vs numpy, fallback path."""

import numpy as np
import pytest

from unet_convlstm_tpu.native.build import load_hostio
from unet_convlstm_tpu.data.fast_gather import gather_transpose


@pytest.fixture(scope="module")
def lib():
    lib = load_hostio()
    if lib is None:
        pytest.skip("g++ unavailable — numpy fallback covers behavior")
    return lib


def test_gather_transpose_matches_numpy(lib, rng):
    src = rng.standard_normal((6, 3, 2, 5, 7)).astype(np.float32)
    idx = np.array([4, 0, 5], np.int64)
    out = gather_transpose(src, idx)
    expected = np.moveaxis(src[idx], 2, -1)
    assert out.shape == (3, 3, 5, 7, 2)
    np.testing.assert_array_equal(out, expected)


def test_gather_transpose_single_channel(lib, rng):
    src = rng.standard_normal((4, 2, 1, 8, 8)).astype(np.float32)
    idx = np.array([3, 1], np.int64)
    np.testing.assert_array_equal(gather_transpose(src, idx),
                                  np.moveaxis(src[idx], 2, -1))


def test_gather_transpose_threads(lib, rng):
    src = rng.standard_normal((8, 4, 3, 16, 16)).astype(np.float32)
    idx = np.arange(8, dtype=np.int64)
    a = gather_transpose(src, idx, nthreads=1)
    b = gather_transpose(src, idx, nthreads=4)
    np.testing.assert_array_equal(a, b)


def test_numpy_fallback_on_noncontiguous(rng):
    src = rng.standard_normal((4, 2, 2, 6, 6)).astype(np.float32)
    view = src[:, :, :, ::2, :]  # non-contiguous → numpy path
    idx = np.array([1, 2], np.int64)
    out = gather_transpose(view, idx)
    np.testing.assert_array_equal(out, np.moveaxis(view[idx], 2, -1))


def test_paste_digit_matches_python(lib, rng):
    """The native Moving-MNIST paste must be byte-identical to the
    documented overwrite/accumulate semantics."""
    from unet_convlstm_tpu.data.moving_mnist import (
        generate_moving_mnist, synthetic_digit_bank)
    import unet_convlstm_tpu.data.moving_mnist as mm
    import unet_convlstm_tpu.native.build as nb

    bank = synthetic_digit_bank()
    with_native = generate_moving_mnist(6, 3, 64, 2, digits=bank, seed=11)
    # force the python path
    orig = nb.load_hostio
    nb.load_hostio = lambda: None
    try:
        without = generate_moving_mnist(6, 3, 64, 2, digits=bank, seed=11)
    finally:
        nb.load_hostio = orig
    np.testing.assert_array_equal(with_native, without)
