"""Normalization pipeline + area-resize parity tests.

Golden behavior from the reference spec:
* NPZSequenceDataset normalize/denormalize round-trip (train/unet.py:210-327)
* mask = raw x[ch 0] > 1.1 computed pre-normalization (train/unet.py:277-279)
* cv2.INTER_AREA 256→128 downscale (preprocessing/build_sequences.py:108-110)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unet_convlstm_tpu.ops import (
    NormStats, compute_norm_stats, normalize_x, normalize_y, denormalize_y,
    compute_mask, area_resize,
)


def _fake_dataset(rng, n=4, t=3, h=16, w=16):
    X = (rng.random((n, t, h, w, 2)) * 40.0).astype(np.float32)
    Y = (rng.standard_normal((n, t, h, w, 1)) * 3.0).astype(np.float32)
    return X, Y


def _golden_normalize_y(Y, stats: NormStats):
    """Reference formula re-derived in numpy (unet.py:287-299)."""
    y = np.clip(Y, stats.min_vel, stats.max_vel) if stats.clip_outliers else Y
    if stats.y_transform == "asinh":
        y_t = np.arcsinh(y / stats.y_scale)
    elif stats.y_transform == "signed_log":
        y_t = np.sign(y) * np.log1p(np.abs(y) / stats.y_scale)
    else:
        y_t = y
    return (2 * (y_t - stats.trans_min) / (stats.trans_max - stats.trans_min)
            - 1.0).astype(np.float32)


@pytest.mark.parametrize("transform", ["asinh", "signed_log", "none"])
@pytest.mark.parametrize("explicit", [True, False])
def test_normalize_matches_reference_formula(rng, transform, explicit):
    X, Y = _fake_dataset(rng)
    kw = dict(min_y=-7.5987958908081055, max_y=8.784920692443848) if explicit \
        else dict(min_y=None, max_y=None)
    stats = compute_norm_stats(X, Y, y_transform=transform, **kw)
    got = np.asarray(normalize_y(jnp.asarray(Y), stats))
    # XLA's f32 asinh/log1p differ from numpy's at the ~1e-4 level
    np.testing.assert_allclose(got, _golden_normalize_y(Y, stats),
                               rtol=2e-3, atol=3e-4)
    # X normalization: divide by max(max(X), 1)
    np.testing.assert_allclose(np.asarray(normalize_x(jnp.asarray(X), stats)),
                               X / max(X.max(), 1.0), rtol=1e-6)


@pytest.mark.parametrize("transform", ["asinh", "signed_log", "none"])
def test_denormalize_roundtrip(rng, transform):
    X, Y = _fake_dataset(rng)
    stats = compute_norm_stats(X, Y, y_transform=transform)
    # clip Y into the stats range so the round trip is exact
    Yc = np.clip(Y, stats.min_vel, stats.max_vel)
    y_norm = normalize_y(jnp.asarray(Yc), stats)
    y_back = np.asarray(denormalize_y(y_norm, stats))
    # sinh amplifies f32 rounding of the forward asinh by cosh(y_t)
    np.testing.assert_allclose(y_back, Yc, rtol=1e-3, atol=2e-3)


def test_mask_raw_threshold(rng):
    X, Y = _fake_dataset(rng)
    stats = compute_norm_stats(X, Y)
    mask = np.asarray(compute_mask(jnp.asarray(X), stats))
    assert mask.shape == X.shape[:-1] + (1,)
    np.testing.assert_array_equal(mask[..., 0], (X[..., 0] > 1.1).astype(np.float32))


def test_norm_stats_serialization(rng):
    X, Y = _fake_dataset(rng)
    stats = compute_norm_stats(X, Y)
    assert NormStats.from_dict(stats.to_dict()) == stats


def test_area_resize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = rng.random((256, 256)).astype(np.float32) * 50.0
    ours = np.asarray(area_resize(jnp.asarray(img), 128, 128))
    golden = cv2.resize(img, (128, 128), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-5)


def test_area_resize_batched(rng):
    cv2 = pytest.importorskip("cv2")
    imgs = rng.random((3, 64, 64)).astype(np.float32)
    ours = np.asarray(area_resize(jnp.asarray(imgs), 32, 32))
    for i in range(3):
        golden = cv2.resize(imgs[i], (32, 32), interpolation=cv2.INTER_AREA)
        np.testing.assert_allclose(ours[i], golden, rtol=1e-6, atol=1e-5)
