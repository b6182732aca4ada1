"""Moving-MNIST generator spec tests.

The oracle below is an independent, deliberately-naive transcription of the
documented behavior (digits placed/overwritten per frame, vx accumulated on
digit pixels, bounce = reflect+clamp, legacy np.random call order — see
SURVEY.md #22 / reference digits/build_moving_mnist.py). Our production
generator must match it byte-for-byte given the same seed + digit bank.
"""

import numpy as np

from unet_convlstm_tpu.data.moving_mnist import (
    generate_moving_mnist, moving_mnist_to_xy, synthetic_digit_bank,
)


def _oracle(seq_len, num_samples, image_size, num_digits, digits):
    data = np.zeros((num_samples, seq_len, 2, image_size, image_size),
                    np.float32)
    for i in range(num_samples):
        seq = np.zeros((seq_len, image_size, image_size), np.float32)
        vel = np.zeros((seq_len, image_size, image_size), np.float32)
        for _ in range(num_digits):
            digit = digits[np.random.randint(0, len(digits))]
            x, y = np.random.randint(0, image_size - 28 + 1, size=2)
            vx, vy = np.random.randint(-5, 6, size=2)
            for t in range(seq_len):
                dn = digit / 255.0
                m = dn > 0
                seq[t, y:y + 28, x:x + 28][m] = dn[m]
                vel[t, y:y + 28, x:x + 28][m] += vx
                x += vx
                y += vy
                if x < 0 or x > image_size - 28:
                    vx = -vx
                    x = max(0, min(x, image_size - 28))
                if y < 0 or y > image_size - 28:
                    vy = -vy
                    y = max(0, min(y, image_size - 28))
        data[i, :, 0] = seq
        data[i, :, 1] = vel
    return data


def test_generator_matches_oracle_byte_identical():
    bank = synthetic_digit_bank()
    np.random.seed(7)
    expected = _oracle(seq_len=12, num_samples=5, image_size=64,
                       num_digits=2, digits=bank)
    got = generate_moving_mnist(seq_len=12, num_samples=5, image_size=64,
                                num_digits=2, digits=bank, seed=7)
    assert got.dtype == expected.dtype
    np.testing.assert_array_equal(got, expected)


def test_generator_channel_semantics():
    bank = synthetic_digit_bank()
    data = generate_moving_mnist(seq_len=8, num_samples=3, image_size=64,
                                 num_digits=2, digits=bank, seed=0)
    frames, vel = data[:, :, 0], data[:, :, 1]
    assert frames.min() >= 0.0 and frames.max() <= 1.0
    # velocity lives only where digits are (vel!=0 implies digit>0); digits
    # can carry vx=0 so the converse need not hold
    assert np.all(frames[vel != 0] > 0)
    # integer velocities in [-5,5], two digits can stack to [-10,10]
    assert np.all(np.abs(vel) <= 10.0)
    assert np.all(vel == np.round(vel))


def test_to_xy_layout():
    bank = synthetic_digit_bank()
    data = generate_moving_mnist(4, 2, 64, 2, digits=bank, seed=1)
    X, Y = moving_mnist_to_xy(data)
    assert X.shape == (2, 4, 2, 64, 64)
    assert Y.shape == (2, 4, 1, 64, 64)
    np.testing.assert_array_equal(X[:, :, 0], X[:, :, 1])  # dual-view duplicate
    np.testing.assert_array_equal(Y[:, :, 0], data[:, :, 1])


def test_bounce_keeps_digits_in_frame():
    bank = synthetic_digit_bank()
    data = generate_moving_mnist(40, 4, 64, 2, digits=bank, seed=3)
    # occupancy never writes out of bounds (would raise), and every frame
    # retains digit mass (digits never vanish off-screen)
    per_frame_mass = data[:, :, 0].sum(axis=(2, 3))
    assert np.all(per_frame_mass > 0)
