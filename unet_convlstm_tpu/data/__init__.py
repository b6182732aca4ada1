"""Data subsystem: synthetic Moving-MNIST generation, NPZ sequence datasets,
and a device-feeding input pipeline.

Components (capability parity with the reference, re-designed for TPU):

* ``moving_mnist``   — Moving-MNIST-with-velocity generator, call-order
                       compatible with reference digits/build_moving_mnist.py.
* ``npz_dataset``    — NPZ sequence dataset with the reference's X/Y
                       normalization contract (train/unet.py:210-327), stats
                       precomputed once into a manifest.
* ``pipeline``       — host-side batcher with shuffling, NHWC layout
                       conversion and double-buffered device prefetch.
"""

from .moving_mnist import (  # noqa: F401
    generate_moving_mnist, synthetic_digit_bank, load_mnist_digits,
    moving_mnist_to_xy, save_moving_mnist_npz,
)
from .npz_dataset import NPZSequenceDataset  # noqa: F401
from .pipeline import SequenceLoader, prefetch_to_device  # noqa: F401
