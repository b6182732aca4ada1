"""Area (box-filter) resize — the TPU replacement for cv2.INTER_AREA.

The reference shrinks 256x256 renders/velocity-maps to 128x128 with
``cv2.resize(..., interpolation=cv2.INTER_AREA)`` on host
(preprocessing/build_sequences.py:108-110,131).  For integer downscale
factors INTER_AREA is exactly the mean over non-overlapping boxes, which we
compute on device with a reshape+mean (fuses into the input pipeline, no
host round-trip).  ``tests/test_resize.py`` verifies bit-level agreement with
cv2 for the 256→128 case.

Non-integer ratios fall back to jax.image.resize(method='linear') with
antialiasing — adequate for visualization paths; the dataset contract only
uses the integer case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def area_resize(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """img: [..., H, W]. Exact box-mean for integer factors."""
    h, w = img.shape[-2], img.shape[-1]
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        new_shape = img.shape[:-2] + (out_h, fh, out_w, fw)
        return jnp.mean(img.reshape(new_shape), axis=(-3, -1))
    return jax.image.resize(img, img.shape[:-2] + (out_h, out_w),
                            method="linear", antialias=True)
