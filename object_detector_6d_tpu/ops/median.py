"""5x5 median filter over small-alphabet u8 images, TPU-first.

The LINEMOD depth-normal quantizer post-filters its one-hot orientation
image with a numeric 5x5 median (the canonical implementation calls
cv::medianBlur(ksize=5) on the quantized bytes; border handling is
replicate). A generic per-pixel sort of 25 values is a poor fit for the
VPU, but the quantized image only ever holds the 9 byte values
{0, 1, 2, 4, ..., 128} — so the median is computed by *counting*: build a
cumulative histogram over the 9 values with two separable 5x5 box sums and
select the first value whose cumulative count reaches 13. Everything is
elementwise adds and compares — pure VPU work that XLA fuses.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_CODES = np.array([0, 1, 2, 4, 8, 16, 32, 64, 128], dtype=np.uint8)


def _box5_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 5x5 box sum with replicate padding. x: [..., H, W] int32."""
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(2, 2), (0, 0)], mode="edge")
    x = sum(p[..., i : i + x.shape[-2], :] for i in range(5))
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 0), (2, 2)], mode="edge")
    return sum(p[..., :, i : i + x.shape[-1]] for i in range(5))


def median5_onehot_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Numeric 5x5 median of an image over the alphabet {0,1,2,4,...,128}.

    Bit-exact with cv::medianBlur(CV_8U, ksize=5) for inputs restricted to
    that alphabet (verified in tests/test_depth_normal.py).
    """
    codes = jnp.asarray(_CODES)
    # counts[k] = number of window pixels == codes[k]
    eq = (img[None, :, :] == codes[:, None, None]).astype(jnp.int32)
    counts = _box5_sum(eq)
    cum = jnp.cumsum(counts, axis=0)
    # median = first code whose cumulative count reaches 13 (of 25);
    # codes are 0 then powers of two, so codes[idx] is arithmetic
    # (1 << (idx-1)) — no gather.
    reached = cum >= 13
    idx = jnp.argmax(reached, axis=0).astype(jnp.int32)
    val = jnp.where(idx == 0, 0, jnp.int32(1) << jnp.maximum(idx - 1, 0))
    return val.astype(jnp.uint8)
