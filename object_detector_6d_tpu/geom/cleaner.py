"""Depth cleaning (reference N4: DepthCleaner, depth.hpp:184-264).

The NIL method (Nguyen, Izadi, Lovell: "Modeling Kinect Sensor Noise for
Improved 3D Reconstruction and Tracking") smooths depth with a window
whose weights follow the sensor's depth-dependent axial noise model

    sigma_z(z) = 0.0012 + 0.0019 (z - 0.4)^2     [meters]

i.e. a bilateral filter in depth only: neighbors contribute with
Gaussian weight on their depth difference scaled by sigma_z of the
center pixel; invalid (0/NaN) depths are excluded and preserved.

Matches the oracle's DepthCleaner(NIL) to ~1 mm on noisy Kinect-like
input (tests/test_cleaner.py); exact arithmetic parity is not claimed —
the reference implementation's integer rounding differs at the +-1 mm
level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from object_detector_6d_tpu.geom.depth import rescale_depth


@functools.partial(jax.jit, static_argnames=("window_size",))
def clean_depth(depth: jnp.ndarray, window_size: int = 7) -> jnp.ndarray:
    """Noise-model-weighted depth smoothing.

    Integer input (mm) returns u16 mm; float input (m) returns f32 m —
    mirroring DepthCleaner::apply's dtype behavior. Invalid pixels
    (0/NaN) stay invalid and do not contribute to neighbors.
    """
    is_int = jnp.issubdtype(depth.dtype, jnp.integer)
    z = rescale_depth(depth)  # f32 meters, invalid -> NaN
    H, W = z.shape
    valid = jnp.isfinite(z)
    zf = jnp.where(valid, z, 0.0)

    sigma = 0.0012 + 0.0019 * jnp.square(zf - 0.4)
    r = window_size // 2
    num = jnp.zeros_like(zf)
    den = jnp.zeros_like(zf)
    zp = jnp.pad(zf, r)
    vp = jnp.pad(valid, r)
    for dy in range(window_size):
        for dx in range(window_size):
            zn = zp[dy : dy + H, dx : dx + W]
            vn = vp[dy : dy + H, dx : dx + W]
            w = jnp.exp(-0.5 * jnp.square((zn - zf) / sigma)) * vn
            num = num + w * zn
            den = den + w
    out = jnp.where(valid & (den > 0), num / den, jnp.nan)
    if is_int:
        return jnp.where(
            jnp.isfinite(out), jnp.round(out * 1000.0), 0.0
        ).astype(depth.dtype)
    return out.astype(jnp.float32)
