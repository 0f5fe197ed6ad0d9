"""Frame ingest: depth rescaling (reference L0, depth.hpp:314-325).

``rescale_depth`` mirrors the oracle's rescaleDepth semantics (measured):
u16/int input is interpreted as millimeters and converted to float32
meters with invalid (0) mapped to NaN; float input passes through
unchanged (already metric).
"""

from __future__ import annotations

import jax.numpy as jnp


def rescale_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Depth image -> float32 meters with 0 -> NaN (for integer input)."""
    depth = jnp.asarray(depth)
    if jnp.issubdtype(depth.dtype, jnp.floating):
        return depth.astype(jnp.float32)
    d = depth.astype(jnp.float32)
    return jnp.where(d == 0, jnp.nan, d * jnp.float32(0.001))
