"""Orientation spreading + response maps (reference linemod.cpp hot path).

``spread``: OR of the quantized one-hot image over the forward TxT
neighborhood — dst(y, x) = OR_{0<=r,c<T} src(y+r, x+c) (the oracle's
orUnaligned8u loop). Pure bitwise VPU work on int32 lanes.

``response_maps``: for each of the 8 orientations i, the max cosine
score against any orientation present in the spread byte:
R[i](y,x) = max_{j in bits(s)} (4 - circ_dist(i, j)), 0 for empty s.
The oracle bakes this into a 256-byte SIMILARITY_LUT applied to the
lsb/msb nibbles; we compute it directly from the 8x8 score table with a
bit-decomposed max — arithmetic-identical (ops/lut.py), no gather.

Both fuse into one XLA program; output feeds the MXU template sweep
(match/sweep.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from object_detector_6d_tpu.ops.lut import similarity_table


@functools.partial(jax.jit, static_argnames=("t",))
def spread(quantized: jnp.ndarray, t: int) -> jnp.ndarray:
    """OR-spread over the forward t x t window. [H, W] u8 -> [H, W] u8."""
    q = quantized.astype(jnp.int32)
    H, W = q.shape
    acc = jnp.zeros_like(q)
    for r in range(t):
        for c in range(t):
            shifted = jnp.pad(q, ((0, r), (0, c)))[r:, c:]
            acc = acc | shifted
    return acc.astype(jnp.uint8)


@jax.jit
def response_maps(spread_img: jnp.ndarray) -> jnp.ndarray:
    """Spread image [H, W] u8 -> response maps [8, H, W] u8 (values 0..4)."""
    s = spread_img.astype(jnp.int32)[None, :, :]
    table = jnp.asarray(similarity_table().astype(jnp.int32))  # [8 ori, 8 bit]
    acc = jnp.zeros((8,) + spread_img.shape, jnp.int32)
    for j in range(8):
        present = (s >> j) & 1  # [1, H, W]
        acc = jnp.maximum(acc, present * table[:, j][:, None, None])
    return acc.astype(jnp.uint8)
