"""Fused spread + response-map Pallas kernel (VPU, VMEM-resident).

Computes ``response_maps(spread(q, T))`` — the L3 hot path of
match/response.py — in ONE pass per frame: the XLA formulation, though
algebraically minimal (log-step separable OR + rotate-select), still
materializes ~15 int32 intermediates in HBM and measures ~0.21 ms per
640x480 image; the whole computation is elementwise over a 300 KB
input, so a single VMEM-resident kernel runs it at memory speed.

Layout: everything int32 vectors over [H, W] (u8 values 0..255);
shifts are ``pltpu.roll`` (static amounts lower to cheap lane/sublane
rotates) followed by an iota edge mask that zeroes the wrapped lanes —
equivalent to the zero-filled shift of match/response.py.

The batched entry (``response_spread_batched``) iterates frames on the
grid — a vmapped pallas_call is unsupported on TPU (see
ops/refine_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from object_detector_6d_tpu.ops.lut import similarity_table


def _shift_fwd_2d(x, k: int, axis: int, H: int, W: int):
    """x shifted k pixels toward the origin along axis, zero-filled."""
    # pltpu.roll wants a non-negative shift: rotating by size-k is the
    # same rotation as by -k
    rolled = pltpu.roll(x, (H if axis == 0 else W) - k, axis)
    if axis == 0:
        idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        return jnp.where(idx < H - k, rolled, 0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return jnp.where(idx < W - k, rolled, 0)


def _make_kernel(t: int, H: int, W: int, dist_vals):
    def kernel(q_ref, out_ref):
        # frame blocking via BlockSpec (NOT a dynamic leading index: a
        # [B, H, W] frame stride is not a power of two and Mosaic's
        # dynamic leading-index reads silently corrupt for such strides
        # on v5e — measured round 1)
        x = q_ref[0].astype(jnp.int32)
        # forward T-window OR, log-step doubling per axis
        for axis in (0, 1):
            acc = x
            done = 1
            while done * 2 <= t:
                acc = acc | _shift_fwd_2d(acc, done, axis, H, W)
                done *= 2
            if done < t:
                acc = acc | _shift_fwd_2d(acc, t - done, axis, H, W)
            x = acc
        # response maps: rotate the spread byte so orientation i sits at
        # bit 0, resolve circular distance with a priority select
        dist_masks = ((1 << 4), (1 << 3) | (1 << 5), (1 << 2) | (1 << 6),
                      (1 << 1) | (1 << 7), 1)
        for i in range(8):
            r = ((x >> i) | (x << (8 - i))) & 0xFF
            v = jnp.zeros((H, W), jnp.int32)
            for mask, val in zip(dist_masks, dist_vals):
                v = jnp.where((r & mask) != 0, jnp.int32(val), v)
            out_ref[0, i] = v.astype(jnp.uint8)

    return kernel


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def response_spread_batched(
    q: jnp.ndarray,  # [B, H, W] u8 quantized orientations
    t: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, H, W] u8 -> [B, 8, H, W] u8 response maps (values 0..4)."""
    B, H, W = q.shape
    table = similarity_table()
    dist_vals = tuple(int(table[0, d]) for d in (4, 3, 2, 1, 0))
    return pl.pallas_call(
        _make_kernel(t, H, W, dist_vals),
        out_shape=jax.ShapeDtypeStruct((B, 8, H, W), jnp.uint8),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, H, W), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q)


def response_spread(q: jnp.ndarray, t: int, interpret: bool = False):
    """Single frame: [H, W] u8 -> [8, H, W] u8."""
    return response_spread_batched(q[None], t, interpret=interpret)[0]
