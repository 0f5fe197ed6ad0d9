"""Pallas kernel: sparse local-refinement sweep (the match hot spot).

The 16x16 local similarity sweep sums, per candidate, one 16x16 tile of
the decimated response grid per template feature:

    score16[k] = sum_f D[plane_kf, r0_kf : r0_kf+16, c0_kf : c0_kf+16]

A dense formulation (grouped conv against one-hot kernels) wastes 2000x
the FLOPs (templates have ~126 features of a 200x38x38 one-hot volume)
and XLA's gather lowering is worse still. This kernel keeps the whole
decimated grid D resident in VMEM (int8: responses are 0..4; ~4 MB for
a 640x480 frame at T0=5 with both modalities stacked) and runs one grid
step per candidate, accumulating F dynamic 16x16 tile reads — pure VPU
adds with scalar-prefetched tile offsets.

Feature padding: invalid feature slots point at a zeroed pad region of D
(no masking needed in the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("interpret",))
def refine_sweep(
    d_planes: jnp.ndarray,  # [P, Hp, Wp] int8 decimated responses (padded)
    plane_idx: jnp.ndarray,  # [K, F] int32 plane per (candidate, feature)
    r0: jnp.ndarray,  # [K, F] int32 tile row starts (>=0, +16 in bounds)
    c0: jnp.ndarray,  # [K, F] int32 tile col starts
    nfeat: jnp.ndarray | None = None,  # [K] int32 features per candidate
    interpret: bool = False,
) -> jnp.ndarray:
    """[K, 16, 16] int32 local similarity sums (single frame).

    Constraints (enforced in the batched impl): plane dims must be powers
    of two with Wp a lane multiple (>=128) and Hp >= 32 — Mosaic's dynamic
    leading index lowers to a shift of the plane stride and silently
    corrupts reads for non-power-of-two strides (observed on v5e, jax 0.9).
    """
    if nfeat is None:
        nfeat = jnp.full((plane_idx.shape[0],), plane_idx.shape[1], jnp.int32)
    return refine_sweep_batched(
        d_planes[None], plane_idx[None], r0[None], c0[None], nfeat[None],
        interpret=interpret,
    )[0]


def _refine_kernel_batched(nfeat_ref, plane_ref, r0_ref, c0_ref, d_ref, out_ref):
    """One grid step per frame: the candidate loop lives inside the kernel
    (256 single-candidate grid steps cost ~0.15 ms/frame in per-step
    overhead alone; 8 frame-steps make that negligible). The feature
    tables arrive as per-frame SMEM blocks — scalar-prefetching the
    whole [B, K, F] tables put 3 x 512 KB in SMEM at B=64 and OOM'd the
    1 MB space (v5e); a block holds one frame's ~4 KB."""
    Hp = d_ref.shape[2]
    K = plane_ref.shape[1]

    def cand(k, _):
        def body(f, acc):
            p = plane_ref[0, k, f]
            r0 = r0_ref[0, k, f]
            c0 = c0_ref[0, k, f]
            r8 = pl.multiple_of(jnp.minimum((r0 // 8) * 8, Hp - 32), 8)
            win = d_ref[0, p, pl.ds(r8, 32), :].astype(jnp.int32)
            rolled = pltpu.roll(pltpu.roll(win, -(r0 - r8), 0), -c0, 1)
            return acc + rolled[0:16, 0:16]

        n = nfeat_ref[0, 0, k]
        acc = jax.lax.fori_loop(0, n, body, jnp.zeros((16, 16), jnp.int32))
        out_ref[0, k] = acc
        return 0

    jax.lax.fori_loop(0, K, cand, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def refine_sweep_batched(
    d_planes: jnp.ndarray,  # [B, P, Hp, Wp] int8
    plane_idx: jnp.ndarray,  # [B, K, F] int32
    r0: jnp.ndarray,  # [B, K, F] int32
    c0: jnp.ndarray,  # [B, K, F] int32
    nfeat: jnp.ndarray | None = None,  # [B, K] int32
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched refine_sweep: grid (B,) — one step per frame with the
    frame's planes DMA'd to VMEM once and all K candidates swept inside
    the kernel. Candidates with ``nfeat == 0`` cost nothing (callers
    zero the count for invalid top-K slots)."""
    B, K = plane_idx.shape[0], plane_idx.shape[1]
    P, Hp, Wp = d_planes.shape[1:]
    if Hp & (Hp - 1) or Wp & (Wp - 1) or Wp % 128 or Hp < 32:
        raise ValueError(
            f"d_planes spatial dims must be powers of two (Hp>=32, Wp>=128 "
            f"lane-aligned); got {d_planes.shape}"
        )
    if nfeat is None:
        nfeat = jnp.full((B, K), plane_idx.shape[2], jnp.int32)
    F = plane_idx.shape[2]
    # Mosaic's block check exempts SMEM only for trivial windows; a (1, K)
    # block over [B, K] trips the (8, 128) rule for B > 1. Rank-3 (1, 1, K)
    # blocks make the last two dims (1, K) == the per-frame array dims.
    nfeat3 = nfeat.reshape(B, 1, K)
    return pl.pallas_call(
        _refine_kernel_batched,
        out_shape=jax.ShapeDtypeStruct((B, K, 16, 16), jnp.int32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, F), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, F), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, F), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, Hp, Wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, K, 16, 16), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(nfeat3, plane_idx, r0, c0, d_planes)


def _coarse_kernel(nfeat_ref, plane_ref, dr_ref, dc_ref, d_ref, out_ref):
    """Full-grid coarse sweep: out[b, t] = sum_f roll(plane_f, -dr_f, -dc_f).

    Same roll trick as the refinement kernel, but the anchor grid origin
    is fixed at (0, 0) so the whole (padded) output window accumulates at
    once; the caller slices the real [gh, gw] grid out of the padded
    block and applies span masks/thresholds in XLA.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    Hp = d_ref.shape[2]
    OH = out_ref.shape[2]

    def body(f, acc):
        p = plane_ref[t, f]
        dr = dr_ref[t, f]
        dc = dc_ref[t, f]
        r8 = pl.multiple_of(jnp.minimum((dr // 8) * 8, Hp - OH - 8), 8)
        win = d_ref[0, p, pl.ds(r8, OH + 8), :].astype(jnp.int32)
        rolled = pltpu.roll(pltpu.roll(win, -(dr - r8), 0), -dc, 1)
        return acc + rolled[0:OH, :]

    n = nfeat_ref[t]
    acc = jax.lax.fori_loop(
        0, n, body, jnp.zeros((out_ref.shape[2], out_ref.shape[3]), jnp.int32)
    )
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("out_h", "interpret"))
def coarse_sweep(
    d_planes: jnp.ndarray,  # [B, P, Hp, Wp] int8 decimated level-1 responses
    plane_idx: jnp.ndarray,  # [nT, F] int32
    dr: jnp.ndarray,  # [nT, F] int32 (cell row offsets, < Hp - out_h - 8)
    dc: jnp.ndarray,  # [nT, F] int32 (cell col offsets)
    nfeat: jnp.ndarray,  # [nT] int32
    out_h: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, nT, out_h, Wp] int32 raw similarity grid (valid for anchors
    where r + dr stays within the zero-padded planes).

    STATUS: experimental and currently ~25x slower than the XLA strided
    conv the fused program uses — the per-feature roll/accumulate body
    runs ~7 us/feature on v5e (vs ~0.2 us in the 16x16 refine kernel; the
    wide accumulate + rotate lowering needs investigation). Kept as the
    starting point for the large-bank (1000+ template) sweep kernel; do
    not wire into the hot path yet. Scalar-prefetch feature tables also
    exceed SMEM beyond ~600 templates (chunk them when revisiting).
    """
    B, P, Hp, Wp = d_planes.shape
    nT = plane_idx.shape[0]
    if Hp & (Hp - 1) or Wp & (Wp - 1) or Wp % 128 or Hp < out_h + 8:
        raise ValueError(f"bad plane dims {d_planes.shape} (pow2, Wp>=128, Hp>=out_h+8)")
    if out_h % 8:
        raise ValueError("out_h must be a sublane multiple")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, P, Hp, Wp), lambda b, t, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, out_h, Wp), lambda b, t, *_: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _coarse_kernel,
        out_shape=jax.ShapeDtypeStruct((B, nT, out_h, Wp), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(nfeat, plane_idx, dr, dc, d_planes)
