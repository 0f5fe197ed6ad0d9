"""Fused quantize Pallas kernels: ColorGradient + DepthNormal, VMEM-resident.

STATUS: WIRED (round 4) into the production Pallas match path
(match/program.py quantize_pyramids_batched, gated on H % 16 == 0).
History: written when quantize was 12.6 ms of the 19.6 ms batch-16
match (2026-08-18 profile), then PARKED when a round-3 A/B measured
them slower than the re-optimized XLA formulations (8.4 vs 2.7 ms CG).
The round-4 re-A/B on a quiet chip went the other way — CG level-0
0.88 ms (Pallas) vs 2.73 ms (XLA) per batch-16, DN 0.37 vs 0.33
(tools/prof_quant.py, 2026-08-19) — and the fused match program
dropped accordingly, so they ship. The XLA formulations remain the
fallback for unaligned frame heights and the mesh/conv paths. Each
kernel runs the whole per-modality chain on one VMEM-resident row
block:

  cg_quantize_batched   int 7x7 Gaussian -> 3x3 Sobel -> channel select
                        -> fastAtan2 -> 16->8 bin fold -> packed 3x3
                        vote -> one-hot u8   (quant/color_gradient.py,
                        bit-identical — tests/test_quantize_pallas.py)
  dn_quantize_batched   ring LS gradient -> octant rule -> validity ->
                        packed 5x5 numeric median -> one-hot u8
                        (quant/depth_normal.py + ops/median.py,
                        bit-identical)

Layout and v5e notes (CLAUDE.md): inputs are edge/zero-padded by 8 on
every image side in XLA so (a) every stencil tap inside the kernel is a
static value slice or a masked ``pltpu.roll`` whose zero-fill garbage
stays >= 3 columns outside the frame, and (b) the per-block dynamic
sublane read offset r*RB is 8-aligned (RB a multiple of 8). The batch
is a grid axis — a vmapped pallas_call is unsupported on TPU (see
ops/response_pallas.py). Row blocks keep the per-channel int32
temporaries (~[RB+16, W+16]) far under VMEM.

Reference semantics: linemod.hpp:163-240 (hysteresisGradient /
quantizedNormals); the canonical CPU implementation is the oracle the
XLA versions were verified bit-exact against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GAUSS7 = (8, 28, 56, 72, 56, 28, 8)
_PAD = 8  # image-side padding; >= every fused stencil halo (CG 5, DN 7)


def _pick_rb(H: int) -> int:
    for rb in (64, 56, 48, 40, 32, 24, 16, 8):
        if H % rb == 0:
            return rb
    raise ValueError(f"H={H} must be a multiple of 8 for the fused "
                     "quantize kernels (pad the frame or use the XLA path)")


def _shift_cols(x, k: int):
    """x[r, c] -> x[r, c+k] (k may be negative), zero-filled wrap lanes."""
    if k == 0:
        return x
    W = x.shape[-1]
    rolled = pltpu.roll(x, (W - k) % W, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if k > 0:
        return jnp.where(idx < W - k, rolled, 0)
    return jnp.where(idx >= -k, rolled, 0)


def _fast_atan2_deg(y, x):
    """cv::fastAtan2 — same f32 polynomial as quant/color_gradient.py."""
    P1 = jnp.float32(0.9997878412794807 * (180 / 3.141592653589793))
    P3 = jnp.float32(-0.3258083974640975 * (180 / 3.141592653589793))
    P5 = jnp.float32(0.1555786518463281 * (180 / 3.141592653589793))
    P7 = jnp.float32(-0.04432655554792128 * (180 / 3.141592653589793))
    eps = jnp.float32(1.1920929e-07)
    ax, ay = jnp.abs(x), jnp.abs(y)
    swap = ax < ay
    c = jnp.where(swap, ax / (ay + eps), ay / (ax + eps)).astype(jnp.float32)
    c2 = c * c
    a = (((P7 * c2 + P5) * c2 + P3) * c2 + P1) * c
    a = jnp.where(swap, jnp.float32(90.0) - a, a)
    a = jnp.where(x < 0, jnp.float32(180.0) - a, a)
    a = jnp.where(y < 0, jnp.float32(360.0) - a, a)
    return a


def _make_cg_kernel(H: int, W: int, RB: int, weak_threshold: float):
    PW = W + 2 * _PAD
    WIN = RB + 2 * _PAD
    weak2 = float(weak_threshold) ** 2

    def kernel(in_ref, out_ref):
        # in_ref [1, 3, H+16, PW] u8 edge-padded; out_ref [1, RB, W] u8
        r = pl.program_id(1)
        r0 = pl.multiple_of(r * RB, 8)

        smag = sdx = sdy = None
        for c in range(3):
            w = in_ref[0, c, pl.ds(r0, WIN), :].astype(jnp.int32)
            # horizontal 7-tap: th[., c] = sum_i k_i * w[., c+i-3].
            # Zero-fill roll garbage sits >= 5 cols outside the frame
            # (pad 8, total fused halo 5) — never reaches real pixels.
            th = _GAUSS7[3] * w
            for i, k in enumerate(_GAUSS7):
                if i != 3:
                    th = th + k * _shift_cols(w, i - 3, )
            # vertical 7-tap onto RB+4 rows; row j = frame row r*RB+j-2
            # = window row j+6, taps at window rows j+3..j+9
            o = _GAUSS7[0] * th[3:3 + RB + 4]
            for m, k in enumerate(_GAUSS7):
                if m != 0:
                    o = o + k * th[3 + m:3 + m + RB + 4]
            s = jnp.clip((o + (1 << 15)) >> 16, 0, 255)  # [RB+4, PW]

            # 3x3 Sobel onto RB+2 rows (row j = frame row r*RB+j-1)
            gx = _shift_cols(s, 1) - _shift_cols(s, -1)
            dx = gx[0:RB + 2] + 2 * gx[1:RB + 3] + gx[2:RB + 4]
            gy = s[2:RB + 4] - s[0:RB + 2]
            dy = (_shift_cols(gy, -1) + 2 * gy + _shift_cols(gy, 1))
            dxf = dx.astype(jnp.float32)
            dyf = dy.astype(jnp.float32)
            mag = dxf * dxf + dyf * dyf
            if c == 0:
                smag, sdx, sdy = mag, dxf, dyf
            else:
                # sequential strict-> equals the first-max-wins select
                # of quant/color_gradient.py (smag is the running max)
                win = mag > smag
                smag = jnp.where(win, mag, smag)
                sdx = jnp.where(win, dxf, sdx)
                sdy = jnp.where(win, dyf, sdy)

        ang = _fast_atan2_deg(sdy, sdx)
        q16 = jnp.clip(jnp.rint(ang * jnp.float32(16.0 / 360.0)),
                       0, 255).astype(jnp.int32)
        q8 = q16 & 7  # [RB+2, PW]

        # frame coordinates of this block's rows/cols
        jrow = jax.lax.broadcasted_iota(jnp.int32, (RB + 2, PW), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RB + 2, PW), 1)
        frow = r * RB + jrow - 1
        fcol = lane - _PAD
        inside = (frow >= 0) & (frow < H) & (fcol >= 0) & (fcol < W)
        border = (frow == 0) | (frow == H - 1) | (fcol == 0) | (fcol == W - 1)
        q8 = jnp.where(border, 0, q8)

        # packed 3x3 vote: all 8 bins as 4-bit fields of one uint32
        # (quant/color_gradient.py); zero outside the frame == the XLA
        # box sum's zero padding
        packed = jnp.where(
            inside, (jnp.uint32(1) << (4 * q8).astype(jnp.uint32)),
            jnp.uint32(0))
        vrow = packed[0:RB] + packed[1:RB + 1] + packed[2:RB + 2]
        votes = (vrow + _shift_cols(vrow, -1) + _shift_cols(vrow, 1))

        best = jnp.zeros((RB, PW), jnp.int32)
        best_votes = (votes & 15).astype(jnp.int32)
        for k in range(1, 8):
            vk = ((votes >> jnp.uint32(4 * k)) & 15).astype(jnp.int32)
            winb = vk > best_votes
            best = jnp.where(winb, k, best)
            best_votes = jnp.maximum(best_votes, vk)

        smag_c = smag[1:RB + 1]
        border_c = border[1:RB + 1]
        strong = (smag_c > jnp.float32(weak2)) & (best_votes >= 5) & ~border_c
        q = jnp.where(strong, (jnp.int32(1) << best), 0).astype(jnp.uint8)
        out_ref[0] = q[:, _PAD:_PAD + W]

    return kernel


@functools.partial(jax.jit, static_argnames=("weak_threshold", "interpret"))
def cg_quantize_batched(
    bgr: jnp.ndarray,  # [B, H, W, 3] u8
    weak_threshold: float = 10.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched ColorGradient quantize: [B, H, W, 3] u8 -> [B, H, W] u8.

    Bit-identical to quant/color_gradient.quantized_orientations
    (tests/test_quantize_pallas.py asserts equality, interpret mode).
    """
    B, H, W, _ = bgr.shape
    RB = _pick_rb(H)
    x = jnp.moveaxis(bgr, -1, 1)  # [B, 3, H, W] u8
    xp = jnp.pad(x, ((0, 0), (0, 0), (_PAD, _PAD), (_PAD, _PAD)),
                 mode="edge")
    return pl.pallas_call(
        _make_cg_kernel(H, W, RB, weak_threshold),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
        grid=(B, H // RB),
        in_specs=[pl.BlockSpec((1, 3, H + 2 * _PAD, W + 2 * _PAD),
                               lambda b, r: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, RB, W), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp)


_RING = tuple(
    (dx, dy)
    for dy in (-5, 0, 5)
    for dx in (-5, 0, 5)
    if not (dx == 0 and dy == 0)
)


def _make_dn_kernel(H: int, W: int, RB: int, distance_threshold: int,
                    difference_threshold: int):
    PW = W + 2 * _PAD
    WIN = RB + 2 * _PAD

    def kernel(in_ref, out_ref):
        # in_ref [1, H+16, PW] i32 zero-padded depth; out_ref [1, RB, W] u8
        r = pl.program_id(1)
        r0 = pl.multiple_of(r * RB, 8)
        d = in_ref[0, pl.ds(r0, WIN), :]  # [WIN, PW] i32

        # ring LS gradient onto RB+4 rows (median halo 2):
        # row j = frame row r*RB+j-2 = window row j+6
        NR = RB + 4
        dc = d[6:6 + NR]
        A0 = jnp.zeros((NR, PW), jnp.int32)
        A1 = jnp.zeros((NR, PW), jnp.int32)
        A3 = jnp.zeros((NR, PW), jnp.int32)
        b0 = jnp.zeros((NR, PW), jnp.int32)
        b1 = jnp.zeros((NR, PW), jnp.int32)
        for sdx, sdy in _RING:
            samp = _shift_cols(d[6 + sdy:6 + sdy + NR], sdx)
            delta = samp - dc
            f = (jnp.abs(delta) < difference_threshold).astype(jnp.int32)
            A0 = A0 + f * (sdx * sdx)
            A1 = A1 + f * (sdx * sdy)
            A3 = A3 + f * (sdy * sdy)
            b0 = b0 + f * sdx * delta
            b1 = b1 + f * sdy * delta
        det = A0 * A3 - A1 * A1
        ddx = A3 * b0 - A1 * b1
        ddy = -A1 * b0 + A0 * b1

        nx = (1150 * ddx).astype(jnp.float32)
        ny = (1150 * ddy).astype(jnp.float32)
        nz = (-det * dc).astype(jnp.float32)
        norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        inv = jnp.float32(1.0) / norm
        vx = (nx * inv * jnp.float32(10.0) + jnp.float32(10.0)).astype(jnp.int32)
        vy = (ny * inv * jnp.float32(10.0) + jnp.float32(10.0)).astype(jnp.int32)

        # arithmetic octant rule == the oracle's NORMAL_LUT (ops/lut.py)
        cx = (vx - 10).astype(jnp.float32)
        cy = (vy - 10).astype(jnp.float32)
        t = jnp.float32(0.41421356)
        acx = jnp.abs(cx)
        acy = jnp.abs(cy)
        horiz = acy <= t * acx
        vert = acx <= t * acy
        bin_h = jnp.where(cx >= 0, 0, 4)
        bin_v = jnp.where(cy >= 0, 2, 6)
        bin_d = jnp.where(cy >= 0, jnp.where(cx >= 0, 1, 3),
                          jnp.where(cx >= 0, 7, 5))
        bins = jnp.where(horiz, bin_h, jnp.where(vert, bin_v, bin_d))

        jrow = jax.lax.broadcasted_iota(jnp.int32, (NR, PW), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (NR, PW), 1)
        frow = r * RB + jrow - 2
        fcol = lane - _PAD
        # oracle interior: ring radius in from every border with the
        # asymmetric -1 on the far edges (quant/depth_normal.py)
        interior = ((frow >= 5) & (frow < H - 6) & (fcol >= 5)
                    & (fcol < W - 6))
        valid = interior & (dc < distance_threshold) & (norm > 0)
        q = jnp.where(valid, jnp.int32(1) << bins, 0)  # [NR, PW] i32

        # packed 5x5 numeric median (ops/median.py): 8 one-hot planes as
        # two int32 images of four 8-bit count fields. q is zero within
        # 5 px of every frame border, so zero-fill col rolls equal the
        # XLA path's edge-replicate padding here.
        lo = jnp.zeros((NR, PW), jnp.int32)
        hi = jnp.zeros((NR, PW), jnp.int32)
        for k in range(4):
            lo = lo + (((q >> k) & 1) << (8 * k))
            hi = hi + (((q >> (k + 4)) & 1) << (8 * k))

        def box5(x):
            rows = x[0:RB]
            for i in range(1, 5):
                rows = rows + x[i:RB + i]
            acc = rows
            for kk in (-2, -1, 1, 2):
                acc = acc + _shift_cols(rows, kk)
            return acc

        lo = box5(lo)
        hi = box5(hi)
        counts = [(lo >> (8 * k)) & 255 for k in range(4)] + [
            (hi >> (8 * k)) & 255 for k in range(4)
        ]
        cum = 25
        for c in counts:
            cum = cum - c
        val = jnp.zeros((RB, PW), jnp.int32)
        done = cum >= 13
        for k, c in enumerate(counts):
            cum = cum + c
            hit = ~done & (cum >= 13)
            val = jnp.where(hit, jnp.int32(1) << k, val)
            done = done | hit
        out_ref[0] = val.astype(jnp.uint8)[:, _PAD:_PAD + W]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "distance_threshold", "difference_threshold", "interpret"))
def dn_quantize_batched(
    depth: jnp.ndarray,  # [B, H, W] u16/int
    distance_threshold: int = 2000,
    difference_threshold: int = 50,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched DepthNormal quantize: [B, H, W] depth -> [B, H, W] u8.

    Bit-identical to quant/depth_normal.quantized_normals (median
    included; tests/test_quantize_pallas.py).
    """
    B, H, W = depth.shape
    RB = _pick_rb(H)
    dp = jnp.pad(depth.astype(jnp.int32),
                 ((0, 0), (_PAD, _PAD), (_PAD, _PAD)))
    return pl.pallas_call(
        _make_dn_kernel(H, W, RB, distance_threshold, difference_threshold),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
        grid=(B, H // RB),
        in_specs=[pl.BlockSpec((1, H + 2 * _PAD, W + 2 * _PAD),
                               lambda b, r: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, RB, W), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dp)
