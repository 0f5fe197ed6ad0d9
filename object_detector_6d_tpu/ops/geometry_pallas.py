"""Fused geometry Pallas kernel: depth -> cloud + FALS normals + pack.

The XLA composition (geom/backproject.depth_to_3d -> geom/normals
FalsNormals -> refine/projective.pack_scene7) measures ~0.58 ms/frame
on v5e — an order of magnitude above memory speed — because ~15
full-frame intermediates round-trip HBM (the box-sum pads, the [H,W,3]
ray products, the normalize/orient/mask chain, the final pack). This
kernel computes the whole chain VMEM-resident, one row block at a time:

    z      = depth / 1000 (0 -> invalid)
    cloud  = (z*(u-cx)/fx, z*(v-cy)/fy, z)
    inv_r  = 1 / |cloud|
    b      = boxsum_5x5(ray_unit * inv_r)
    n      = M^-1 b  (M^-1 the FALS per-pixel 3x3 inverse, precomputed
             in f64 on host exactly as geom/normals.FalsNormals)
    normalize, orient toward camera, mask invalid

Outputs one [8, H, W] plane stack per frame: cloud xyz (NaN-invalid),
normals xyz (NaN-invalid), validity, zero pad — everything the fused
detect program's lift/ICP stages need (z_img = plane 2; the packed
scene is a transpose of the stack).

NUMERICS: the FALS system is near-singular (M^-1 entries are huge — the
reason FalsNormals inverts in f64), so ``b`` must be produced by
bit-identical f32 operations or the solve amplifies round-off into
degree-level normal errors [measured: computing 1/r as 1/(z*|ray|)
instead of 1/|cloud| moved normals by up to 5 deg]. The kernel
therefore replicates the XLA path operation-for-operation: f32 cloud,
r = sqrt(x^2+y^2+z^2), f64-normalized-then-cast unit rays, the same
left-to-right box-sum accumulation order, and direct division by the
norm. test_geometry_pallas asserts equality in interpret mode; oracle
parity (<=1.1 deg 99p, test_geom) is inherited.

Layout notes (v5e, CLAUDE.md): the padded depth and ray planes stay
whole-frame in VMEM (constant index_map — fetched once per frame, not
per row block) and the kernel reads its 5-row halo window with a
dynamic, 8-aligned sublane offset (RB multiple of 8; in-block halo
alignment handled by slicing the loaded VALUE, which is static). Column
box sums use masked rolls (zero-fill edge semantics, exactly
geom/normals._box_sum). A vmapped pallas_call is unsupported on TPU, so
the batch is a grid axis (cf. ops/response_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 48  # rows per block (480 -> 10 blocks); multiple of 8
HALO = 2  # box-sum radius (window 5)


def _shift_cols(x, k: int, W: int):
    """x shifted k columns toward the origin (k may be negative),
    zero-filled — column counterpart of the row halo slices."""
    if k == 0:
        return x
    rolled = pltpu.roll(x, (W - k) % W, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if k > 0:
        return jnp.where(idx < W - k, rolled, 0.0)
    return jnp.where(idx >= -k, rolled, 0.0)


def _make_kernel(H: int, W: int, fx: float, fy: float):
    inv_fx = None  # divisions stay divisions (see NUMERICS note)

    def kernel(d_ref, ray_ref, minv_ref, out_ref):
        # d_ref   [1, H + 2*HALO + pad, W] i32 (whole padded frame)
        # ray_ref [5, H + 2*HALO + pad, W] f32 planes:
        #         0 (u-cx), 1 (v-cy), 2-4 unit ray xyz (f64-normalized)
        # minv_ref [9, RB, W] f32 (this block's rows)
        # out_ref [1, 8, RB, W] f32
        r = pl.program_id(1)
        r0 = pl.multiple_of(r * RB, 8)
        win = RB + 2 * HALO

        d_win = d_ref[0, pl.ds(r0, win), :]
        z = d_win.astype(jnp.float32) * jnp.float32(0.001)
        valid_win = d_win > 0
        ucx = ray_ref[0, pl.ds(r0, win), :]
        vcy = ray_ref[1, pl.ds(r0, win), :]
        x = z * ucx / jnp.float32(fx)
        y = z * vcy / jnp.float32(fy)
        rr = jnp.sqrt(x * x + y * y + z * z)
        inv_r = jnp.where(valid_win, 1.0 / rr, 0.0)

        # 5x5 box sum of ray_unit * inv_r: rows via static value slices
        # over the halo window, columns via masked rolls; accumulation
        # order matches geom/normals._box_sum (rows then columns, each
        # left-to-right)
        bs = []
        for c in range(3):
            comp = ray_ref[2 + c, pl.ds(r0, win), :] * inv_r
            rows = comp[0:RB, :]
            for k in range(1, 2 * HALO + 1):
                rows = rows + comp[k:RB + k, :]
            acc = _shift_cols(rows, -HALO, W)
            for k in (-1, 0, 1, 2):
                acc = acc + _shift_cols(rows, k, W)
            bs.append(acc)

        n0 = minv_ref[0] * bs[0] + minv_ref[1] * bs[1] + minv_ref[2] * bs[2]
        n1 = minv_ref[3] * bs[0] + minv_ref[4] * bs[1] + minv_ref[5] * bs[2]
        n2 = minv_ref[6] * bs[0] + minv_ref[7] * bs[1] + minv_ref[8] * bs[2]
        norm = jnp.sqrt(n0 * n0 + n1 * n1 + n2 * n2)
        norm_ok = (norm > 0) & jnp.isfinite(norm)
        n0 = n0 / norm
        n1 = n1 / norm
        n2 = n2 / norm
        # orient toward the camera: flip when n . unit_ray > 0
        ux = ray_ref[2, pl.ds(r0, win), :][HALO:HALO + RB, :]
        uy = ray_ref[3, pl.ds(r0, win), :][HALO:HALO + RB, :]
        uz = ray_ref[4, pl.ds(r0, win), :][HALO:HALO + RB, :]
        flip = (n0 * ux + n1 * uy + n2 * uz) > 0
        sgn = jnp.where(flip, -1.0, 1.0)
        n0 = n0 * sgn
        n1 = n1 * sgn
        n2 = n2 * sgn

        def center(a):
            return a[HALO:HALO + RB, :]

        zc, xc, yc = center(z), center(x), center(y)
        vc = center(valid_win)
        nan = jnp.float32(jnp.nan)
        bad = (~vc) | (~norm_ok)  # norm_ok/n are already center-sized
        out_ref[0, 0] = jnp.where(vc, xc, nan)
        out_ref[0, 1] = jnp.where(vc, yc, nan)
        out_ref[0, 2] = jnp.where(vc, zc, nan)
        out_ref[0, 3] = jnp.where(bad, nan, n0)
        out_ref[0, 4] = jnp.where(bad, nan, n1)
        out_ref[0, 5] = jnp.where(bad, nan, n2)
        out_ref[0, 6] = (vc & ~bad).astype(jnp.float32)
        out_ref[0, 7] = jnp.zeros((RB, W), jnp.float32)

    return kernel


class FusedScene:
    """Per-(H, W, K) fused geometry: depth batch -> [B, 8, H, W] planes.

    Host-side init mirrors geom/normals.FalsNormals exactly (f64 M
    inversion, window 5); the runtime is one pallas_call.
    """

    def __init__(self, height: int, width: int, K, window_size: int = 5):
        from object_detector_6d_tpu.geom.normals import FalsNormals

        assert window_size == 5, "kernel is specialized to the default window"
        assert height % RB == 0, (height, RB)
        self.height, self.width = height, width
        # pad rows to a sublane multiple so the last block's halo window
        # stays in bounds
        self._rows = height + 2 * HALO
        self._rows += (-self._rows) % 8
        K = np.asarray(K, dtype=np.float64)
        self.fx = float(np.float32(K[0, 0]))
        self.fy = float(np.float32(K[1, 1]))
        est = FalsNormals(height, width, K, window_size)
        minv = np.asarray(est._minv)  # [H, W, 3, 3] f32
        self._minv = jnp.asarray(
            np.ascontiguousarray(
                minv.reshape(height, width, 9).transpose(2, 0, 1)))
        unit = np.asarray(est._rays)  # [H, W, 3] f32, f64-normalized
        u, v = np.meshgrid(np.arange(width, dtype=np.float32),
                           np.arange(height, dtype=np.float32))
        rays = np.zeros((5, self._rows, width), np.float32)
        # (u - cx) exactly as depth_to_3d: f32 grid minus f32 scalar
        rays[0, HALO:HALO + height] = u - np.float32(K[0, 2])
        rays[1, HALO:HALO + height] = v - np.float32(K[1, 2])
        rays[2, HALO:HALO + height] = unit[..., 0]
        rays[3, HALO:HALO + height] = unit[..., 1]
        rays[4, HALO:HALO + height] = unit[..., 2]
        self._rays = jnp.asarray(rays)

    @functools.partial(jax.jit, static_argnums=0, static_argnames="interpret")
    def __call__(self, depths_u16: jnp.ndarray, interpret: bool = False):
        """[B, H, W] u16 -> [B, 8, H, W] f32 plane stacks."""
        B = depths_u16.shape[0]
        H, W = self.height, self.width
        d = jnp.pad(depths_u16.astype(jnp.int32),
                    ((0, 0), (HALO, self._rows - H - HALO), (0, 0)))
        nblk = H // RB
        return pl.pallas_call(
            _make_kernel(H, W, self.fx, self.fy),
            out_shape=jax.ShapeDtypeStruct((B, 8, H, W), jnp.float32),
            grid=(B, nblk),
            in_specs=[
                pl.BlockSpec((1, self._rows, W), lambda b, r: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((5, self._rows, W), lambda b, r: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, RB, W), lambda b, r: (0, r, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, RB, W), lambda b, r: (b, 0, r, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(d, self._rays, self._minv)


def planes_to_scene8(planes: jnp.ndarray) -> jnp.ndarray:
    """[8, H, W] plane stack -> [H*W, 8] packed scene rows.

    Rows are [x, y, z, nx, ny, nz, valid, 0] with invalid entries
    zeroed — the pack_scene7 layout padded to a 32-byte (power-of-two)
    row stride."""
    return jnp.nan_to_num(planes.reshape(8, -1).T)
