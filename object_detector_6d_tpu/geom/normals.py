"""Surface normals from organized point clouds (reference L1, RgbdNormals).

FALS ("fast approximate least squares", Badino et al.) is the primary
method, matching RgbdNormals(..., RGBD_NORMALS_METHOD_FALS)
(depth.hpp:73-182) to angular tolerance:

For each pixel, with unit ray v(u,v) = normalize(K^-1 (u,v,1)) and range
r = |point|, the scaled normal minimizes sum_w (v_i . n - 1/r_i)^2 over
the window, giving n = M^-1 b with M = sum v v^T and b = sum v/r.

TPU-first split, mirroring the oracle's cached-initialization design:

* init (host, once per (H, W, K, window)): M and M^-1 per pixel in
  float64 — M is near-singular for small windows (ray directions vary by
  ~1/f per pixel), so the inversion *must* be double precision; the
  inverse is then cast to f32 and lives on device as a [H, W, 3, 3]
  constant.
* runtime (jit): 1/r image, three separable box sums for b, and a 3x3
  matvec per pixel — fused elementwise VPU work, no gathers, f32
  throughout (validated to <1.1 deg 99p angular error vs the oracle).

Normals are unit length and oriented toward the camera (n . ray < 0),
the oracle's convention. Invalid (NaN) center points yield NaN output;
unlike the measured CPU behavior, invalid *neighbors* would only distort
their windows, not poison them (1/r contributions are finite everywhere
we sum them) — deviations exist only where the oracle computes garbage.

A cross-product fallback (`normals_cross`) provides the cheap
neighbor-difference estimate used by KinectFusion-style projective ICP
(FastICPOdometry, depth.hpp:1028 region).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _box_sum(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable box sum over leading [H, W] dims with zero padding."""
    k = 2 * radius + 1
    H, W = x.shape[0], x.shape[1]
    pad = [(radius, radius)] + [(0, 0)] * (x.ndim - 1)
    p = jnp.pad(x, pad)
    x = sum(p[i : i + H] for i in range(k))
    pad = [(0, 0), (radius, radius)] + [(0, 0)] * (x.ndim - 2)
    p = jnp.pad(x, pad)
    return sum(p[:, i : i + W] for i in range(k))


class FalsNormals:
    """Per-(H, W, K, window) FALS normal estimator with cached M^-1."""

    def __init__(self, height: int, width: int, K, window_size: int = 5):
        self.height = height
        self.width = width
        self.window_size = window_size
        K = np.asarray(K, dtype=np.float64)
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        u, v = np.meshgrid(np.arange(width), np.arange(height))
        rays = np.stack(
            [(u - cx) / fx, (v - cy) / fy, np.ones((height, width))], axis=-1
        )
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
        radius = window_size // 2
        vvt = rays[..., :, None] * rays[..., None, :]
        M = np.asarray(_box_sum(jnp.asarray(vvt), radius))
        self._minv = jnp.asarray(np.linalg.inv(M).astype(np.float32))
        self._rays = jnp.asarray(rays.astype(np.float32))

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        """points [H, W, 3] (meters, NaN-invalid) -> normals [H, W, 3]."""
        radius = self.window_size // 2
        r = jnp.linalg.norm(points, axis=-1)
        valid = jnp.isfinite(r) & (r > 0)
        inv_r = jnp.where(valid, 1.0 / jnp.where(valid, r, 1.0), 0.0)
        b = _box_sum(self._rays * inv_r[..., None].astype(jnp.float32), radius)
        # HIGHEST: the default TPU matmul precision truncates operands to
        # bf16 (8-bit mantissa) on the MXU, which is several degrees of
        # normal error — poison for the ncos correspondence gate and the
        # point-to-plane residuals downstream
        n = jnp.einsum("hwij,hwj->hwi", self._minv, b,
                       precision=jax.lax.Precision.HIGHEST)
        norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
        n = n / norm
        flip = jnp.sum(n * self._rays, axis=-1, keepdims=True) > 0
        n = jnp.where(flip, -n, n)
        bad = (~valid) | (norm[..., 0] == 0) | ~jnp.isfinite(norm[..., 0])
        return jnp.where(bad[..., None], jnp.nan, n)


@functools.lru_cache(maxsize=8)
def _cached_fals(height: int, width: int, k_bytes: bytes, window_size: int) -> FalsNormals:
    K = np.frombuffer(k_bytes, dtype=np.float64).reshape(3, 3)
    return FalsNormals(height, width, K, window_size)


def normals_fals(points, K, window_size: int = 5) -> jnp.ndarray:
    """Convenience wrapper over :class:`FalsNormals` (estimator cached)."""
    points = jnp.asarray(points)
    H, W, _ = points.shape
    k_bytes = np.ascontiguousarray(np.asarray(K, dtype=np.float64)).tobytes()
    return _cached_fals(H, W, k_bytes, window_size)(points)


@functools.partial(jax.jit, static_argnames=("difference_threshold",))
def _normals_linemod_impl(depth_u16, fx, fy, cx, cy, difference_threshold):
    from object_detector_6d_tpu.quant.depth_normal import (
        interior_mask,
        ring_gradient,
    )

    d = depth_u16.astype(jnp.int32)
    H, W = d.shape
    ddx, ddy, det = ring_gradient(d, difference_threshold, inclusive=True)
    detf = det.astype(jnp.float32)
    zero = det == 0
    gu = ddx.astype(jnp.float32) / jnp.where(zero, 1.0, detf)
    gv = ddy.astype(jnp.float32) / jnp.where(zero, 1.0, detf)
    u, v = jnp.meshgrid(jnp.arange(W), jnp.arange(H), indexing="xy")
    nx = fx * gu
    ny = fy * gv
    # the +1 pixel offsets are the oracle's (measured exactly on ramps:
    # u+1-cx / v+1-cy reproduce its values to the printed f32 digit;
    # u-cx is ~0.05 deg off)
    nz = -(
        (u.astype(jnp.float32) + 1.0 - cx) * gu
        + (v.astype(jnp.float32) + 1.0 - cy) * gv
        + d.astype(jnp.float32)
    )
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv = 1.0 / jnp.where(norm > 0, norm, 1.0)
    n = jnp.stack([nx * inv, ny * inv, nz * inv], -1)
    # orient toward the camera (flat surface -> (0, 0, -1))
    n = jnp.where(n[..., 2:3] > 0, -n, n)
    # all ring samples rejected (isolated pixels) or zero depth -> NaN,
    # like the oracle's hole pixels (d == 0 is NaN even when the whole
    # ring is also zero and the gradient is formally defined); outside
    # the interior ring margin -> (0, 0, 0)
    n = jnp.where((zero | (d == 0))[..., None], jnp.nan, n)
    return jnp.where(interior_mask(H, W)[..., None], n, 0.0)


def normals_linemod(depth_u16, K, difference_threshold: int = 50) -> jnp.ndarray:
    """RgbdNormals LINEMOD method: real-valued normals from RAW u16 depth.

    The third of the oracle's three estimators (depth.hpp:112,
    RGBD_NORMALS_METHOD_LINEMOD; feed it raw CV_16U — the oracle
    segfaults on points input). Reverse-engineered black-box [measured]:

    * depth gradient (z_u, z_v) from the same bilateral-masked r=5 ring
      least squares as the DepthNormal quantizer (difference_threshold
      50, window_size has NO effect — verified ws in {1,3,5,7});
    * normal = normalize(fx*z_u, fy*z_v, -((u+1-cx)z_u + (v+1-cy)z_v + z))
      — the exact differential surface normal of z(u, v), camera-facing;
    * ring-margin borders return (0,0,0); pixels whose every ring sample
      is bilateral-rejected (depth holes) return NaN; no distance
      cutoff (2500 mm and 50 m inputs measured valid).

    Parity: exact on single-axis ramps; <=0.1 deg on mixed gradients
    (tests/test_geom.py golden).
    """
    depth_u16 = jnp.asarray(depth_u16)
    K = np.asarray(K, np.float64)
    return _normals_linemod_impl(
        depth_u16,
        jnp.float32(K[0, 0]), jnp.float32(K[1, 1]),
        jnp.float32(K[0, 2]), jnp.float32(K[1, 2]),
        difference_threshold,
    )


@jax.jit
def normals_cross(points: jnp.ndarray) -> jnp.ndarray:
    """Cheap central-difference cross-product normals [H, W, 3].

    Camera-oriented, NaN where any contributing neighbor is invalid.
    """
    dx = jnp.gradient(points, axis=1)
    dy = jnp.gradient(points, axis=0)
    n = jnp.cross(dy, dx)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / norm
    flip = n[..., 2:3] > 0
    n = jnp.where(flip, -n, n)
    bad = ~jnp.isfinite(norm[..., 0]) | (norm[..., 0] == 0)
    return jnp.where(bad[..., None], jnp.nan, n)


@functools.partial(jax.jit, static_argnames=("window_size",))
def normals_sri(points: jnp.ndarray, K: jnp.ndarray, window_size: int = 5) -> jnp.ndarray:
    """SRI-method normals (RGBD_NORMALS_METHOD_SRI class of estimator).

    The range image r(u, v) = |p| is smoothed and differentiated in
    image space; surface tangents follow from p = r(u,v) * ray(u,v):
    t_u = r_u * ray + r * ray_u (analytic ray derivatives), and the
    normal is their cross product, camera-oriented. Matches FALS to a
    few degrees on smooth surfaces; cheaper (no per-pixel solve).
    """
    H, W, _ = points.shape
    radius = window_size // 2
    from object_detector_6d_tpu.core.intrinsics import Intrinsics, pixel_grid

    intr = Intrinsics.from_matrix(K)
    u, v = pixel_grid(H, W)
    rays = jnp.stack(
        [(u - intr.cx) / intr.fx, (v - intr.cy) / intr.fy, jnp.ones_like(u)],
        axis=-1,
    )
    norm_r = jnp.linalg.norm(rays, axis=-1, keepdims=True)
    rays_u = rays / norm_r
    # analytic derivatives of the unit ray field
    d_du = jnp.gradient(rays_u, axis=1)
    d_dv = jnp.gradient(rays_u, axis=0)

    r = jnp.linalg.norm(points, axis=-1)
    valid = jnp.isfinite(r) & (r > 0)
    w = valid.astype(points.dtype)
    r0 = jnp.where(valid, r, 0.0)
    rs = _box_sum(r0, radius) / jnp.maximum(_box_sum(w, radius), 1.0)
    r_u = jnp.gradient(rs, axis=1)
    r_v = jnp.gradient(rs, axis=0)

    t_u = r_u[..., None] * rays_u + rs[..., None] * d_du
    t_v = r_v[..., None] * rays_u + rs[..., None] * d_dv
    n = jnp.cross(t_v, t_u)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / norm
    flip = jnp.sum(n * rays_u, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    bad = (~valid) | (norm[..., 0] == 0) | ~jnp.isfinite(norm[..., 0])
    return jnp.where(bad[..., None], jnp.nan, n)
