"""Dense RGB-D odometry (reference N16: depth.hpp:459-1193).

The reference's odometry family, redesigned as batched jnp programs:

* ``ICPOdometry``    — KinectFusion-style projective point-to-plane ICP
  between two organized frames: transform source points by the current
  pose, project into the destination camera, gather destination
  point/normal at the hit pixel, solve the 6x6 Kok-Lim Low system
  (centroid-centered, like refine/icp).
* ``RgbdOdometry``   — dense photometric alignment (Steinbruecker/Kerl
  style): minimize I_dst(pi(T p)) - I_src over valid pixels with image
  gradients gathered at the warped location.
* ``RgbdICPOdometry``— weighted combination of both residuals in one
  normal-equation solve.
* ``FastICPOdometry``— ICPOdometry with cheap cross-product normals and
  strided pixel sampling.

All variants run coarse-to-fine over an averaging depth pyramid with
fixed iteration counts + convergence masking (jit-stable), mirroring the
reference's iterCounts=[7,7,7,10] default. ``OdometryFrame`` caches the
per-level clouds/normals/intensity like the reference's frame cache.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_6d_tpu.core.intrinsics import Intrinsics, pixel_grid
from object_detector_6d_tpu.core.se3 import SE3
from object_detector_6d_tpu.geom.backproject import depth_to_3d
from object_detector_6d_tpu.geom.normals import normals_cross

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

# fine -> coarse; the oracle's defaultIterCounts {7,7,7,10} is indexed by
# pyramid level with level 0 = finest, so the coarsest level gets 10
DEFAULT_ITER_COUNTS = (7, 7, 7, 10)
DEFAULT_MAX_DEPTH_DIFF = 0.07  # meters (Odometry::DEFAULT_MAX_DEPTH_DIFF)


def _avg_pyr_down(z: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean of valid depths (NaN-aware)."""
    H, W = z.shape
    z = z[: H // 2 * 2, : W // 2 * 2]
    blocks = z.reshape(H // 2, 2, W // 2, 2).transpose(0, 2, 1, 3).reshape(H // 2, W // 2, 4)
    v = jnp.isfinite(blocks)
    s = jnp.where(v, blocks, 0.0).sum(-1)
    c = v.sum(-1)
    return jnp.where(c > 0, s / jnp.maximum(c, 1), jnp.nan)


@dataclasses.dataclass
class OdometryFrame:
    """Cached per-level geometry for one RGB-D frame (OdometryFrame)."""

    clouds: List[jnp.ndarray]  # [H, W, 3] per level
    normals: List[jnp.ndarray]
    intensities: List[Optional[jnp.ndarray]]  # f32 [H, W] or None
    Ks: List[np.ndarray]

    @classmethod
    def create(cls, depth, K, image=None, levels: int = 4):
        z = jnp.asarray(depth)
        from object_detector_6d_tpu.geom.depth import rescale_depth

        z = rescale_depth(z)
        gray = None
        if image is not None:
            img = jnp.asarray(image).astype(jnp.float32)
            gray = img.mean(-1) if img.ndim == 3 else img
        clouds, normals, intensities, Ks = [], [], [], []
        Kl = np.asarray(K, np.float64)
        for lvl in range(levels):
            cloud = depth_to_3d(z, jnp.asarray(Kl))
            clouds.append(cloud)
            normals.append(normals_cross(cloud))
            intensities.append(gray)
            Ks.append(Kl.copy())
            if lvl + 1 < levels:
                z = _avg_pyr_down(z)
                if gray is not None:
                    gray = _avg_pyr_down(gray)
                Kl = Kl.copy()
                Kl[:2] *= 0.5
        return cls(clouds, normals, intensities, Ks)


@functools.partial(jax.jit, static_argnames=("use_icp", "use_rgb", "iters", "stride"))
def _odometry_level(
    src_cloud, dst_cloud, dst_normals, src_gray, dst_gray, K, pose0,
    use_icp: bool, use_rgb: bool, iters: int, stride: int,
    max_depth_diff, tolerance,
):
    """GN iterations at one pyramid level; returns (pose, residual)."""
    H, W, _ = dst_cloud.shape
    intr = Intrinsics.from_matrix(K)
    sp = src_cloud[::stride, ::stride].reshape(-1, 3)
    s_valid = jnp.isfinite(sp).all(-1)
    sp = jnp.nan_to_num(sp)
    dst_c = jnp.nan_to_num(dst_cloud)
    dst_n = jnp.nan_to_num(dst_normals)
    dst_ok = jnp.isfinite(dst_cloud).all(-1) & jnp.isfinite(dst_normals).all(-1)
    if use_rgb:
        sg = src_gray[::stride, ::stride].reshape(-1)
        gx, gy = jnp.gradient(dst_gray, axis=1), jnp.gradient(dst_gray, axis=0)
    else:
        sg = None

    def body(carry):
        i, pose, _res, _upd = carry
        mp = SE3.apply(pose, sp)
        z = jnp.maximum(mp[:, 2], 1e-6)
        u = jnp.round(intr.fx * mp[:, 0] / z + intr.cx).astype(jnp.int32)
        v = jnp.round(intr.fy * mp[:, 1] / z + intr.cy).astype(jnp.int32)
        inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & s_valid & (mp[:, 2] > 0)
        uc = jnp.clip(u, 0, W - 1)
        vc = jnp.clip(v, 0, H - 1)
        q = dst_c[vc, uc]
        nq = dst_n[vc, uc]
        ok = inb & dst_ok[vc, uc] & (jnp.abs(q[:, 2] - mp[:, 2]) < max_depth_diff)
        w = ok.astype(jnp.float32)
        wsum = jnp.maximum(w.sum(), 1.0)
        c = jnp.sum(mp * w[:, None], 0) / wsum

        A = jnp.zeros((6, 6), jnp.float32)
        b = jnp.zeros((6,), jnp.float32)
        res_acc = jnp.float32(0.0)
        if use_icp:
            r = jnp.sum((mp - q) * nq, -1)
            J = jnp.concatenate([jnp.cross(mp - c, nq), nq], -1)
            Jw = J * w[:, None]
            A = A + _mm(Jw.T, J)
            b = b - _mm(Jw.T, r[:, None])[:, 0]
            res_acc = res_acc + jnp.sum(jnp.abs(r) * w) / wsum
        if use_rgb:
            ig = dst_gray[vc, uc]
            gxv = gx[vc, uc]
            gyv = gy[vc, uc]
            rI = (ig - sg) * 0.01  # intensity scaled to ~meters
            # dI/dxi = [gx, gy] . dpi/dp . dp/dxi, with p about centroid c
            zz = z
            jx = gxv * intr.fx / zz
            jy = gyv * intr.fy / zz
            jz = -(jx * mp[:, 0] + jy * mp[:, 1]) / zz
            Jt = jnp.stack([jx, jy, jz], -1) * 0.01
            pc = mp - c
            Jr = jnp.stack(
                [
                    pc[:, 1] * Jt[:, 2] - pc[:, 2] * Jt[:, 1],
                    pc[:, 2] * Jt[:, 0] - pc[:, 0] * Jt[:, 2],
                    pc[:, 0] * Jt[:, 1] - pc[:, 1] * Jt[:, 0],
                ],
                -1,
            )
            JI = jnp.concatenate([Jr, Jt], -1)
            JIw = JI * w[:, None]
            A = A + _mm(JIw.T, JI)
            b = b - _mm(JIw.T, rI[:, None])[:, 0]
            res_acc = res_acc + jnp.sum(jnp.abs(rI) * w) / wsum

        lam = 1e-6 * jnp.trace(A) + 1e-12
        x = jnp.linalg.solve(A + lam * jnp.eye(6, dtype=A.dtype), b)
        dT = SE3.exp(x)
        shift = SE3.from_rt(jnp.eye(3, dtype=pose.dtype), c)
        unshift = SE3.from_rt(jnp.eye(3, dtype=pose.dtype), -c)
        new_pose = SE3.compose(shift, SE3.compose(dT, SE3.compose(unshift, pose)))
        return i + 1, new_pose, res_acc, jnp.linalg.norm(x)

    def cond(carry):
        i, _p, _r, upd = carry
        return (i < iters) & (upd >= tolerance)

    _, pose, residual, _ = jax.lax.while_loop(
        cond, body, (0, pose0, jnp.float32(0.0), jnp.float32(1e9))
    )
    return pose, residual


@dataclasses.dataclass
class Odometry:
    """Base odometry (mirrors cv::rgbd::Odometry::compute).

    ``compute(src_frame, dst_frame, init_Rt)`` estimates the transform
    that maps source-frame points into the destination frame."""

    method: str = "ICP"  # ICP | Rgbd | RgbdICP | FastICP
    iter_counts: Tuple[int, ...] = DEFAULT_ITER_COUNTS
    max_depth_diff: float = DEFAULT_MAX_DEPTH_DIFF
    tolerance: float = 1e-4

    def compute(
        self,
        src: OdometryFrame,
        dst: OdometryFrame,
        init_Rt: Optional[np.ndarray] = None,
    ) -> Tuple[bool, np.ndarray]:
        levels = len(src.clouds)
        pose = jnp.asarray(
            np.eye(4, dtype=np.float32) if init_Rt is None else np.asarray(init_Rt, np.float32)
        )
        use_icp = self.method in ("ICP", "RgbdICP", "FastICP")
        use_rgb = self.method in ("Rgbd", "RgbdICP")
        residual = 0.0
        for lvl in range(levels - 1, -1, -1):
            iters = self.iter_counts[min(lvl, len(self.iter_counts) - 1)]
            stride = 2 if self.method == "FastICP" else 1
            src_gray = src.intensities[lvl]
            dst_gray = dst.intensities[lvl]
            if use_rgb and (src_gray is None or dst_gray is None):
                raise ValueError(f"method {self.method} needs intensity images")
            pose, residual = _odometry_level(
                src.clouds[lvl],
                dst.clouds[lvl],
                dst.normals[lvl],
                src_gray if use_rgb else jnp.zeros((1, 1)),
                dst_gray if use_rgb else jnp.zeros((1, 1)),
                jnp.asarray(src.Ks[lvl]),
                pose,
                use_icp,
                use_rgb,
                int(iters),
                stride,
                jnp.float32(self.max_depth_diff),
                jnp.float32(self.tolerance),
            )
        return True, np.asarray(pose)


def RgbdOdometry(**kw) -> Odometry:
    return Odometry(method="Rgbd", **kw)


def ICPOdometry(**kw) -> Odometry:
    return Odometry(method="ICP", **kw)


def RgbdICPOdometry(**kw) -> Odometry:
    return Odometry(method="RgbdICP", **kw)


def FastICPOdometry(**kw) -> Odometry:
    return Odometry(method="FastICP", **kw)
