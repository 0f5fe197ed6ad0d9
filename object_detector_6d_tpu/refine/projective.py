"""Projective-association point-to-plane ICP (KinectFusion style).

The brute-force MXU nearest-neighbor ICP (refine/icp.py) is exact but
materializes an [N, M] distance matrix per hypothesis per iteration —
the right tool for unordered scene clouds, too expensive to fuse into
the per-frame detect() program. This module is the organized-scene
variant the canonical stack uses in its real-time paths
(FastICPOdometry, depth.hpp:1028 region; KinectFusion data
association): project each model point through the current pose into
the scene's pixel grid and take the scene point/normal stored at that
pixel as the correspondence — O(1) gathers instead of an O(M) search,
which is exactly the organized-frame structure the TPU keeps resident
anyway.

Everything else matches refine/icp.py step-for-step: MAD outlier
rejection scaled by ``rejection_scale`` plus an absolute per-level
correspondence cap, centroid-conjugated point-to-plane normal
equations (Kok-Lim Low linearization, icp.hpp:77-78), damped 6x6
solve, SE3.exp retraction, coarse-to-fine model subsampling with
convergence-masked fixed iteration budgets (icp.hpp:90-98 defaults).

Used by the fused detect() program (api/detect_program.py) where the
scene is the organized [H, W, 6] cloud+normal image already on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from object_detector_6d_tpu.core.se3 import SE3


def _solve6(A, b):
    """Damped 6x6 solve (see refine/icp.py:_solve6)."""
    lam = 1e-6 * jnp.trace(A) + 1e-12
    A = A + lam * jnp.eye(6, dtype=A.dtype)
    return jnp.linalg.solve(A, b)


def _proj_step(
    pose,
    model_pc,  # [n, 6] xyz+normal (finite; masked rows via ``mask``)
    mask,  # [n] bool valid model rows
    scene_flat,  # [H*W, 6] organized scene, NaNs zeroed
    s_valid,  # [H*W] bool finite scene rows
    fx,
    fy,
    cx,
    cy,
    H,
    W,
    rejection_scale,
    max_corr_dist,
):
    """One projective point-to-plane iteration."""
    mp = SE3.apply(pose, model_pc[:, :3])
    z = mp[:, 2]
    zs = jnp.where(z > 1e-6, z, 1.0)
    ui = jnp.round(fx * mp[:, 0] / zs + cx).astype(jnp.int32)
    vi = jnp.round(fy * mp[:, 1] / zs + cy).astype(jnp.int32)
    inb = (z > 1e-6) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    idx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
    q6 = jnp.take(scene_flat, idx, axis=0)  # [n, 6]
    qv = mask & inb & jnp.take(s_valid, idx, axis=0)
    qp = q6[:, :3]
    qn = q6[:, 3:6]

    d = jnp.linalg.norm(mp - qp, axis=-1)
    d_nan = jnp.where(qv, d, jnp.nan)
    med = jnp.nan_to_num(jnp.nanmedian(d_nan))
    mad = jnp.nan_to_num(jnp.nanmedian(jnp.abs(d_nan - med)))
    thr = jnp.minimum(med + rejection_scale * jnp.float32(1.4826) * mad,
                      max_corr_dist)
    w = (qv & (d <= thr)).astype(jnp.float32)

    r = jnp.sum((mp - qp) * qn, axis=-1)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    c = jnp.sum(mp * w[:, None], axis=0) / wsum
    J = jnp.concatenate([jnp.cross(mp - c, qn), qn], axis=-1)  # [n, 6]
    Jw = J * w[:, None]
    A = jnp.matmul(Jw.T, J, precision=jax.lax.Precision.HIGHEST)
    b = -jnp.matmul(Jw.T, r[:, None], precision=jax.lax.Precision.HIGHEST)[:, 0]
    x = _solve6(A, b)
    dT = SE3.exp(x)
    shift = SE3.from_rt(jnp.eye(3, dtype=pose.dtype), c)
    unshift = SE3.from_rt(jnp.eye(3, dtype=pose.dtype), -c)
    new_pose = SE3.compose(shift, SE3.compose(dT, SE3.compose(unshift, pose)))
    residual = jnp.sum(jnp.abs(r) * w) / wsum
    return new_pose, jnp.linalg.norm(x), residual, jnp.sum(w)


def projective_icp(
    model_pc,  # [N, 6] (NaN rows = padding)
    pose0,  # [4, 4]
    scene_flat,  # [H*W, 6] NaNs zeroed
    s_valid,  # [H*W] bool
    fx,
    fy,
    cx,
    cy,
    H: int,
    W: int,
    iterations: int = 100,
    tolerance: float = 1e-4,
    rejection_scale: float = 2.5,
    num_levels: int = 6,
    corr_dist_base: float = 0.015,
):
    """Refine one pose against the organized scene; vmap for batches.

    Returns (residual, pose, n_inliers). ``residual`` is the mean
    absolute point-to-plane distance of inlier correspondences at the
    finest level (same convention as refine/icp.py).

    ``tolerance`` is the twist-update-norm early-exit and defaults
    tighter than the NN ICP's 0.005: projective association takes
    smaller steps per iteration (the correspondence field only changes
    when points cross pixel boundaries), so the oracle's tolerance
    stops it ~25 mm early on lateral axes [measured on the snowman
    scene: tol=5e-3 -> 26 mm x-error, tol=1e-4 -> 1.3 mm].
    """
    N = model_pc.shape[0]
    tolerance = jnp.float32(tolerance)
    rejection_scale = jnp.float32(rejection_scale)
    pose = pose0
    residual = jnp.float32(jnp.inf)
    n_in = jnp.float32(0.0)
    for level in range(num_levels - 1, -1, -1):
        stride = 1 << level
        n_lvl = max(1, N // stride)
        sample = model_pc[::stride][:n_lvl]
        mask = jnp.isfinite(sample[:, :3]).all(-1)
        sample = jnp.nan_to_num(sample)
        iters = max(1, iterations // num_levels)
        cap = jnp.float32(corr_dist_base) * (1 << level)

        def body(carry):
            i, pose, _res, _upd, _nin = carry
            new_pose, upd, res, nin = _proj_step(
                pose, sample, mask, scene_flat, s_valid,
                fx, fy, cx, cy, H, W, rejection_scale, cap,
            )
            return i + 1, new_pose, res, upd, nin

        def cond(carry):
            i, _pose, _res, upd, _nin = carry
            return (i < iters) & (upd >= tolerance)

        _, pose, residual, _, n_in = jax.lax.while_loop(
            cond, body, (0, pose, residual, jnp.float32(1e9), n_in)
        )
    return residual, pose, n_in
