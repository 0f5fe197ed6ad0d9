#!/usr/bin/env python3
"""Device-time profile of the fused-detect ICP stage (run on the TPU).

Times each piece of the projective-ICP phase of the fused detect()
program (api/detect_program.py) with a lax.scan harness: iterations are
chained through a data dependency (acc*1e-30 folded into a float input)
so XLA cannot CSE them, and the ~35 ms axon RPC floor is amortized over
the scan length. Pieces (lane counts follow K_CAP=16, S=3 seeds):

  lift_quantile      the nanquantile window lift (K_CAP candidates/frame)
  step_solve         the solve alone (Cholesky + exp + compose) on fixed A,b
  solve_unrolled     explicit unrolled 6x6 Cholesky (pure VPU elementwise)
  step_gather_L3     one association step WITHOUT the solve
                     (project+gather+resid at level-3 stride)
  coarse48_while_L3  production coarse phase: level (3,) while_loop on
                     K_CAP*S=48 lanes/frame
  coarse48_unroll_L3 same math, straight-line unrolled (no control flow)
  fine16_while_L210  production fine phase: levels (2,1,0) while_loop on
                     K_CAP=16 lanes/frame
  fine16_fixed_L210  same math, fixed fori_loop budget (masked freeze)
  fine16_unroll_L210 same math, straight-line unrolled

Prints ms per batch-16 execution for each piece.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import scenes  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from object_detector_6d_tpu.core.se3 import SE3  # noqa: E402
from object_detector_6d_tpu.geom.backproject import depth_to_3d  # noqa: E402
from object_detector_6d_tpu.geom.normals import FalsNormals  # noqa: E402
from object_detector_6d_tpu.refine.projective import (  # noqa: E402
    _chol_solve6,
    _proj_step,
    icp_levels,
    pack_scene7,
)

B = 16
K_CAP = 16  # production max_hypotheses default (core/config.py DetectParams)
S = 3
N_MODEL = 512
H, W = 480, 640
RPC_FLOOR = 0.035


def log(*a):
    print(*a, flush=True)


def device_time(name, fn, args, iters=8, reps=3):
    """fn(*args, eps) -> pytree; eps must be folded into a float input."""

    @jax.jit
    def many(args):
        def step(acc, _):
            out = fn(*args, acc * 1e-30)
            s = jnp.float32(0)
            for x in jax.tree_util.tree_leaves(out):
                s = s + jnp.sum(jnp.nan_to_num(x.astype(jnp.float32))) * 1e-30
            return s, None
        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
        return acc

    t0 = time.time()
    np.asarray(many(args))
    log(f"  [{name}] compile+first: {time.time()-t0:.1f}s")
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        np.asarray(many(args))
        best = min(best, time.time() - t0)
    per = (best - RPC_FLOOR) / iters
    log(f"  [{name}] {per*1e3:8.2f} ms/exec (raw {best*1e3:.1f} ms / {iters})")
    return per


def main():
    log("devices:", jax.devices())
    K = scenes.K_DEFAULT
    fx, fy = np.float32(K[0, 0]), np.float32(K[1, 1])
    cx, cy = np.float32(K[0, 2]), np.float32(K[1, 2])

    dep, gray, mask = scenes.snowman_scene()
    rng = np.random.RandomState(0)

    # scene7 per frame
    est = FalsNormals(H, W, K)
    Kj = jnp.asarray(K)

    @jax.jit
    def build_scene7(d):
        cloud = depth_to_3d(d, Kj)
        return pack_scene7(jnp.concatenate([cloud, est(cloud)], -1))

    deps = []
    for b in range(B):
        t = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.04, 0.04),
                      rng.uniform(-0.04, 0.04)])
        d2, _, _ = scenes.render_translated(dep, mask, K, t)
        deps.append(d2)
    scene7 = jnp.stack([build_scene7(jnp.asarray(d)) for d in deps])  # [B, HW, 7]
    np.asarray(scene7[0, 0])

    # model cloud from the masked scene (like add_view)
    cloud0 = np.asarray(depth_to_3d(jnp.asarray(dep), Kj))
    nrm0 = np.asarray(est(jnp.asarray(cloud0)))
    m = mask & np.isfinite(cloud0).all(-1) & np.isfinite(nrm0).all(-1)
    ys, xs = np.nonzero(m)
    sel = np.linspace(0, len(ys) - 1, N_MODEL).astype(int)
    model = np.concatenate(
        [cloud0[ys[sel], xs[sel]], nrm0[ys[sel], xs[sel]]], -1
    ).astype(np.float32)
    models_c = jnp.asarray(np.tile(model, (B, K_CAP * S, 1, 1)))  # [B, K_CAP*S, N, 6]
    models_f = models_c[:, :K_CAP]  # [B, K_CAP, N, 6]

    # perturbed init poses
    def rand_pose():
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = [rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02),
                    rng.uniform(-0.03, 0.03)]
        return p

    poses_c = jnp.asarray(
        np.stack([[rand_pose() for _ in range(K_CAP * S)] for _ in range(B)])
    )
    poses_f = poses_c[:, :K_CAP]

    iters = 8
    tol = 3e-4

    def run_levels(levels):
        def fn(models, poses, scene7, eps):
            def per_frame(ms, ps, s7):
                return jax.vmap(
                    lambda m, p: icp_levels(
                        m, p + eps, s7, fx, fy, cx, cy, H, W,
                        levels=levels, iters_per_level=iters, tolerance=tol,
                    )
                )(ms, ps)
            return jax.vmap(per_frame)(models, poses, scene7)
        return fn

    # --- fixed-budget variants (masked freeze): one shared per-level
    # body; ``unroll`` only picks the loop construct (fori_loop vs
    # straight-line python range, which lets XLA software-pipeline the
    # gather-bound steps across the lane batch) so the freeze-semantics
    # math cannot diverge between the two ---
    def icp_levels_budget(model_pc, pose0, s7, levels, unroll):
        pose = pose0
        residual = jnp.float32(jnp.inf)
        n_in = jnp.float32(0.0)
        N = model_pc.shape[0]
        for level in levels:
            stride = 1 << level
            n_lvl = max(1, N // stride)
            sample = model_pc[::stride][:n_lvl]
            msk = jnp.isfinite(sample[:, :3]).all(-1)
            sample = jnp.nan_to_num(sample)
            cap = jnp.float32(0.015) * (1 << level)

            def body(_, carry):
                pose, res, nin, active = carry
                new_pose, upd, new_res, new_nin = _proj_step(
                    pose, sample, msk, s7, fx, fy, cx, cy, H, W, cap,
                    jnp.float32(0.5),
                )
                pose = jnp.where(active, new_pose, pose)
                res = jnp.where(active, new_res, res)
                nin = jnp.where(active, new_nin, nin)
                active = active & (upd >= tol)
                return pose, res, nin, active

            carry = (pose, residual, n_in, jnp.bool_(True))
            if unroll:
                for i in range(iters):
                    carry = body(i, carry)
            else:
                carry = jax.lax.fori_loop(0, iters, body, carry)
            pose, residual, n_in, _ = carry
        return residual, pose, n_in

    def run_levels_budget(levels, unroll):
        def fn(models, poses, scene7, eps):
            def per_frame(ms, ps, s7):
                return jax.vmap(
                    lambda m, p: icp_levels_budget(m, p + eps, s7, levels,
                                                   unroll)
                )(ms, ps)
            return jax.vmap(per_frame)(models, poses, scene7)
        return fn

    def run_levels_fixed(levels):
        return run_levels_budget(levels, unroll=False)

    def run_levels_unrolled(levels):
        return run_levels_budget(levels, unroll=True)

    # --- step pieces ---
    def step_gather(models, poses, scene7, eps):
        stride = 1 << 3
        sample = models[:, :, ::stride]

        def per_frame(ms, ps, s7):
            def one(mdl, pose):
                pose = pose + eps
                mp = SE3.apply(pose, mdl[:, :3])
                mn = SE3.rotate(pose, mdl[:, 3:6])
                z = mp[:, 2]
                zs = jnp.where(z > 1e-6, z, 1.0)
                ui = jnp.round(fx * mp[:, 0] / zs + cx).astype(jnp.int32)
                vi = jnp.round(fy * mp[:, 1] / zs + cy).astype(jnp.int32)
                inb = (z > 1e-6) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
                idx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
                q = jnp.take(s7, idx, axis=0)
                r = jnp.sum((mp - q[:, :3]) * q[:, 3:6], -1)
                w = (inb & (q[:, 6] > 0)).astype(jnp.float32)
                return jnp.sum(r * w), jnp.sum(mn * w[:, None])
            return jax.vmap(one)(ms, ps)
        return jax.vmap(per_frame)(models, poses, scene7)

    def step_solve(A, b, poses, eps):
        def one(Ai, bi, p):
            x = _chol_solve6(Ai, bi + eps)
            dT = SE3.exp(x)
            return SE3.compose(dT, p), jnp.linalg.norm(x)
        return jax.vmap(jax.vmap(one))(A, b, poses)

    def _chol6_unrolled(A, b):
        """Explicit 6x6 Cholesky solve, unrolled (all ops elementwise)."""
        lam = 1e-6 * (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]
                      + A[..., 3, 3] + A[..., 4, 4] + A[..., 5, 5]) + 1e-12
        n = 6
        a = [[A[..., i, j] + jnp.where(i == j, lam, 0.0) for j in range(n)]
             for i in range(n)]
        L = [[None] * n for _ in range(n)]
        for j in range(n):
            s = a[j][j]
            for k in range(j):
                s = s - L[j][k] * L[j][k]
            L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            inv = 1.0 / L[j][j]
            for i in range(j + 1, n):
                s = a[i][j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                L[i][j] = s * inv
        y = [None] * n
        for i in range(n):
            s = b[..., i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return jnp.stack(x, -1)

    def step_solve_unrolled(A, b, poses, eps):
        x = _chol6_unrolled(A, b + eps)  # [B, L, 6]
        dT = jax.vmap(jax.vmap(SE3.exp))(x)
        return jax.vmap(jax.vmap(SE3.compose))(dT, poses), jnp.linalg.norm(x, axis=-1)

    # quantile lift
    win = 160
    qlevels = jnp.asarray([0.25, 0.5, 0.75])

    def lift_quantile(z_imgs, centers, eps):
        def per_frame(z_img, cs):
            def one(c):
                x0 = jnp.clip(c[0] - win // 2, 0, W - win)
                y0 = jnp.clip(c[1] - win // 2, 0, H - win)
                wv = jax.lax.dynamic_slice(z_img, (y0, x0), (win, win))
                return jnp.nanquantile(wv + eps, qlevels)
            return jax.vmap(one)(cs)
        return jax.vmap(per_frame)(z_imgs, centers)

    # --- run ---
    A0 = np.tile(np.eye(6, dtype=np.float32) * 100.0, (B, K_CAP * S, 1, 1))
    A0 += rng.uniform(0, 1, A0.shape).astype(np.float32) * 0.1
    A0 = (A0 + A0.transpose(0, 1, 3, 2)) / 2
    b0 = rng.uniform(-1, 1, (B, K_CAP * S, 6)).astype(np.float32)
    A0, b0 = jnp.asarray(A0), jnp.asarray(b0)

    z_imgs = scene7[..., 2].reshape(B, H, W)
    centers = jnp.asarray(
        rng.randint(100, 400, (B, K_CAP, 2)).astype(np.int32))

    device_time("lift_quantile", lift_quantile, (z_imgs, centers), iters=8)
    device_time("step_solve", step_solve, (A0, b0, poses_c), iters=32)
    device_time("solve_unrolled", step_solve_unrolled, (A0, b0, poses_c), iters=32)
    device_time("step_gather_L3", step_gather, (models_c, poses_c, scene7), iters=16)
    # production phase split (api/detect_program.py, num_levels=4):
    # coarse = level (3,) on K*S=48 lanes; fine = (2, 1, 0) on K=16 lanes
    device_time("coarse48_while_L3", run_levels((3,)),
                (models_c, poses_c, scene7), iters=4)
    device_time("coarse48_unroll_L3", run_levels_unrolled((3,)),
                (models_c, poses_c, scene7), iters=4)
    device_time("fine16_while_L210", run_levels((2, 1, 0)),
                (models_f, poses_f, scene7), iters=4)
    device_time("fine16_fixed_L210", run_levels_fixed((2, 1, 0)),
                (models_f, poses_f, scene7), iters=4)
    device_time("fine16_unroll_L210", run_levels_unrolled((2, 1, 0)),
                (models_f, poses_f, scene7), iters=4)


if __name__ == "__main__":
    main()
