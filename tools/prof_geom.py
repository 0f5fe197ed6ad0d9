#!/usr/bin/env python3
"""A/B the fused-geometry kernel vs the XLA composition inside detect.

Measures (scan harness, batch 16):
  geom_xla        depth_to_3d + FALS + pack_scene7 (XLA)
  geom_fused      FusedScene kernel + nan_to_num + [B,8,HW]->[B,HW,8]
                  transpose (the layout the ICP gather wants)
  geom_fused_raw  FusedScene kernel alone (no transpose)
  detect_fused    full detect program, pallas path (FusedScene geometry)
  detect_xla      full detect program, pallas path with FusedScene
                  disabled (RB monkeypatched so H % RB != 0)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import scenes  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 16
H, W = 480, 640


def log(*a):
    print(*a, flush=True)


def device_time(name, fn, args, iters=8, reps=3, floor=0.031):
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
    per = (best - floor) / iters
    log(f"  [{name}] {per*1e3:8.2f} ms/exec (raw {best*1e3:.1f} ms / {iters})")
    return per


def build_inputs():
    from object_detector_6d_tpu.api.pipeline import PoseDetector
    from object_detector_6d_tpu.core.config import DetectParams, ICPParams
    from object_detector_6d_tpu.data.synthetic import synthetic_bank

    K = scenes.K_DEFAULT
    pd = PoseDetector(
        params=DetectParams(match_threshold=80.0, max_hypotheses=16,
                            icp=ICPParams(iterations=32, num_levels=4)),
        model_points=512,
    )
    synthetic_bank(n_classes=12, per_class=10, bbox_px=120, seed=0,
                   detector=pd.detector)
    depA, grayA, maskA = scenes.snowman_scene()
    pd.add_view("objA", depA, K, maskA.astype(np.uint8) * 255,
                rgb=np.repeat(grayA[..., None], 3, axis=2))
    depB, grayB, maskB = scenes.snowman_scene(scale=0.78)
    pd.add_view("objB", depB, K, maskB.astype(np.uint8) * 255,
                rgb=np.repeat(grayB[..., None], 3, axis=2))
    rng = np.random.RandomState(1)
    depths, rgbs = [], []
    for b in range(B):
        tA = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.04, 0.04),
                       rng.uniform(-0.04, 0.04)])
        tB = np.array([-0.26, 0.11, 0.04]) + rng.uniform(-0.03, 0.03, 3)
        rA = scenes.render_translated(depA, maskA, K, tA)
        rB = scenes.render_translated(depB, maskB, K, tB)
        d, _, g = scenes.merge_scenes([rA, rB])
        depths.append(d)
        rgbs.append(np.repeat(g[..., None], 3, axis=2))
    return pd, K, jnp.asarray(np.stack(depths)), jnp.asarray(np.stack(rgbs))


def main():
    log("devices:", jax.devices())
    from object_detector_6d_tpu.api import detect_program as dp_mod
    from object_detector_6d_tpu.geom.backproject import depth_to_3d
    from object_detector_6d_tpu.geom.normals import FalsNormals
    from object_detector_6d_tpu.match import program as mp
    from object_detector_6d_tpu.ops import geometry_pallas as gp
    from object_detector_6d_tpu.refine.projective import pack_scene7

    pd, K, depths_d, rgbs_d = build_inputs()
    Kj = jnp.asarray(K)
    est = FalsNormals(H, W, K)
    fscene = gp.FusedScene(H, W, K)

    def geom_xla(depths, eps):
        def one(d):
            cloud = depth_to_3d(d, Kj) + eps
            return pack_scene7(jnp.concatenate([cloud, est(cloud)], -1))
        return jax.vmap(one)(depths)

    def geom_fused(depths, eps):
        planes = fscene(depths) + eps
        return jnp.nan_to_num(planes.reshape(B, 8, -1)).transpose(0, 2, 1)

    def geom_fused_raw(depths, eps):
        return fscene(depths) + eps

    device_time("geom_xla", geom_xla, (depths_d,), iters=8)
    device_time("geom_fused", geom_fused, (depths_d,), iters=8)
    device_time("geom_fused_raw", geom_fused_raw, (depths_d,), iters=8)

    bank = pd.detector.get_bank(None)
    max_dr = ((bank.max_dr // 16) + 1) * 16
    views = dp_mod.pack_views(bank, pd.views, pd.model_points)
    margs = (
        [rgbs_d, depths_d],
        bank.kernels_low, bank.kernels_dec,
        (bank.feat_plane, bank.feat_dr, bank.feat_dc, bank.feat_n),
        jnp.asarray(bank.nfeat[0]), jnp.asarray(bank.nfeat[1]),
        jnp.asarray(bank.sizes[0]), jnp.asarray(bank.sizes[1]),
        views,
    )

    def build(label):
        return dp_mod.make_detect_program(
            pd.detector.modality_names, pd.detector.t_at_level, (H, W),
            pd.detector.dn_params, pd.detector.cg_params, K,
            max_candidates=16, max_dr=max_dr, refine_impl="pallas",
            icp=pd.params.icp, batch=B, flat_output=True,
        )

    prog_fused = build("fused")

    def detect_fused(sources, *rest):
        *bank_args, views, eps = rest
        return prog_fused(sources, *bank_args, views, jnp.float32(80.0) + eps)

    device_time("detect_fused_geom", detect_fused, margs, iters=6)

    rb0 = gp.RB
    gp.RB = 7  # H % RB != 0 -> make_detect_program falls back to XLA geometry
    try:
        prog_xla = build("xla")
    finally:
        gp.RB = rb0

    def detect_xla(sources, *rest):
        *bank_args, views, eps = rest
        return prog_xla(sources, *bank_args, views, jnp.float32(80.0) + eps)

    device_time("detect_xla_geom", detect_xla, margs, iters=6)


if __name__ == "__main__":
    main()
