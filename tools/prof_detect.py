#!/usr/bin/env python3
"""Device-time breakdown of the production fused detect program (TPU).

Measures, with the tools/prof_icp.py scan harness (iterations chained
through a data dependency; ~35 ms RPC floor amortized):

  rpc_floor     a trivial program, to calibrate the per-execution floor
  geometry      depth_to_3d + FALS normals + pack_scene7, batch 16
  match         the fused match program (121-template bank, pallas refine)
  detect_full   the COMPLETE production detect program (flat output)

Run after bench-level changes to see where the per-frame budget goes.
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
RPC_FLOOR = 0.035


def log(*a):
    print(*a, flush=True)


def device_time(name, fn, args, iters=8, reps=3, floor=RPC_FLOOR):
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


def main():
    log("devices:", jax.devices())
    from object_detector_6d_tpu.api import detect_program as dp_mod
    from object_detector_6d_tpu.api.pipeline import PoseDetector
    from object_detector_6d_tpu.core.config import DetectParams, ICPParams
    from object_detector_6d_tpu.data.synthetic import synthetic_bank
    from object_detector_6d_tpu.geom.backproject import depth_to_3d
    from object_detector_6d_tpu.geom.normals import FalsNormals
    from object_detector_6d_tpu.match import program as mp
    from object_detector_6d_tpu.refine.projective import pack_scene7

    K = scenes.K_DEFAULT
    Kj = jnp.asarray(K)
    pd = PoseDetector(
        params=DetectParams(match_threshold=80.0, max_hypotheses=16,
                            icp=ICPParams(iterations=32, num_levels=4)),
        model_points=512,
    )
    synthetic_bank(n_classes=12, per_class=10, bbox_px=120, seed=0,
                   detector=pd.detector)
    depA, grayA, maskA = scenes.snowman_scene()
    tid = pd.add_view("objA", depA, K, maskA.astype(np.uint8) * 255,
                      rgb=np.repeat(grayA[..., None], 3, axis=2))
    assert tid == 0
    depB, grayB, maskB = scenes.snowman_scene(scale=0.78)
    tid = pd.add_view("objB", depB, K, maskB.astype(np.uint8) * 255,
                      rgb=np.repeat(grayB[..., None], 3, axis=2))
    assert tid == 0

    rng = np.random.RandomState(1)
    depths, rgbs = [], []
    for b in range(B):
        tA = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.04, 0.04),
                       rng.uniform(-0.04, 0.04)])
        tB = np.array([-0.26 + rng.uniform(-0.03, 0.03),
                       0.11 + rng.uniform(-0.03, 0.03),
                       0.04 + rng.uniform(-0.03, 0.03)])
        rA = scenes.render_translated(depA, maskA, K, tA)
        rB = scenes.render_translated(depB, maskB, K, tB)
        d, _, g = scenes.merge_scenes([rA, rB])
        depths.append(d)
        rgbs.append(np.repeat(g[..., None], 3, axis=2))
    depths_d = jnp.asarray(np.stack(depths))
    rgbs_d = jnp.asarray(np.stack(rgbs))

    # --- rpc floor ---
    x0 = jnp.float32(1.0)
    tiny = jax.jit(lambda x: x + 1)
    np.asarray(tiny(x0))  # compile
    floor = 1e9
    for _ in range(5):
        t0 = time.time()
        np.asarray(tiny(x0))
        floor = min(floor, time.time() - t0)
    log(f"  [rpc_floor] {floor*1e3:.1f} ms/exec")

    # --- geometry ---
    est = FalsNormals(H, W, K)

    def geometry(depths, eps):
        def one(d):
            cloud = depth_to_3d(d, Kj) + eps
            return pack_scene7(jnp.concatenate([cloud, est(cloud)], -1))
        return jax.vmap(one)(depths)

    device_time("geometry_b16", geometry, (depths_d,), iters=8, floor=floor)

    # --- match program ---
    bank = pd.detector.get_bank(None)
    max_dr = ((bank.max_dr // 16) + 1) * 16
    match_prog = mp.make_match_program(
        pd.detector.modality_names, pd.detector.t_at_level, (H, W),
        pd.detector.dn_params, pd.detector.cg_params,
        max_candidates=16, max_dr=max_dr, refine_impl="pallas", batch=B,
    )
    margs = (
        [rgbs_d, depths_d],
        bank.kernels_low, bank.kernels_dec,
        (bank.feat_plane, bank.feat_dr, bank.feat_dc, bank.feat_n),
        jnp.asarray(bank.nfeat[0]), jnp.asarray(bank.nfeat[1]),
        jnp.asarray(bank.sizes[0]), jnp.asarray(bank.sizes[1]),
    )

    def match_fn(sources, *rest):
        *bank_args, eps = rest
        return match_prog(sources, *bank_args, jnp.float32(80.0) + eps)

    device_time("match_b16", match_fn, margs, iters=8, floor=floor)

    # --- full detect program ---
    views = dp_mod.pack_views(bank, pd.views, pd.model_points)
    prog = dp_mod.make_detect_program(
        pd.detector.modality_names, pd.detector.t_at_level, (H, W),
        pd.detector.dn_params, pd.detector.cg_params, K,
        max_candidates=16, max_dr=max_dr, refine_impl="pallas",
        icp=pd.params.icp, batch=B, flat_output=True,
    )

    def detect_fn(sources, *rest):
        *bank_args, views, eps = rest
        return prog(sources, *bank_args, views, jnp.float32(80.0) + eps)

    device_time("detect_full_b16", detect_fn, margs + (views,), iters=6,
                floor=floor)

    # --- headline scaling: B=32 and B=64 ---
    for BB in (32, 64):
        progB = dp_mod.make_detect_program(
            pd.detector.modality_names, pd.detector.t_at_level, (H, W),
            pd.detector.dn_params, pd.detector.cg_params, K,
            max_candidates=16, max_dr=max_dr, refine_impl="pallas",
            icp=pd.params.icp, batch=BB, flat_output=True,
        )
        reps = BB // B
        margsB = ([jnp.concatenate([rgbs_d] * reps),
                   jnp.concatenate([depths_d] * reps)],) + margs[1:]

        def detectB_fn(sources, *rest, _p=progB):
            *bank_args, views, eps = rest
            return _p(sources, *bank_args, views, jnp.float32(80.0) + eps)

        device_time(f"detect_full_b{BB}", detectB_fn, margsB + (views,),
                    iters=4, floor=floor)

    # --- streaming tick shape: same program at B=4 ---
    prog4 = dp_mod.make_detect_program(
        pd.detector.modality_names, pd.detector.t_at_level, (H, W),
        pd.detector.dn_params, pd.detector.cg_params, K,
        max_candidates=16, max_dr=max_dr, refine_impl="pallas",
        icp=pd.params.icp, batch=4, flat_output=True,
    )
    margs4 = ([rgbs_d[:4], depths_d[:4]],) + margs[1:]

    def detect4_fn(sources, *rest):
        *bank_args, views, eps = rest
        return prog4(sources, *bank_args, views, jnp.float32(80.0) + eps)

    device_time("detect_full_b4", detect4_fn, margs4 + (views,), iters=8,
                floor=floor)

    # end-to-end single-call comparison (includes transfer + host NMS)
    t0 = time.time()
    out = pd.detect_fused_batch(depths_d, K, rgbs_d)
    log(f"  [detect_fused_batch] first call {time.time()-t0:.1f}s "
        f"({sum(len(p) for p in out)} detections)")
    best = 1e9
    for _ in range(4):
        t0 = time.time()
        pd.detect_fused_batch(depths_d, K, rgbs_d)
        best = min(best, time.time() - t0)
    log(f"  [detect_fused_batch] {best*1e3:.1f} ms/batch end-to-end "
        f"-> {B/best:.1f} fps")


if __name__ == "__main__":
    main()
