"""ADD-0.1d parity: the canonical cv2 pipeline vs the TPU framework.

The north-star accuracy target (BASELINE.json) is "ADD-0.1d matching CPU
reference within 0.5%". This tool composes the reference pipeline from
the canonical components (cv2.linemod match -> hypothesis lift ->
cv2.ppf_match_3d ICP, exactly the SURVEY.md section 3.1 call stack) and
runs BOTH pipelines over the same rotation-varying synthetic scene set:

  # 1. oracle side (OpenCV 4.6 contrib python):
  /usr/bin/python3 tools/parity_add.py oracle
      -> writes tests/golden/parity_add_oracle.npz
  # 2. our side (venv python; runs detect_fused, loads the oracle npz):
  python3 tools/parity_add.py ours
      -> prints the per-scene and summary ADD / ADD-0.1d table

Scene set (deterministic, seed 0): the snowman training view posed at
N_SCENES rigid transforms — rotations up to +/-12 deg about random axes
through the object centroid composed with translations up to +/-40 mm
(one training view supports limited out-of-plane rotation; larger
rotations need a multi-view bank — see test_rotation_bank.py).

ADD = mean_q ||T_est q - T_gt q|| over the sampled model cloud;
ADD-0.1d success = ADD < 0.1 * object diameter.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import scenes

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "parity_add_oracle.npz",
)
N_SCENES = 20
MODEL_POINTS = 512
MATCH_THRESHOLD = 70.0
LIFT_WINDOW = 160
SEED_MIN_GAP = 0.015


def scene_set():
    """Deterministic GT poses: (pose_4x4, depth, gray, mask) per scene."""
    K = scenes.K_DEFAULT
    dep, gray, mask = scenes.snowman_scene()
    c = scenes.masked_centroid(dep, mask, K)
    rng = np.random.RandomState(0)
    out = []
    for i in range(N_SCENES):
        axis = rng.normal(size=3)
        deg = rng.uniform(-12, 12)
        t = rng.uniform(-0.04, 0.04, size=3) * np.array([1.0, 0.8, 1.0])
        pose = scenes.rot_about(axis, deg, c)
        pose[:3, 3] += t
        d2, m2, g2 = scenes.render_posed(dep, mask, K, pose)
        out.append((pose, d2, g2, m2))
    return K, dep, gray, mask, out


def sample_model(cloud, normals, mask):
    ok = mask & np.isfinite(cloud).all(-1) & np.isfinite(normals).all(-1)
    ys, xs = np.nonzero(ok)
    sel = np.linspace(0, len(ys) - 1, min(MODEL_POINTS, len(ys))).astype(int)
    pts = cloud[ys[sel], xs[sel]]
    nrm = normals[ys[sel], xs[sel]]
    return np.concatenate([pts, nrm], -1).astype(np.float32)


def add_metric(T_est, T_gt, model_pts):
    a = model_pts @ T_est[:3, :3].T + T_est[:3, 3]
    b = model_pts @ T_gt[:3, :3].T + T_gt[:3, 3]
    return float(np.linalg.norm(a - b, axis=-1).mean())


def diameter(model_pts):
    lo, hi = model_pts.min(0), model_pts.max(0)
    return float(np.linalg.norm(hi - lo))


# ----------------------------------------------------------------------
# oracle side: /usr/bin/python3 (cv2 4.6 contrib)
# ----------------------------------------------------------------------


def run_oracle():
    import cv2

    K, dep, gray, mask, scene_list = scene_set()
    bgr = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
    mask_u8 = mask.astype(np.uint8) * 255

    det = cv2.linemod.getDefaultLINEMOD()
    tid, bbox = det.addTemplate([bgr, dep], "obj", mask_u8)
    assert tid == 0, "oracle template extraction failed"
    bx, by, bw, bh = bbox

    # training-view model cloud + anchor (same recipe as api/pipeline.py)
    cloud = cv2.rgbd.depthTo3d(dep, K)
    est = cv2.rgbd.RgbdNormals_create(
        480, 640, cv2.CV_32F, K, 5, cv2.rgbd.RgbdNormals_RGBD_NORMALS_METHOD_FALS
    )
    normals = est.apply(cloud)
    model = sample_model(cloud, normals, mask)
    zm = float(np.nanmedian(model[:, 2]))
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    anchor = np.array(
        [zm * (bx + bw / 2.0 - cx) / fx, zm * (by + bh / 2.0 - cy) / fy, zm]
    )

    icp = cv2.ppf_match_3d_ICP(100, 0.005, 2.5, 6)
    est_poses = np.full((len(scene_list), 4, 4), np.nan)
    est_found = np.zeros(len(scene_list), bool)
    for i, (gt, d2, g2, m2) in enumerate(scene_list):
        bgr2 = cv2.cvtColor(g2, cv2.COLOR_GRAY2BGR)
        matches, _ = det.match([bgr2, d2], MATCH_THRESHOLD)
        if not matches:
            print(f"scene {i:2d}: no match", flush=True)
            continue
        m = matches[0]
        cloud2 = cv2.rgbd.depthTo3d(d2, K)
        normals2 = est.apply(cloud2)
        scene6 = np.concatenate([cloud2, normals2], -1)[::2, ::2].reshape(-1, 6)
        scene6 = scene6[np.isfinite(scene6).all(-1)].astype(np.float32)

        # multi-depth lift: window quantile seeds, dedup (pipeline.py rule)
        z_img = cloud2[..., 2]
        cxi = int(np.clip(m.x + bw // 2 - LIFT_WINDOW // 2, 0, 640 - LIFT_WINDOW))
        cyi = int(np.clip(m.y + bh // 2 - LIFT_WINDOW // 2, 0, 480 - LIFT_WINDOW))
        w = z_img[cyi:cyi + LIFT_WINDOW, cxi:cxi + LIFT_WINDOW]
        zq = np.nanquantile(w, [0.25, 0.5, 0.75])
        zs = []
        for z in zq[np.isfinite(zq)]:
            if all(abs(z - z2) > SEED_MIN_GAP for z2 in zs):
                zs.append(float(z))
        best = None
        for z in zs:
            target = np.array(
                [z * (m.x + bw / 2.0 - cx) / fx, z * (m.y + bh / 2.0 - cy) / fy, z]
            )
            p0 = cv2.ppf_match_3d_Pose3D()
            T0 = np.eye(4)
            T0[:3, 3] = target - anchor
            p0.updatePose(T0)
            retval, out_poses = icp.registerModelToScene(model, scene6, [p0])
            for p in out_poses:
                if best is None or p.residual < best.residual:
                    best = p
        if best is not None:
            est_poses[i] = best.pose
            est_found[i] = True
        print(f"scene {i:2d}: match sim {m.similarity:.1f}, "
              f"{len(zs)} seeds, residual {best.residual:.5f}" if best else
              f"scene {i:2d}: no viable seed", flush=True)

    gts = np.stack([s[0] for s in scene_list])
    np.savez_compressed(
        GOLDEN,
        gt_poses=gts, est_poses=est_poses, est_found=est_found,
        model=model, diameter=diameter(model[:, :3]),
    )
    adds = [add_metric(est_poses[i], gts[i], model[:, :3])
            for i in range(len(scene_list)) if est_found[i]]
    print(f"oracle: {est_found.sum()}/{len(scene_list)} found, "
          f"mean ADD {np.mean(adds)*1e3:.2f} mm -> {GOLDEN}")


# ----------------------------------------------------------------------
# our side: venv python (JAX)
# ----------------------------------------------------------------------


def run_ours(use_host=False):
    from object_detector_6d_tpu.api.pipeline import PoseDetector
    from object_detector_6d_tpu.core.config import DetectParams, ICPParams

    g = np.load(GOLDEN)
    model_pts = g["model"][:, :3]
    diam = float(g["diameter"])
    thr = 0.1 * diam

    K, dep, gray, mask, scene_list = scene_set()
    bgr = np.repeat(gray[..., None], 3, axis=2)
    # the production-tuned fused ICP schedule (fewer levels/iterations
    # than the oracle's defaults — the parity number below covers it)
    pd = PoseDetector(
        params=DetectParams(match_threshold=MATCH_THRESHOLD, max_hypotheses=8,
                            icp=ICPParams(iterations=32, num_levels=4)),
        model_points=MODEL_POINTS,
        scene_window=LIFT_WINDOW,
    )
    tid = pd.add_view("obj", dep, K, mask.astype(np.uint8) * 255, rgb=bgr)
    assert tid == 0

    rows = []
    n_both = ours_hits = orc_hits = 0
    for i, (gt, d2, g2, m2) in enumerate(scene_list):
        bgr2 = np.repeat(g2[..., None], 3, axis=2)
        detect = pd.detect if use_host else pd.detect_fused
        poses = detect(d2, K, rgb=bgr2)
        ours_add = add_metric(np.asarray(poses[0].pose), gt, model_pts) if poses else np.nan
        orc_add = (add_metric(g["est_poses"][i], gt, model_pts)
                   if g["est_found"][i] else np.nan)
        rows.append((i, ours_add, orc_add))
        if np.isfinite(ours_add) and ours_add < thr:
            ours_hits += 1
        if np.isfinite(orc_add) and orc_add < thr:
            orc_hits += 1
        n_both += 1
        print(f"scene {i:2d}: ours ADD {ours_add*1e3:7.2f} mm | "
              f"oracle ADD {orc_add*1e3:7.2f} mm", flush=True)

    n = len(rows)
    ours_adds = [r[1] for r in rows if np.isfinite(r[1])]
    orc_adds = [r[2] for r in rows if np.isfinite(r[2])]
    print(f"\nobject diameter {diam*1e3:.0f} mm, ADD-0.1d threshold {thr*1e3:.1f} mm")
    print(f"ours:   {len(ours_adds)}/{n} detected, mean ADD "
          f"{np.mean(ours_adds)*1e3:.2f} mm, ADD-0.1d {100.0*ours_hits/n:.1f}%")
    print(f"oracle: {len(orc_adds)}/{n} detected, mean ADD "
          f"{np.mean(orc_adds)*1e3:.2f} mm, ADD-0.1d {100.0*orc_hits/n:.1f}%")
    print(f"ADD-0.1d gap: {abs(ours_hits - orc_hits) * 100.0 / n:.1f}% "
          f"(north star: <= 0.5%)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ours"
    if mode == "oracle":
        run_oracle()
    elif mode == "ours":
        run_ours()
    elif mode == "ours-host":
        run_ours(use_host=True)
    else:
        raise SystemExit(f"unknown mode {mode}")
