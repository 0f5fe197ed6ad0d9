"""End-to-end ADD parity regression vs the checked-in oracle golden.

tools/parity_add.py produced the north-star number (20-scene set, ours
100% ADD-0.1d vs oracle 100%, gap 0.0% — PARITY.md); its oracle side is
checked in as tests/golden/parity_add_oracle.npz. This test re-runs the
production ``detect_fused`` path on a deterministic subset of those
scenes and asserts ADD against the golden, so the headline parity
number cannot regress unnoticed between full parity runs (VERDICT
round-2 weak item 7).
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

SCENE_SUBSET = [0, 7, 13]  # rotation-heavy picks from the 20-scene set


def test_detect_fused_add_vs_oracle_golden(golden):
    import parity_add

    g = golden("parity_add_oracle")
    model_pts = g["model"][:, :3]
    diam = float(g["diameter"])
    thr_01d = 0.1 * diam

    from object_detector_6d_tpu.api.pipeline import PoseDetector
    from object_detector_6d_tpu.core.config import DetectParams, ICPParams

    K, dep, gray, mask, scene_list = parity_add.scene_set()
    bgr = np.repeat(gray[..., None], 3, axis=2)
    pd = PoseDetector(
        params=DetectParams(
            match_threshold=parity_add.MATCH_THRESHOLD, max_hypotheses=8,
            icp=ICPParams(iterations=32, num_levels=4),
        ),
        model_points=parity_add.MODEL_POINTS,
        scene_window=parity_add.LIFT_WINDOW,
    )
    assert pd.add_view("obj", dep, K, mask.astype(np.uint8) * 255, rgb=bgr) == 0

    for i in SCENE_SUBSET:
        gt, d2, g2, m2 = scene_list[i]
        poses = pd.detect_fused(d2, K, rgb=np.repeat(g2[..., None], 3, axis=2))
        assert poses, f"scene {i}: no detection"
        ours_add = parity_add.add_metric(np.asarray(poses[0].pose), gt, model_pts)
        # north-star gate: ADD-0.1d success on every subset scene
        assert ours_add < thr_01d, f"scene {i}: ADD {ours_add*1e3:.2f} mm"
        # regression gate: the full-set mean was 0.39 mm (oracle 0.44 mm);
        # 2 mm leaves headroom for schedule tweaks while still catching
        # any real accuracy break an order of magnitude before 0.1d
        assert ours_add < 2e-3, f"scene {i}: ADD {ours_add*1e3:.2f} mm > 2 mm"
        if g["est_found"][i]:
            orc_add = parity_add.add_metric(g["est_poses"][i], gt, model_pts)
            assert ours_add < max(2.0 * orc_add, 1.5e-3), (
                f"scene {i}: ours {ours_add*1e3:.2f} mm vs oracle "
                f"{orc_add*1e3:.2f} mm"
            )
