"""Two object CLASSES in one frame (config 2/4 style): the fused
single-call program must detect both with the right class labels and
poses — exercises bank class separation, per-class NMS, and the
per-template view lift in one scene."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

from object_detector_6d_tpu.api.pipeline import PoseDetector
from object_detector_6d_tpu.core.config import DetectParams, ICPParams


def _bgr(gray):
    return np.repeat(gray[..., None], 3, axis=2)


def test_two_classes_one_frame():
    det = PoseDetector(
        params=DetectParams(
            match_threshold=60.0,
            max_hypotheses=8,
            icp=ICPParams(iterations=32, num_levels=4),
        )
    )
    K = scenes.K_DEFAULT

    # class "big": the full-size snowman; class "small": a 0.65-scale
    # variant — different template footprints and model clouds
    dep_a, gray_a, mask_a = scenes.snowman_scene(cx=240, cy=220)
    dep_b, gray_b, mask_b = scenes.snowman_scene(cx=430, cy=290, scale=0.65,
                                                 depth_off_mm=-40)
    assert det.add_view("big", dep_a, K, mask_a.astype(np.uint8) * 255,
                        rgb=_bgr(gray_a)) == 0
    assert det.add_view("small", dep_b, K, mask_b.astype(np.uint8) * 255,
                        rgb=_bgr(gray_b)) == 0

    # scene: both objects rigidly translated by different offsets,
    # composited by nearest-depth
    t_a = np.array([0.05, -0.02, -0.03])
    t_b = np.array([-0.04, 0.03, 0.02])
    d_a, m_a, g_a = scenes.render_translated(dep_a, mask_a, K, t_a)
    d_b, m_b, g_b = scenes.render_translated(dep_b, mask_b, K, t_b)
    dep = np.where(m_b & (~m_a | (d_b < d_a)), d_b, d_a).astype(np.uint16)
    gray = np.where(m_b & (~m_a | (d_b < d_a)), g_b, g_a).astype(np.uint8)

    poses = det.detect_fused(dep, K, rgb=_bgr(gray))
    by_class = {}
    for p in poses:
        by_class.setdefault(p.class_id, []).append(p)
    assert "big" in by_class, f"big missed ({[p.class_id for p in poses]})"
    assert "small" in by_class, f"small missed ({[p.class_id for p in poses]})"
    for cid, t_true in (("big", t_a), ("small", t_b)):
        best = by_class[cid][0]
        err = np.abs(best.pose[:3, 3] - t_true)
        assert err.max() < 0.012, f"{cid}: t err {best.pose[:3, 3]} vs {t_true}"
