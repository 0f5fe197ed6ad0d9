"""End-to-end detect(): recover a known object translation (config 1)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

from object_detector_6d_tpu.api.pipeline import PoseDetector
from object_detector_6d_tpu.core.config import DetectParams, ICPParams


def _bgr(gray):
    return np.repeat(gray[..., None], 3, axis=2)


def _make_detector():
    return PoseDetector(
        params=DetectParams(
            match_threshold=70.0,
            max_hypotheses=4,
            icp=ICPParams(iterations=60, num_levels=3),
        )
    )


def test_detect_recovers_translation():
    det = _make_detector()
    K = scenes.K_DEFAULT
    dep, gray, mask = scenes.snowman_scene()
    tid = det.add_view("obj", dep, K, mask.astype(np.uint8) * 255, rgb=_bgr(gray))
    assert tid == 0

    # scene: object rigidly translated by a known 3D offset
    t_true = np.array([0.055, -0.022, -0.04])
    dep2, _, gray2 = scenes.render_translated(dep, mask, K, t_true)
    poses = det.detect(dep2, K, rgb=_bgr(gray2))
    assert poses, "no detections"
    best = poses[0]
    assert best.class_id == "obj"
    t = best.pose[:3, 3]
    assert abs(t[2] - t_true[2]) < 0.01, f"z shift {t[2]}"
    assert abs(t[0] - t_true[0]) < 0.01, f"x shift {t[0]} vs {t_true[0]}"
    assert abs(t[1] - t_true[1]) < 0.01, f"y shift {t[1]} vs {t_true[1]}"
    ang = np.degrees(np.arccos(np.clip((np.trace(best.pose[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < 5.0, f"rotation {ang} deg"
    assert best.residual < 5e-3


def test_detect_empty_scene():
    det = _make_detector()
    K = scenes.K_DEFAULT
    dep, gray, mask = scenes.snowman_scene()
    det.add_view("obj", dep, K, mask.astype(np.uint8) * 255, rgb=_bgr(gray))
    flat_dep = np.full((480, 640), 1500, np.uint16)
    flat_rgb = np.full((480, 640, 3), 128, np.uint8)
    assert det.detect(flat_dep, K, rgb=flat_rgb) == []


def test_detect_two_instances_nms():
    """Two identical objects in one frame -> two clustered detections."""
    det = _make_detector()
    K = scenes.K_DEFAULT
    dep, gray, mask = scenes.snowman_scene()
    det.add_view("obj", dep, K, mask.astype(np.uint8) * 255, rgb=_bgr(gray))

    d1, g1, m1 = scenes.snowman_scene(cx=220, cy=200)
    d2, g2, m2 = scenes.snowman_scene(cx=470, cy=300, depth_off_mm=-30)
    dep2 = np.where(m2, d2, d1).astype(np.uint16)
    gray2 = np.where(m2, g2, g1).astype(np.uint8)
    poses = det.detect(dep2, K, rgb=_bgr(gray2), match_threshold=65.0)
    assert len(poses) >= 2, f"expected 2 detections, got {len(poses)}"
    xs = sorted(p.match_x for p in poses[:2])
    assert xs[1] - xs[0] > 100  # two distinct locations
