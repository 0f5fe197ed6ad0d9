"""Train-from-model: render views of an object model, detect at a novel
pose, and recover the model->camera transform (BOP-style)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

from object_detector_6d_tpu.api.pipeline import PoseDetector
from object_detector_6d_tpu.api.templates import render_view, train_from_model
from object_detector_6d_tpu.core.config import DetectParams, ICPParams
from object_detector_6d_tpu.core.se3 import SE3
from object_detector_6d_tpu.geom.backproject import depth_to_3d
from object_detector_6d_tpu.geom.normals import normals_fals


def _object_model():
    """Dense model cloud (object frame) from the analytic snowman view."""
    K = scenes.K_DEFAULT
    dep, _, mask = scenes.snowman_scene()
    cloud = np.asarray(depth_to_3d(dep, K))
    nrm = np.asarray(normals_fals(cloud, K))
    ok = mask & np.isfinite(cloud).all(-1) & np.isfinite(nrm).all(-1)
    pts = cloud[ok]
    ns = nrm[ok]
    center = pts.mean(0)
    pts = pts - center  # object frame: centered
    return np.concatenate([pts, ns], -1).astype(np.float32), center


def _pose(t, w=(0, 0, 0)):
    T = np.asarray(SE3.exp(np.array([*w, 0, 0, 0], np.float32)), np.float64)
    T[:3, 3] = t
    return T


def test_render_view_roundtrip():
    model, center = _object_model()
    K = scenes.K_DEFAULT
    T = _pose(center)
    depth, mask, gray = render_view(model, K, T, bg_mm=1500)
    dep_ref, _, mask_ref = scenes.snowman_scene()
    overlap = (mask & mask_ref).sum() / mask_ref.sum()
    assert overlap > 0.97
    d = np.abs(depth[mask & mask_ref].astype(int) - dep_ref[mask & mask_ref].astype(int))
    assert np.median(d) <= 1.0


def test_train_from_model_and_detect():
    model, center = _object_model()
    K = scenes.K_DEFAULT
    det = PoseDetector(
        params=DetectParams(
            match_threshold=65.0,
            max_hypotheses=4,
            icp=ICPParams(iterations=60, num_levels=3),
        )
    )
    views = [
        _pose(center),
        _pose(center, w=(0.10, 0, 0)),
        _pose(center, w=(0, 0.10, 0)),
    ]
    tids = train_from_model(det, "obj", model, K, views)
    assert all(t >= 0 for t in tids), tids

    # novel scene: translated + slightly rotated object
    T_gt = _pose(center + np.array([0.05, -0.02, -0.03]), w=(0.05, 0.02, 0))
    depth, mask, gray = render_view(model, K, T_gt, bg_mm=1500)
    poses = det.detect(depth, K, rgb=np.repeat(gray[..., None], 3, 2))
    assert poses, "no detections"
    best = poses[0].pose
    # model->camera pose error vs ground truth (ADD-style point error)
    pts = model[::7, :3]
    d = np.linalg.norm(
        pts @ best[:3, :3].T + best[:3, 3] - (pts @ T_gt[:3, :3].T + T_gt[:3, 3]),
        axis=-1,
    ).mean()
    assert d < 0.012, f"mean model-point error {d:.4f} m"
