"""Rotation-exercising end-to-end detection with a multi-view bank.

The whole point of a LINEMOD template bank (linemod.hpp:351,
addSyntheticTemplate workflow) is detecting an object seen from a
viewpoint it was NOT trained at: the matcher picks the nearest trained
view, the hypothesis lift composes that view's pose, and ICP absorbs
the residual rotation. This is the first test that would catch a broken
rotation lift — every other e2e test translates a single trained view.

Trains a view arc with train_from_model (api/templates.py) on the
object-frame snowman model (exact analytic normals), then detects the
object at in-between orientations and checks ADD against the full 6D
ground truth.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

# multi-minute on a 1-core host: trains a 5-view arc, then runs the full
# CPU ICP schedule per detection (core parity suite: -m "not slow")
pytestmark = pytest.mark.slow

from object_detector_6d_tpu.api.pipeline import PoseDetector
from object_detector_6d_tpu.api.templates import render_view, train_from_model
from object_detector_6d_tpu.core.config import DetectParams, ICPParams


def _view_pose(deg, z=1.05, axis=(0.0, 1.0, 0.0)):
    """Model -> camera: rotate about the model origin, push to depth z."""
    pose = scenes.rot_about(np.asarray(axis), deg, np.zeros(3))
    pose[:3, 3] += np.array([0.0, 0.0, z])
    return pose


def _add(T_est, T_gt, pts):
    a = pts @ T_est[:3, :3].T + T_est[:3, 3]
    b = pts @ T_gt[:3, :3].T + T_gt[:3, 3]
    return float(np.linalg.norm(a - b, axis=-1).mean())


def test_detect_unseen_orientation():
    model6 = scenes.snowman_model()
    pts = model6[:, :3]
    diam = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    K = scenes.K_DEFAULT
    pd = PoseDetector(
        params=DetectParams(
            match_threshold=60.0,
            max_hypotheses=8,
            icp=ICPParams(iterations=100, num_levels=4),
        )
    )

    # view arc: -24..24 deg about y through the model origin
    train_degs = (-24.0, -12.0, 0.0, 12.0, 24.0)
    tids = train_from_model(
        pd, "snow", model6, K, [_view_pose(d) for d in train_degs]
    )
    assert all(t >= 0 for t in tids), f"view training failed: {tids}"

    # test at orientations BETWEEN the trained views, offset in 3D
    for deg, t_off in ((6.0, (0.05, -0.03, 0.04)), (-18.5, (-0.04, 0.02, -0.03))):
        gt = _view_pose(deg)
        gt[:3, 3] += np.asarray(t_off)
        depth, mask, gray = render_view(model6, K, gt, bg_mm=1500)
        rgb = np.repeat(gray[..., None], 3, axis=2)
        poses = pd.detect_fused(depth, K, rgb=rgb)
        assert poses, f"no detection at {deg} deg"
        best = poses[0]
        add = _add(np.asarray(best.pose), gt, pts)
        assert add < 0.1 * diam, (
            f"{deg} deg: ADD {add*1e3:.1f} mm > 0.1d {0.1*diam*1e3:.1f} mm"
        )
        # the matcher must have picked a nearby trained view, not just any
        picked = train_degs[best.template_id]
        assert abs(picked - deg) <= 13.0, (
            f"{deg} deg matched template at {picked} deg"
        )
