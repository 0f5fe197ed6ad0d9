"""Odometry: recover a known camera motion between two synthetic frames."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

from object_detector_6d_tpu.core.se3 import SE3
from object_detector_6d_tpu.odometry.odometry import (
    FastICPOdometry,
    ICPOdometry,
    OdometryFrame,
    RgbdICPOdometry,
    RgbdOdometry,
)


def _frame_pair(t=np.array([0.01, -0.006, 0.008])):
    """Two frames of a static scene seen from cameras offset by t.

    Moving the CAMERA by t == moving the world by -t: render the scene
    translated by -t; the odometry src->dst transform should be ~[-t].
    """
    K = scenes.K_DEFAULT
    dep1, gray1, mask = scenes.snowman_scene()
    dep2, _, gray2 = scenes.render_translated(dep1, mask | True, K, -t, bg_mm=0)
    # bg_mm=0: everything rendered from frame 1 pixels; holes stay 0
    return K, dep1, gray1, dep2, gray2


@pytest.mark.parametrize("factory", [ICPOdometry, FastICPOdometry])
def test_icp_odometry_recovers_motion(factory):
    t = np.array([0.012, -0.007, 0.009])
    K, dep1, gray1, dep2, gray2 = _frame_pair(t)
    src = OdometryFrame.create(dep1, K, levels=3)
    dst = OdometryFrame.create(dep2, K, levels=3)
    ok, Rt = factory().compute(src, dst)
    assert ok
    err_t = np.abs(Rt[:3, 3] - (-t))
    assert err_t.max() < 0.004, f"t err {Rt[:3, 3]} vs {-t}"
    ang = np.degrees(np.arccos(np.clip((np.trace(Rt[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"rotation {ang}"


def test_rgbd_odometry_recovers_motion():
    t = np.array([0.008, -0.004, 0.006])
    K = scenes.K_DEFAULT
    dep1, _, mask = scenes.snowman_scene()
    yy, xx = np.mgrid[0:480, 0:640]
    gray1 = (127 + 90 * np.sin(xx / 17.0) * np.cos(yy / 23.0)).astype(np.uint8)
    dep2, _, gray2 = scenes.render_translated(
        dep1, mask | True, K, -t, bg_mm=0, smooth_texture=True
    )
    src = OdometryFrame.create(dep1, K, image=np.repeat(gray1[..., None], 3, 2), levels=3)
    dst = OdometryFrame.create(dep2, K, image=np.repeat(gray2[..., None], 3, 2), levels=3)
    ok, Rt = RgbdICPOdometry().compute(src, dst)
    assert ok
    err_t = np.abs(Rt[:3, 3] - (-t))
    assert err_t.max() < 0.004, f"t err {Rt[:3, 3]} vs {-t}"


def test_identity_motion():
    K = scenes.K_DEFAULT
    dep1, _, _ = scenes.snowman_scene()
    src = OdometryFrame.create(dep1, K, levels=3)
    ok, Rt = ICPOdometry().compute(src, src)
    assert ok
    np.testing.assert_allclose(Rt, np.eye(4), atol=2e-3)
