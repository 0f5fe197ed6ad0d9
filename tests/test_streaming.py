"""Streaming multi-camera detection (config 5 correctness)."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

from object_detector_6d_tpu.api.pipeline import PoseDetector
from object_detector_6d_tpu.api.streaming import StreamingDetector
from object_detector_6d_tpu.core.config import DetectParams, ICPParams


def test_four_camera_tick():
    det = PoseDetector(
        params=DetectParams(
            match_threshold=65.0,
            max_hypotheses=4,
            icp=ICPParams(iterations=45, num_levels=3),
        )
    )
    K = scenes.K_DEFAULT
    dep, gray, mask = scenes.snowman_scene()
    det.add_view("obj", dep, K, mask.astype(np.uint8) * 255,
                 rgb=np.repeat(gray[..., None], 3, 2))

    ts = [
        np.array([0.03, -0.01, -0.02]),
        np.array([-0.04, 0.02, 0.03]),
        None,  # empty camera
        np.array([0.01, 0.03, -0.04]),
    ]
    depths, rgbs = [], []
    for t in ts:
        if t is None:
            depths.append(np.full((480, 640), 1500, np.uint16))
            rgbs.append(np.full((480, 640, 3), 128, np.uint8))
        else:
            d2, _, g2 = scenes.render_translated(dep, mask, K, t)
            depths.append(d2)
            rgbs.append(np.repeat(g2[..., None], 3, 2))
    stream = StreamingDetector(det, n_cameras=4)
    results = stream.process(np.stack(depths), K, np.stack(rgbs))
    assert len(results) == 4
    assert results[2] == []  # empty camera yields nothing, doesn't stall
    for cam, t in enumerate(ts):
        if t is None:
            continue
        assert results[cam], f"camera {cam} missed detection"
        best = results[cam][0]
        err = np.abs(best.pose[:3, 3] - t).max()
        assert err < 0.012, f"camera {cam}: t err {err}"
