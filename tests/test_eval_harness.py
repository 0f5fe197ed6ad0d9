"""End-to-end eval: synthetic BOP scene -> detect -> ADD-0.1d == 1.0.

This is the config-1/2 scenario test: train on one view, evaluate over a
small scene with known ground-truth translations.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

from object_detector_6d_tpu.api.pipeline import PoseDetector
from object_detector_6d_tpu.core.config import DetectParams, ICPParams
from object_detector_6d_tpu.data.bop import BopScene, make_synthetic_bop_scene
from object_detector_6d_tpu.eval.harness import evaluate_scene


@pytest.fixture(scope="module")
def synthetic_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("bop_scene")
    make_synthetic_bop_scene(str(d), n_frames=3, obj_id=1, seed=0)
    return str(d)


def test_loader(synthetic_scene):
    scene = BopScene(synthetic_scene)
    ids = scene.im_ids()
    assert len(ids) == 3
    f = scene.frame(ids[0])
    assert f.depth_u16.shape == (480, 640)
    assert f.rgb is not None and f.rgb.shape == (480, 640, 3)
    assert len(f.gt) == 1 and f.gt[0].obj_id == 1
    # full SE(3) ground truth: proper rotation + bounded translation
    # (rotation about the ~1.2 m-away centroid puts up to ~0.25 m into
    # the translation column)
    R = f.gt[0].pose[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.abs(f.gt[0].t).max() < 0.4


def test_add_accuracy_on_synthetic_scene(synthetic_scene):
    det = PoseDetector(
        params=DetectParams(
            match_threshold=65.0,
            max_hypotheses=4,
            icp=ICPParams(iterations=60, num_levels=3),
        )
    )
    K = scenes.K_DEFAULT
    dep, gray, mask = scenes.snowman_scene()
    bgr = np.repeat(gray[..., None], 3, 2)
    tid = det.add_view("obj1", dep, K, mask.astype(np.uint8) * 255, rgb=bgr)
    assert tid == 0
    # model points for ADD: the registered view cloud (identity view pose)
    model_pts = det.views[("obj1", 0)].model_cloud[:, :3]

    scene = BopScene(synthetic_scene)
    res = evaluate_scene(
        det,
        scene,
        obj_to_class={1: "obj1"},
        model_points={1: model_pts},
    )
    assert res.n_frames == 3
    assert res.n_gt == 3
    assert res.n_detected == 3, f"missed detections: {res}"
    assert res.add_accuracy == 1.0, f"ADD-0.1d {res.add_accuracy}, mean ADD {res.mean_add}"
    assert res.mean_add < 0.01
