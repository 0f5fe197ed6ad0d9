"""register_depth / warp_frame invariants + eval metric sanity."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

from object_detector_6d_tpu.core.se3 import SE3
from object_detector_6d_tpu.eval.add_metric import (
    add_accuracy,
    add_distance,
    adds_distance,
    model_diameter,
)
from object_detector_6d_tpu.geom.registration import register_depth, warp_frame


def test_register_identity_roundtrip():
    K = scenes.K_DEFAULT
    dep, _, _ = scenes.snowman_scene()
    out = np.asarray(register_depth(dep, K, K, np.eye(4), (480, 640)))
    ref = dep.astype(np.float32) / 1000.0
    m = np.isfinite(out)
    assert m.mean() > 0.99
    np.testing.assert_allclose(out[m], ref[m], atol=1e-3)


def test_warp_frame_known_translation():
    K = scenes.K_DEFAULT
    dep, _, mask = scenes.snowman_scene()
    t = np.array([0.03, -0.01, -0.02], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = t
    warped = np.asarray(warp_frame(dep, K, T))
    # compare against the splat renderer's ground truth
    ref_dep, ref_mask, _ = scenes.render_translated(dep, mask, K, t)
    # on pixels where both observed the moved object
    both = ref_mask & np.isfinite(warped)
    frac = both.sum() / max(ref_mask.sum(), 1)
    assert frac > 0.8
    diff = np.abs(warped[both] - ref_dep[both].astype(np.float32) / 1000.0)
    assert np.median(diff) < 2e-3


def test_add_metrics():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.05, 0.05, (256, 3)).astype(np.float32)
    gt = np.asarray(SE3.exp(np.array([0.1, -0.2, 0.3, 0.01, 0.02, 0.03], np.float32)))
    # small perturbation
    est = np.asarray(
        SE3.compose(SE3.exp(np.array([0.01, 0, 0, 0.002, 0, 0], np.float32)), gt)
    )
    d = float(add_distance(est, gt, pts))
    assert 0 < d < 0.01
    ds = float(adds_distance(est, gt, pts))
    assert ds <= d + 1e-6
    dia = model_diameter(pts)
    assert 0.1 < dia < 0.2
    acc = add_accuracy(np.stack([est, gt]), np.stack([gt, gt]), pts)
    assert acc == 1.0  # both within 0.1d
    far = gt.copy()
    far[:3, 3] += 0.5
    acc2 = add_accuracy(np.stack([far, gt]), np.stack([gt, gt]), pts)
    assert acc2 == 0.5
