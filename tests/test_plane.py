"""Plane extraction on synthetic multi-plane scenes."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

from object_detector_6d_tpu.geom.backproject import depth_to_3d
from object_detector_6d_tpu.geom.plane import extract_planes


def test_single_plane_scene():
    K = scenes.K_DEFAULT
    dep = np.full((480, 640), 1500, np.uint16)
    pts = np.asarray(depth_to_3d(dep, K))
    res = extract_planes(pts)
    assert len(res.coefficients) >= 1
    n, d = res.coefficients[0, :3], res.coefficients[0, 3]
    # plane z = 1.5: normal +-(0,0,1), camera-oriented -> n_z < 0
    assert abs(n[2]) > 0.999
    assert n[2] < 0
    assert abs(abs(d) - 1.5) < 0.01
    # nearly all pixels assigned to plane 0
    assert (res.labels == 0).mean() > 0.95


def test_two_planes_and_object():
    K = scenes.K_DEFAULT
    dep, _, mask = scenes.snowman_scene()  # bg plane 1.5 m + object
    # add a second slanted plane strip on the left
    yy, xx = np.mgrid[0:480, 0:640]
    slant = (1200 + 0.8 * yy).astype(np.uint16)
    dep = dep.copy()
    strip = xx < 120
    dep[strip] = slant[strip]
    pts = np.asarray(depth_to_3d(dep, K))
    res = extract_planes(pts)
    assert len(res.coefficients) >= 2
    # background label should dominate outside the object/strip
    bg_region = (~mask) & (xx >= 160)
    labels_bg = res.labels[bg_region]
    main = np.bincount(labels_bg[labels_bg != 255], minlength=1).argmax()
    assert (labels_bg == main).mean() > 0.9
    # the object's bulge should mostly NOT be assigned to the bg plane
    obj = mask & (dep < 1400)
    assert (res.labels[obj] == main).mean() < 0.2
