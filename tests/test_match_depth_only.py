"""Depth-only detector parity (the north star's primary configuration:
a single DepthNormal modality, no RGB required)."""

import numpy as np
import pytest

from object_detector_6d_tpu.api.detector import Detector
from object_detector_6d_tpu.quant.features import Feature, Template

CLASSES = ["A", "B"]


def _build(g) -> Detector:
    det = Detector(modalities=("DepthNormal",))
    for cid in CLASSES:
        tp = []
        for i in range(2):  # one modality x two levels
            feats = g[f"{cid}_feat{i}"]
            w, h, lvl = g[f"{cid}_meta{i}"]
            tp.append(
                Template(int(w), int(h), int(lvl),
                         [Feature(int(x), int(y), int(l)) for x, y, l in feats])
            )
        det.add_synthetic_template(tp, cid)
    return det


@pytest.mark.parametrize("scene,thresh", [("sceneA", 80.0), ("sceneS", 70.0)])
def test_depth_only_match_parity(golden, scene, thresh):
    g = golden("match_dnonly")
    det = _build(g)
    matches = det.match([g[f"{scene}_dep"]], thresh)
    got = np.array(
        [(m.x, m.y, m.similarity, CLASSES.index(m.class_id), m.template_id) for m in matches],
        np.float64,
    ).reshape(-1, 5)
    expected = g[f"{scene}_matches"]
    # compare as SETS: with similarity ties the oracle's unstable
    # sort + adjacent-unique can leave non-adjacent duplicates in its
    # own output (observed: a match emitted twice); our dedup is
    # set-based (PARITY.md deviation 9)
    def to_set(arr):
        return {tuple(np.round(r, 3)) for r in arr}

    assert to_set(got) == to_set(expected), f"{got}\nvs\n{expected}"


def test_depth_only_extraction_parity(golden):
    """add_template with only a depth source reproduces oracle features."""
    import pathlib, sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import scenes

    g = golden("match_dnonly")
    det = Detector(modalities=("DepthNormal",))
    dep, _, mask = scenes.sphere_scene(checker_px=16)
    tid, bbox = det.add_template([dep], "A", mask.astype(np.uint8) * 255)
    assert tid == 0
    assert tuple(bbox) == (246, 166, 168, 168)
    for i, t in enumerate(det.class_templates["A"][0]):
        np.testing.assert_array_equal(t.feature_array(), g[f"A_feat{i}"])
