"""Multi-template-bank match parity at low thresholds (stresses the coarse
raw-threshold rule, refinement windows, sort and dedup)."""

import numpy as np
import pytest

from object_detector_6d_tpu.api.detector import Detector
from object_detector_6d_tpu.quant.features import Feature, Template

CLASSES = ["sphA", "sphB"]


def _build(g) -> Detector:
    det = Detector()
    for cid in CLASSES:
        n = int(g[cid + "_ntempl"][0])
        for tid in range(n):
            tp = []
            for i in range(4):
                feats = g[f"{cid}_t{tid}_feat{i}"]
                w, h, lvl = g[f"{cid}_t{tid}_meta{i}"]
                tp.append(
                    Template(
                        int(w), int(h), int(lvl),
                        [Feature(int(x), int(y), int(l)) for x, y, l in feats],
                    )
                )
            det.add_synthetic_template(tp, cid)
    return det


@pytest.mark.parametrize(
    "scene,key,thresh",
    [
        ("sceneA", "bank_sceneA_t60", 60.0),
        ("sceneA", "bank_sceneA_t80", 80.0),
        ("sceneS", "bank_sceneS_t70", 70.0),
        ("scene2", "bank_scene2_t55", 55.0),
    ],
)
def test_bank_parity(golden, scene, key, thresh):
    g = golden("match_bank")
    det = _build(g)
    matches = det.match([g[f"{scene}_bgr"], g[f"{scene}_dep"]], thresh)
    got = np.array(
        [(m.x, m.y, m.similarity, CLASSES.index(m.class_id), m.template_id) for m in matches],
        np.float64,
    ).reshape(-1, 5)
    expected = g[key]
    assert got.shape == expected.shape, f"{got}\nvs\n{expected}"
    np.testing.assert_array_equal(got[:, [0, 1, 3, 4]], expected[:, [0, 1, 3, 4]])
    np.testing.assert_allclose(got[:, 2], expected[:, 2], atol=1e-3)
