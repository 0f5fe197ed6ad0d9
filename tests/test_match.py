"""End-to-end Detector.match parity vs the oracle.

Templates are imported from the oracle's dump (add_synthetic_template) so
this isolates the matcher; add_template itself is covered by
tests/test_features.py. Scores must agree to float32 round-off; positions
and IDs exactly.

Known deviation: the oracle's flat linear-memory loop writes wrap-around
garbage at out-of-span anchors (linemod.cpp similarity()); we mask those
to 0. None of the golden scenes trigger it.
"""

import numpy as np
import pytest

from object_detector_6d_tpu.api.detector import Detector, Match
from object_detector_6d_tpu.quant.features import Feature, Template

CLASSES = ["sphA", "sphB"]


def _build_detector(g) -> Detector:
    det = Detector()
    for cid in CLASSES:
        tp = []
        for i in range(4):
            feats = g[f"{cid}_feat{i}"]
            w, h, lvl = g[f"{cid}_meta{i}"]
            tp.append(
                Template(int(w), int(h), int(lvl), [Feature(int(x), int(y), int(l)) for x, y, l in feats])
            )
        det.add_synthetic_template(tp, cid)
    return det


def _compare(matches, expected):
    got = np.array(
        [(m.x, m.y, m.similarity, CLASSES.index(m.class_id), m.template_id) for m in matches],
        np.float64,
    ).reshape(-1, 5)
    assert got.shape == expected.shape, f"count {got.shape[0]} vs {expected.shape[0]}\n{got}\n{expected}"
    np.testing.assert_array_equal(got[:, [0, 1, 3, 4]], expected[:, [0, 1, 3, 4]])
    np.testing.assert_allclose(got[:, 2], expected[:, 2], atol=1e-3)


@pytest.mark.parametrize(
    "scene,thresh",
    [("sceneA", 80.0), ("sceneS", 80.0), ("scene2", 70.0), ("scene0", 50.0)],
)
def test_match_parity(golden, scene, thresh):
    g = golden("match_e2e")
    det = _build_detector(g)
    matches = det.match([g[f"{scene}_bgr"], g[f"{scene}_dep"]], thresh)
    _compare(matches, g[f"{scene}_matches"])


def test_exact_topk_equals_lax():
    """exact_topk (k iterative argmax passes, the coarse stage's default)
    must reproduce jax.lax.top_k exactly — values AND indices, including
    the lower-index-first tie rule and all-(-1) masked tails."""
    import jax
    import jax.numpy as jnp

    from object_detector_6d_tpu.match.program import exact_topk

    rng = np.random.RandomState(0)
    cases = [
        rng.randint(-1, 500, 4096),              # generic
        np.full(4096, -1),                       # nothing above threshold
        np.repeat(rng.randint(-1, 8, 512), 8),   # heavy ties
        np.concatenate([np.full(4090, -1), [7, 7, 7, 3, 3, 9]]),
    ]
    for arr in cases:
        x = jnp.asarray(arr.astype(np.int32))
        for k in (1, 16, 32):
            want_v, want_i = jax.lax.top_k(x, k)
            got_v, got_i = exact_topk(x, k)
            np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
            np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
