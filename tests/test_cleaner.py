"""DepthCleaner (NIL) parity vs oracle: interior within sensor noise."""

import numpy as np
import pytest

from object_detector_6d_tpu.geom.cleaner import clean_depth


@pytest.mark.parametrize("case", ["rand", "snow", "holes"])
def test_nil_cleaner_interior_parity(golden, case):
    g = golden("cleaner")
    mine = np.asarray(clean_depth(g[case + "_in"]))
    oracle = g[case + "_q"].astype(int)
    # interior only: the oracle zeroes scattered border pixels
    d = np.abs(mine.astype(int) - oracle)[3:-3, 3:-3]
    # exclude oracle-invalid (0) pixels (holes case)
    m = oracle[3:-3, 3:-3] > 0
    assert d[m].mean() < 2.0, f"mean |diff| {d[m].mean():.2f} mm"
    assert d[m].max() <= 5, f"max |diff| {d[m].max()} mm"


def test_holes_preserved(golden):
    g = golden("cleaner")
    mine = np.asarray(clean_depth(g["holes_in"]))
    assert (mine[42:48, 62:78] == 0).all()


def test_float_input():
    rng = np.random.RandomState(1)
    z = (1.2 + rng.uniform(-0.01, 0.01, (32, 32))).astype(np.float32)
    out = np.asarray(clean_depth(z))
    assert out.dtype == np.float32
    # smoothing reduces local variance
    assert np.var(np.diff(out, axis=0)) < np.var(np.diff(z, axis=0))
