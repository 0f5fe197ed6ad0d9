"""Counters, validation, and device timing utilities."""

import numpy as np
import pytest

from object_detector_6d_tpu.utils.metrics import PipelineCounters, validate_frame
from object_detector_6d_tpu.utils.profiling import DeviceTimer, scope


def test_counters():
    c = PipelineCounters()
    c.inc("frames")
    c.inc("matches", 3)
    for v in (80.0, 92.0, 99.0):
        c.observe("sim", v)
    snap = c.snapshot()
    assert snap["frames"] == 1 and snap["matches"] == 3
    assert snap["sim"]["n"] == 3 and snap["sim"]["max"] == 99.0
    assert isinstance(c.log_line(), str)


def test_validate_frame():
    K = np.eye(3) * 500.0
    K[2, 2] = 1.0
    validate_frame(np.zeros((4, 6), np.uint16), K)
    with pytest.raises(ValueError):
        validate_frame(np.zeros((4, 6, 1)), K)
    with pytest.raises(ValueError):
        validate_frame(np.zeros((4, 6)), np.zeros((3, 3)))
    with pytest.raises(ValueError):
        validate_frame(np.zeros((4, 6)), K, rgb=np.zeros((5, 6, 3)))


def test_device_timer():
    import jax.numpy as jnp

    def f(x):
        with scope("test/double"):
            return x * 2

    t = DeviceTimer(f)
    stats = t.measure(jnp.ones((32, 32)), iters=3, batch=4)
    assert stats["ms_per_call"] > 0
    assert stats["items_per_sec"] > 0
