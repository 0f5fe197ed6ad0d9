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


def test_checked_catches_nan():
    """utils/debug checkify wrapper: NaN-producing primitive raises."""
    import jax.numpy as jnp

    from object_detector_6d_tpu.utils.debug import checked

    def bad(x):
        return jnp.log(x)  # log(-1) -> NaN

    import pytest

    with pytest.raises(Exception, match="nan"):
        checked(bad, checks=("nan",))(jnp.float32(-1.0))
    # clean input passes through unchanged
    out = checked(bad, checks=("nan",))(jnp.float32(1.0))
    assert float(out) == 0.0


def test_nan_watch_reports_only_when_enabled(capfd):
    import jax
    import jax.numpy as jnp

    from object_detector_6d_tpu.utils import debug

    # separate functions: jax.jit caches per function identity, so the
    # trace-time enable flag is baked into each compiled executable
    def prog_off(x):
        return debug.nan_watch(x * jnp.float32(jnp.nan), "t")

    def prog_on(x):
        return debug.nan_watch(x * jnp.float32(jnp.nan), "t")

    debug.enable(False)
    jax.jit(prog_off)(jnp.ones(4)).block_until_ready()
    jax.effects_barrier()
    assert "nan_watch" not in capfd.readouterr().out

    debug.enable(True)
    try:
        jax.jit(prog_on)(jnp.ones(4)).block_until_ready()
        jax.effects_barrier()
        assert "nan_watch" in capfd.readouterr().out
    finally:
        debug.enable(False)
