"""Bit-parity of the ColorGradient quantizer vs the OpenCV 4.6 oracle."""

import numpy as np
import pytest

from object_detector_6d_tpu.quant.color_gradient import (
    ColorGradient,
    fast_atan2_deg,
    quantized_orientations,
)


@pytest.mark.parametrize("case", ["noise", "sphere"])
def test_quantize_bit_exact(golden, case):
    g = golden("cg_quantize")
    q, _ = quantized_orientations(g[case + "_in"])
    mism = int((np.asarray(q) != g[case + "_q"]).sum())
    assert mism == 0, f"{case}: {mism} mismatching pixels"


def test_modality_class(golden):
    g = golden("cg_quantize")
    q = np.asarray(ColorGradient().quantize(g["noise_in"]))
    assert (q == g["noise_q"]).all()


def test_fast_atan2_accuracy():
    rng = np.random.RandomState(0)
    y = rng.uniform(-100, 100, 1000).astype(np.float32)
    x = rng.uniform(-100, 100, 1000).astype(np.float32)
    a = np.asarray(fast_atan2_deg(y, x))
    ref = np.degrees(np.arctan2(y, x)) % 360.0
    err = np.abs(((a - ref) + 180) % 360 - 180)
    assert err.max() < 0.35  # cv::fastAtan2 documented accuracy ~0.3 deg
