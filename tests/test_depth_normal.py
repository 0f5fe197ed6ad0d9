"""Bit-parity of the DepthNormal quantizer vs the OpenCV 4.6 oracle."""

import numpy as np
import pytest

from object_detector_6d_tpu.quant.depth_normal import DepthNormal, quantized_normals

CASES = ["rand", "rand2", "sphere640", "holes", "far", "ramp0", "ramp37", "ramp101", "ramp215", "ramp303"]


@pytest.mark.parametrize("case", CASES)
def test_quantize_bit_exact(golden, case):
    g = golden("dn_quantize")
    q = np.asarray(quantized_normals(g[case + "_in"]))
    expected = g[case + "_q"]
    mismatches = int((q != expected).sum())
    assert mismatches == 0, f"{case}: {mismatches} mismatching pixels"


def test_modality_class(golden):
    g = golden("dn_quantize")
    dn = DepthNormal()
    q = np.asarray(dn.quantize(g["rand_in"]))
    assert (q == g["rand_q"]).all()


def test_values_are_one_hot(golden):
    g = golden("dn_quantize")
    q = np.asarray(quantized_normals(g["rand2_in"]))
    assert set(np.unique(q)) <= {0, 1, 2, 4, 8, 16, 32, 64, 128}
