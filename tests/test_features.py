"""Template extraction parity vs the oracle's addTemplate on the sphere."""

import numpy as np
import pytest

from object_detector_6d_tpu.quant.features import crop_templates
from object_detector_6d_tpu.quant.pyramid import (
    ColorGradientPyramid,
    DepthNormalPyramid,
    pyr_down_u8,
)


def _build_templates(g):
    cg = ColorGradientPyramid(g["bgr"], levels=2, mask=g["mask"])
    dn = DepthNormalPyramid(g["dep"], levels=2, mask=g["mask"])
    # interleaved (CG L0, DN L0, CG L1, DN L1), then common crop
    tmpls = []
    for lvl in range(2):
        tmpls.append(cg.extract_template(lvl))
        tmpls.append(dn.extract_template(lvl))
    assert all(t is not None for t in tmpls)
    bbox = crop_templates(tmpls)
    return tmpls, bbox


def test_pyr_down_bit_exact(golden):
    g = golden("pyr_probe")
    got = np.asarray(pyr_down_u8(g["cg_in"]))
    assert (got == g["cg_down_oracle"]).all()


def test_dn_pyrdown_is_subsample(golden):
    g = golden("pyr_probe")
    assert (g["dn_q0"][::2, ::2] == g["dn_q1"]).all()


def test_template_extraction_matches_oracle(golden):
    g = golden("template_sphere")
    tmpls, bbox = _build_templates(g)
    assert tuple(bbox) == tuple(g["bbox"]), f"bbox {bbox} vs {tuple(g['bbox'])}"
    for i, t in enumerate(tmpls):
        exp_feats = g[f"feat{i}"]
        exp_w, exp_h, exp_lvl = g[f"meta{i}"]
        assert t.pyramid_level == exp_lvl
        assert (t.width, t.height) == (exp_w, exp_h), f"tmpl{i} size"
        got = t.feature_array()
        assert got.shape == exp_feats.shape, (
            f"tmpl{i}: {got.shape} vs {exp_feats.shape}"
        )
        mism = int((got != exp_feats).any(axis=1).sum())
        assert mism == 0, f"tmpl{i}: {mism}/{len(exp_feats)} differing features"
