"""Template store: read the oracle-written yml.gz, round-trip ours."""

import gzip
import pathlib

import numpy as np
import pytest

from object_detector_6d_tpu.api.detector import Detector
from object_detector_6d_tpu.io import yaml_store

GOLDEN = pathlib.Path(__file__).parent / "golden"


def test_read_oracle_store():
    cid, mods, levels, tps = yaml_store.read_class(
        str(GOLDEN / "oracle_templates_obj.yml.gz")
    )
    assert cid == "obj"
    assert mods == ["ColorGradient", "DepthNormal"]
    assert levels == 2
    assert len(tps) == 1
    tp = tps[0]
    assert len(tp) == 4  # (CG L0, DN L0, CG L1, DN L1)
    assert [t.pyramid_level for t in tp] == [0, 0, 1, 1]
    assert [len(t.features) for t in tp] == [63, 63, 31, 31]
    # this oracle store is the same sphere scene as template_sphere.npz
    g = np.load(GOLDEN / "template_sphere.npz")
    for i, t in enumerate(tp):
        np.testing.assert_array_equal(t.feature_array(), g[f"feat{i}"])
        w, h, lvl = g[f"meta{i}"]
        assert (t.width, t.height, t.pyramid_level) == (w, h, lvl)


def test_roundtrip_ours(tmp_path):
    cid, mods, levels, tps = yaml_store.read_class(
        str(GOLDEN / "oracle_templates_obj.yml.gz")
    )
    out = tmp_path / "templates_obj.yml.gz"
    yaml_store.write_class(str(out), cid, mods, levels, tps)
    cid2, mods2, levels2, tps2 = yaml_store.read_class(str(out))
    assert (cid2, mods2, levels2) == (cid, mods, levels)
    for tp, tp2 in zip(tps, tps2):
        for t, t2 in zip(tp, tp2):
            assert (t.width, t.height, t.pyramid_level) == (
                t2.width,
                t2.height,
                t2.pyramid_level,
            )
            np.testing.assert_array_equal(t.feature_array(), t2.feature_array())


def test_written_yaml_matches_oracle_bytes(tmp_path):
    """Byte-level equality with the oracle's own output (same schema,
    same formatting rules) — the strongest interop guarantee."""
    cid, mods, levels, tps = yaml_store.read_class(
        str(GOLDEN / "oracle_templates_obj.yml.gz")
    )
    text = yaml_store.emit_yaml(
        yaml_store.class_doc(cid, mods, levels, tps)
    )
    oracle_text = gzip.open(GOLDEN / "oracle_templates_obj.yml.gz", "rt").read()
    assert text == oracle_text


def test_detector_doc_roundtrip():
    det = Detector()
    doc = yaml_store.detector_doc(det)
    assert doc["T"] == [5, 8]
    names, t_at_level, cg, dn = yaml_store.parse_detector_doc(
        yaml_store.parse_yaml(yaml_store.emit_yaml(doc))
    )
    assert names == ["ColorGradient", "DepthNormal"]
    assert t_at_level == (5, 8)
    assert cg.strong_threshold == 55.0
    assert dn.distance_threshold == 2000


def test_npz_store_roundtrip(tmp_path):
    cid, mods, levels, tps = yaml_store.read_class(
        str(GOLDEN / "oracle_templates_obj.yml.gz")
    )
    p = tmp_path / "obj.npz"
    yaml_store.save_npz(str(p), cid, mods, levels, tps)
    cid2, mods2, levels2, tps2 = yaml_store.load_npz(str(p))
    assert (cid2, mods2, levels2) == (cid, mods, levels)
    for tp, tp2 in zip(tps, tps2):
        for t, t2 in zip(tp, tp2):
            np.testing.assert_array_equal(t.feature_array(), t2.feature_array())


def test_detector_read_write_classes(tmp_path):
    det = Detector()
    det.read_classes(["obj"], str(GOLDEN / "oracle_templates_%s.yml.gz"))
    assert det.num_templates("obj") == 1
    det.write_classes(str(tmp_path / "templates_%s.yml.gz"))
    det2 = Detector()
    det2.read_classes(["obj"], str(tmp_path / "templates_%s.yml.gz"))
    a = det.class_templates["obj"][0]
    b = det2.class_templates["obj"][0]
    for t, t2 in zip(a, b):
        np.testing.assert_array_equal(t.feature_array(), t2.feature_array())


def test_detector_params_file_roundtrip(tmp_path):
    det = Detector()
    p = tmp_path / "det.yml"
    det.write(str(p))
    det2 = Detector.read(str(p))
    assert det2.t_at_level == det.t_at_level
    assert det2.modality_names == det.modality_names
