"""Native C++ codecs agree with the pure-Python implementations."""

import pathlib

import numpy as np
import pytest

from object_detector_6d_tpu.io import native, yaml_store
from object_detector_6d_tpu.io.ply import load_ply, write_ply

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_native_store_reader(lib):
    path = str(GOLDEN / "oracle_templates_obj.yml.gz")
    got = native.read_class_native(path)
    assert got is not None
    cid_n, mods_n, lv_n, tps_n = got
    cid_p, mods_p, lv_p, tps_p = yaml_store.read_class(path)
    assert (cid_n, mods_n, lv_n) == (cid_p, mods_p, lv_p)
    assert len(tps_n) == len(tps_p)
    for tp_n, tp_p in zip(tps_n, tps_p):
        for t_n, t_p in zip(tp_n, tp_p):
            assert (t_n.width, t_n.height, t_n.pyramid_level) == (
                t_p.width, t_p.height, t_p.pyramid_level)
            np.testing.assert_array_equal(t_n.feature_array(), t_p.feature_array())


def test_native_ply_reader(lib, tmp_path):
    rng = np.random.RandomState(0)
    pc = rng.uniform(-1, 1, (500, 6)).astype(np.float32)
    for binary in (True, False):
        p = tmp_path / f"c_{binary}.ply"
        write_ply(str(p), pc, binary=binary)
        got = native.load_ply_native(str(p))
        assert got is not None
        np.testing.assert_allclose(got, pc, atol=1e-5)
        np.testing.assert_allclose(got, load_ply(str(p)), atol=1e-5)


def test_native_ply_xyz_only(lib, tmp_path):
    pc = np.arange(30, dtype=np.float32).reshape(10, 3)
    p = tmp_path / "xyz.ply"
    write_ply(str(p), pc, binary=True)
    got = native.load_ply_native(str(p))
    np.testing.assert_allclose(got, pc)
