"""Parity of depth rescale / back-projection / FALS normals vs the oracle."""

import numpy as np

from object_detector_6d_tpu.geom.backproject import depth_to_3d, depth_to_3d_sparse
from object_detector_6d_tpu.geom.depth import rescale_depth
from object_detector_6d_tpu.geom.normals import normals_fals


def test_rescale_depth(golden):
    g = golden("geom")
    r = np.asarray(rescale_depth(g["depth_u16"]))
    np.testing.assert_allclose(r, g["rescaled"], rtol=0, atol=1e-6)


def test_depth_to_3d_matches_oracle(golden):
    g = golden("geom")
    p = np.asarray(depth_to_3d(g["depth_u16"], g["K"]))
    np.testing.assert_allclose(p, g["p3d"], rtol=0, atol=1e-5)


def test_depth_to_3d_nan_holes(golden):
    g = golden("geom")
    p = np.asarray(depth_to_3d(g["depth_holes"], g["K"]))
    expected = g["p3d_holes"]
    assert (np.isnan(p) == np.isnan(expected)).all()
    m = ~np.isnan(expected)
    np.testing.assert_allclose(p[m], expected[m], rtol=0, atol=1e-5)


def test_depth_to_3d_sparse(golden):
    g = golden("geom")
    u = np.array([10, 320, 639])
    v = np.array([5, 240, 479])
    z = g["rescaled"][v, u]
    p = np.asarray(depth_to_3d_sparse(u, v, z, g["K"]))
    np.testing.assert_allclose(p, g["p3d"][v, u], rtol=0, atol=1e-5)


def test_normals_fals_angular_parity(golden):
    g = golden("geom")
    n = np.asarray(normals_fals(g["p3d"], g["K"], window_size=5))
    expected = g["normals_fals"]
    # Compare on interior pixels where both are finite.
    m = np.isfinite(n).all(-1) & np.isfinite(expected).all(-1)
    m[:4] = m[-4:] = False
    m[:, :4] = m[:, -4:] = False
    dots = np.clip(np.abs((n[m] * expected[m]).sum(-1)), 0, 1)
    ang = np.degrees(np.arccos(dots))
    assert np.quantile(ang, 0.99) < 2.0, f"99p angular error {np.quantile(ang, 0.99):.3f} deg"
    assert ang.mean() < 0.5
    # Orientation convention: toward the camera (n . view < 0 => z < 0 mostly)
    assert (n[m][:, 2] < 0).mean() > 0.99


def test_normals_fals_unit_length(golden):
    g = golden("geom")
    n = np.asarray(normals_fals(g["p3d"], g["K"]))
    m = np.isfinite(n).all(-1)
    norms = np.linalg.norm(n[m], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_normals_sri(golden):
    from object_detector_6d_tpu.geom.normals import normals_sri

    g = golden("geom")
    n = np.asarray(normals_sri(g["p3d"], g["K"]))
    expected = g["normals_fals"]
    m = np.isfinite(n).all(-1) & np.isfinite(expected).all(-1)
    m[:6] = m[-6:] = False
    m[:, :6] = m[:, -6:] = False
    dots = np.clip(np.abs((n[m] * expected[m]).sum(-1)), 0, 1)
    ang = np.degrees(np.arccos(dots))
    # SRI smooths more than FALS; agree on smooth surfaces to a few deg
    assert np.median(ang) < 2.0, f"median angular diff {np.median(ang):.2f}"
    assert (n[m][:, 2] < 0).mean() > 0.99


def test_normals_linemod_oracle(golden):
    """RgbdNormals LINEMOD method (raw u16 input) vs oracle goldens."""
    from object_detector_6d_tpu.geom.normals import normals_linemod

    g = golden("lmn_normals")
    K = g["K"]
    for case in ("sphere", "snowman", "rampxy", "holes"):
        ours = np.asarray(normals_linemod(g[case + "_in"], K))
        ref = g[case + "_n"]
        # identical validity structure: NaN holes and (0,0,0) borders
        np.testing.assert_array_equal(
            np.isnan(ours).any(-1), np.isnan(ref).any(-1), err_msg=case
        )
        zeros_ref = (ref == 0).all(-1) & ~np.isnan(ref).any(-1)
        zeros_ours = (ours == 0).all(-1) & ~np.isnan(ours).any(-1)
        np.testing.assert_array_equal(zeros_ours, zeros_ref, err_msg=case)
        m = np.isfinite(ref).all(-1) & ~zeros_ref
        dot = np.clip(np.abs((ours[m] * ref[m]).sum(-1)), 0, 1)
        ang = np.degrees(np.arccos(dot))
        # sub-0.2 deg 99p: exact on single-axis gradients; rim pixels
        # whose ring straddles the bilateral cutoff differ by <0.5 deg
        assert np.percentile(ang, 99) < 0.2, (case, np.percentile(ang, 99))
        assert ang.mean() < 0.05, (case, ang.mean())
