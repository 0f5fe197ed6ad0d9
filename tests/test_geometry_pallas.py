"""Fused geometry kernel vs the XLA composition and the oracle golden.

ops/geometry_pallas.FusedScene reproduces depth_to_3d + FalsNormals +
pack (the fused detect program's on-TPU geometry stage). Cloud planes
and the NaN/validity structure are exact; the FALS normal solve is
near-singular (M^-1 amplifies 1-ulp differences in 1/r by ~1e4 — the
reason FalsNormals inverts M in f64), so normals carry an inherent
~1 deg f32 noise floor between ANY two rounding-different but correct
implementations (measured: XLA-CPU vs the same expression in numpy
differs by 1 ulp in r alone). The kernel is therefore gated at the same
angular bounds the XLA path itself holds against the cv2 oracle
(test_geom: mean < 0.5 deg, 99p < 2.0 deg) — both against the XLA
composition and directly against the oracle golden.
"""

import pathlib
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
import scenes  # noqa: E402

from object_detector_6d_tpu.geom.backproject import depth_to_3d
from object_detector_6d_tpu.geom.normals import FalsNormals
from object_detector_6d_tpu.ops.geometry_pallas import (
    FusedScene,
    planes_to_scene8,
)
from object_detector_6d_tpu.refine.projective import pack_scene7


def _ang(a, b):
    m = np.isfinite(a).all(-1) & np.isfinite(b).all(-1)
    m[:4] = m[-4:] = False
    m[:, :4] = m[:, -4:] = False
    dots = np.clip(np.abs((a[m] * b[m]).sum(-1)), 0, 1)
    return np.degrees(np.arccos(dots))


def test_fused_scene_matches_xla_composition():
    K = scenes.K_DEFAULT
    dep, _, mask = scenes.snowman_scene()
    dep = dep.copy()
    dep[100:140, 200:260] = 0  # depth holes (NaN propagation)
    dep2, _, _ = scenes.render_translated(dep, mask, K, np.array([0.03, 0, 0]))
    depths = jnp.asarray(np.stack([dep, dep2]))

    fused = FusedScene(480, 640, K)
    planes = np.asarray(fused(depths, interpret=True))  # [2, 8, H, W]

    est = FalsNormals(480, 640, K)
    for b in range(2):
        cloud = depth_to_3d(depths[b], jnp.asarray(K))
        normals = est(cloud)
        ref_cloud = np.asarray(cloud)
        ref_n = np.asarray(normals)

        got_cloud = planes[b, 0:3].transpose(1, 2, 0)
        got_n = planes[b, 3:6].transpose(1, 2, 0)
        # cloud: exact structure, f32 round-off values
        np.testing.assert_array_equal(np.isnan(got_cloud), np.isnan(ref_cloud))
        np.testing.assert_allclose(
            np.nan_to_num(got_cloud), np.nan_to_num(ref_cloud),
            rtol=0, atol=1e-6)
        # normals: angular agreement at the estimator's f32 noise floor
        ang = _ang(got_n, ref_n)
        assert ang.mean() < 0.3, f"mean {ang.mean():.3f} deg"
        assert np.quantile(ang, 0.99) < 1.2, f"p99 {np.quantile(ang, 0.99):.3f}"
        # identical invalidity structure
        np.testing.assert_array_equal(
            np.isnan(got_n).any(-1), np.isnan(ref_n).any(-1))

        # packed rows mirror pack_scene7's layout + validity
        scene8 = np.asarray(planes_to_scene8(jnp.asarray(planes[b])))
        ref7 = np.asarray(pack_scene7(jnp.concatenate([cloud, normals], -1)))
        np.testing.assert_array_equal(scene8[:, 6], ref7[:, 6])
        np.testing.assert_allclose(scene8[:, :3], ref7[:, :3], rtol=0,
                                   atol=1e-6)
        assert (scene8[:, 7] == 0).all()


def test_fused_scene_vs_oracle_golden(golden):
    """Directly against cv2 RgbdNormals FALS output (test_geom's bar)."""
    g = golden("geom")
    fused = FusedScene(480, 640, g["K"])
    planes = np.asarray(fused(jnp.asarray(g["depth_u16"][None]),
                              interpret=True))[0]
    got_n = planes[3:6].transpose(1, 2, 0)
    ang = _ang(got_n, g["normals_fals"])
    assert ang.mean() < 0.5, f"mean {ang.mean():.3f} deg"
    assert np.quantile(ang, 0.99) < 2.0, f"p99 {np.quantile(ang, 0.99):.3f}"
    # cloud planes equal the oracle's depthTo3d
    got_c = planes[0:3].transpose(1, 2, 0)
    np.testing.assert_allclose(np.nan_to_num(got_c),
                               np.nan_to_num(g["p3d"]), rtol=0, atol=1e-5)
