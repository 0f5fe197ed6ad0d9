"""SRI-method normals vs the ORACLE's SRI output (PARITY deviation 4).

Round-2 PARITY.md could only say our SRI estimator "agrees with FALS to
a few degrees"; this golden comparison quantifies it against
cv2.rgbd.RgbdNormals METHOD_SRI itself (tools/gen_goldens.py gen_sri):
interior pixels agree to 0.04 deg median / ~2-2.6 deg p99 (measured on
the sphere and snowman scenes; the residual p99 tail sits on object
silhouette discontinuities where the two smoothing stencils differ).
"""

import numpy as np
import jax.numpy as jnp

from object_detector_6d_tpu.geom.backproject import depth_to_3d
from object_detector_6d_tpu.geom.normals import normals_sri


def _angles(ref, ours):
    both = np.isfinite(ref).all(-1) & np.isfinite(ours).all(-1)
    inner = np.zeros_like(both)
    inner[8:-8, 8:-8] = True
    m = both & inner
    dot = np.clip(np.abs((ref * ours).sum(-1)), 0, 1)
    return np.degrees(np.arccos(dot[m]))


def test_sri_vs_oracle(golden):
    g = golden("sri_normals")
    K = g["K"]
    for name in ("sphere", "snowman"):
        cloud = depth_to_3d(jnp.asarray(g[name + "_in"]), jnp.asarray(K))
        ours = np.asarray(normals_sri(cloud, jnp.asarray(K)))
        ang = _angles(g[name + "_n"], ours)
        p50, p99 = np.percentile(ang, [50, 99])
        assert p50 <= 0.2, f"{name}: p50 {p50:.3f} deg"
        assert p99 <= 4.0, f"{name}: p99 {p99:.3f} deg"
        # our estimator is defined (unit, camera-facing) everywhere the
        # scene is; the oracle additionally NaNs a thin border band
        assert np.isfinite(ours).all(-1).mean() > 0.999
