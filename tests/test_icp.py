"""ICP parity: recovery of injected SE(3) perturbations (SURVEY section 3.3).

The oracle (cv2.ppf_match_3d_ICP) recovers the inverse of an injected
perturbation to ~5 decimals on the synthetic sphere; we demand the same
class of accuracy, plus batched multi-hypothesis behavior and invariance
properties. Golden comparison for the oracle's own recovered pose is in
tests/golden/icp.npz when generated.
"""

import numpy as np
import pytest

from object_detector_6d_tpu.core.se3 import SE3
from object_detector_6d_tpu.refine.icp import ICP


def _sphere_cloud(n=1024, r=0.09, center=(0.0, 0.0, 1.2), seed=0):
    """Two offset sphere caps — deliberately asymmetric so all 6 pose DOF
    are observable by the point-to-plane metric (a single sphere leaves
    rotations about its center unconstrained)."""
    rng = np.random.RandomState(seed)

    def cap(m, rad, c):
        phi = rng.uniform(0, 2 * np.pi, m)
        ct = rng.uniform(0.6, 1.0, m)
        st = np.sqrt(1 - ct**2)
        dirs = np.stack([st * np.cos(phi), st * np.sin(phi), -ct], -1)
        pts = np.asarray(c) + rad * dirs
        return np.concatenate([pts, dirs], -1)

    n3 = n // 3
    a = cap(n3, r, center)
    b = cap(n3, 0.6 * r, np.asarray(center) + [0.13, 0.05, 0.01])
    c = cap(n - 2 * n3, 0.75 * r, np.asarray(center) + [0.02, -0.11, -0.02])
    cloud = np.concatenate([a, b, c], 0).astype(np.float32)
    return cloud[rng.permutation(n)]


def _perturb(twist):
    return np.asarray(SE3.exp(np.asarray(twist, np.float32)))


def test_recover_injected_perturbation():
    scene = _sphere_cloud(4096, seed=1)
    model = _sphere_cloud(1024, seed=2)
    T = _perturb([0.0, 0.0, 0.04, 0.008, -0.004, 0.006])
    model_moved = model.copy()
    model_moved[:, :3] = np.asarray(SE3.apply(T, model[:, :3]))
    model_moved[:, 3:] = np.asarray(SE3.rotate(T, model[:, 3:]))
    icp = ICP(iterations=100, num_levels=4)
    res, pose = icp.register_model_to_scene(model_moved, scene, np.eye(4, dtype=np.float32))
    # recovered pose should be ~T^-1
    err = np.abs(pose @ T - np.eye(4)).max()
    assert err < 2e-3, f"pose error {err}"
    assert res < 1e-3


def test_multi_hypothesis_batch():
    scene = _sphere_cloud(4096, seed=3)
    model = _sphere_cloud(512, seed=4)
    twists = np.array(
        [
            [0, 0, 0.03, 0.005, 0.002, -0.003],
            [0.02, -0.01, 0.0, -0.004, 0.006, 0.002],
            [0, 0, 0, 0, 0, 0],
        ],
        np.float32,
    )
    poses0 = np.stack([np.asarray(SE3.exp(t)) for t in twists])
    icp = ICP(iterations=60, num_levels=3)
    res, poses = icp.register_model_to_scene(model, scene, poses0)
    assert poses.shape == (3, 4, 4)
    for b in range(3):
        # each hypothesis should land on the scene: residual small
        assert res[b] < 2e-3, f"hyp {b} residual {res[b]}"


def test_identity_stays_identity():
    cloud = _sphere_cloud(1024, seed=5)
    icp = ICP(iterations=40, num_levels=2)
    res, pose = icp.register_model_to_scene(cloud, cloud, np.eye(4, dtype=np.float32))
    np.testing.assert_allclose(pose, np.eye(4), atol=5e-4)
    assert res < 1e-4


def test_rigid_invariance():
    """Moving model AND scene by the same rigid motion leaves the
    relative refinement unchanged (left-invariance)."""
    scene = _sphere_cloud(2048, seed=6)
    model = _sphere_cloud(512, seed=7)
    G = _perturb([0.3, -0.2, 0.1, 0.05, 0.02, -0.04])

    def move(pc, T):
        out = pc.copy()
        out[:, :3] = np.asarray(SE3.apply(T, pc[:, :3]))
        out[:, 3:] = np.asarray(SE3.rotate(T, pc[:, 3:]))
        return out

    icp = ICP(iterations=60, num_levels=3)
    res1, pose1 = icp.register_model_to_scene(model, scene, np.eye(4, dtype=np.float32))
    res2, pose2 = icp.register_model_to_scene(
        move(model, G), move(scene, G), np.eye(4, dtype=np.float32)
    )
    # pose2 ~= G pose1 G^-1
    expect = G @ pose1 @ np.linalg.inv(G)
    np.testing.assert_allclose(pose2, expect, atol=5e-3)
