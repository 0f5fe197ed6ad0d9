"""SE(3) / SO(3) algebra invariants (property tests, batched)."""

import numpy as np

from object_detector_6d_tpu.core.se3 import SE3, so3_exp, so3_log


def _rand_twists(n=32, seed=0):
    rng = np.random.RandomState(seed)
    w = rng.uniform(-1.5, 1.5, (n, 3))
    v = rng.uniform(-0.5, 0.5, (n, 3))
    return np.concatenate([w, v], -1).astype(np.float32)


def test_exp_log_roundtrip():
    tw = _rand_twists()
    T = np.asarray(SE3.exp(tw))
    back = np.asarray(SE3.log(T))
    np.testing.assert_allclose(back, tw, atol=2e-5)


def test_inverse_compose_identity():
    tw = _rand_twists(seed=1)
    T = SE3.exp(tw)
    I = np.asarray(SE3.compose(T, SE3.inverse(T)))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_rotation_orthonormal():
    R = np.asarray(so3_exp(_rand_twists(seed=2)[:, :3]))
    RtR = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_apply_matches_matrix():
    tw = _rand_twists(seed=3)[:4]
    T = np.asarray(SE3.exp(tw))
    pts = np.random.RandomState(4).uniform(-1, 1, (4, 10, 3)).astype(np.float32)
    out = np.asarray(SE3.apply(T, pts))
    hom = np.concatenate([pts, np.ones((4, 10, 1), np.float32)], -1)
    expected = np.einsum("nij,npj->npi", T, hom)[..., :3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quat_roundtrip():
    tw = _rand_twists(seed=5)
    T = np.asarray(SE3.exp(tw))
    q = SE3.to_quat(T)
    T2 = np.asarray(SE3.from_quat(q, SE3.translation(T)))
    np.testing.assert_allclose(T2, T, atol=1e-5)


def test_small_angle_stability():
    tw = np.zeros((3, 6), np.float32)
    tw[1, :3] = 1e-9
    tw[2, :3] = [1e-4, -1e-4, 1e-4]
    T = np.asarray(SE3.exp(tw))
    assert np.isfinite(T).all()
    np.testing.assert_allclose(T[0], np.eye(4), atol=1e-7)
    back = np.asarray(so3_log(np.asarray(SE3.rotation(T))))
    np.testing.assert_allclose(back, tw[:, :3], atol=1e-7)
