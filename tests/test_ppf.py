"""PPF detector + helpers: recover a known pose template-free."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

from object_detector_6d_tpu.core.se3 import SE3
from object_detector_6d_tpu.io.ply import load_ply, write_ply
from object_detector_6d_tpu.ppf.detector import PPFDetector
from object_detector_6d_tpu.ppf.helpers import (
    add_noise_pc,
    compute_normals_pc3d,
    knn,
    sample_pc_by_quantization,
    transform_pc_pose,
)


def _model_cloud(n=900, seed=3):
    """Asymmetric blobby model with analytic normals (3 sphere caps)."""
    rng = np.random.RandomState(seed)

    def cap(m, r, c):
        phi = rng.uniform(0, 2 * np.pi, m)
        ct = rng.uniform(0.3, 1.0, m)
        st = np.sqrt(1 - ct**2)
        dirs = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)
        return np.concatenate([np.asarray(c) + r * dirs, dirs], -1)

    parts = [
        cap(n // 3, 0.05, [0, 0, 0]),
        cap(n // 3, 0.03, [0.07, 0.02, 0.01]),
        cap(n - 2 * (n // 3), 0.04, [0.01, -0.06, -0.01]),
    ]
    return np.concatenate(parts).astype(np.float32)


def test_ppf_recovers_pose():
    model = _model_cloud()
    T_true = np.asarray(
        SE3.exp(np.array([0.4, -0.3, 0.5, 0.06, -0.02, 0.04], np.float32))
    )
    scene = transform_pc_pose(model, T_true)
    det = PPFDetector(relative_sampling_step=0.05)
    det.train_model(model)
    poses = det.match(scene, relative_scene_sample_step=0.25)
    assert poses, "no PPF hypotheses"
    best = poses[0]
    # translation within 10% of diameter, rotation within ~20 deg
    t_err = np.linalg.norm(best.pose[:3, 3] - T_true[:3, 3])
    assert t_err < 0.1 * det.model_diameter, f"t err {t_err}"
    R_err = np.degrees(
        np.arccos(np.clip((np.trace(best.pose[:3, :3].T @ T_true[:3, :3]) - 1) / 2, -1, 1))
    )
    assert R_err < 25.0, f"R err {R_err} deg"


def test_voxel_sampling():
    pc = _model_cloud()
    s = sample_pc_by_quantization(pc, 0.05)
    assert 10 < len(s) < len(pc)
    norms = np.linalg.norm(s[:, 3:], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_knn_and_pca_normals():
    pc = _model_cloud(400)
    idx, d2 = knn(pc[:, :3], pc[:, :3], 4)
    assert (np.asarray(idx)[:, 0] == np.arange(400)).all()
    out = np.asarray(compute_normals_pc3d(pc[:, :3], k=10, viewpoint=np.array([0., 0, 1.0], np.float32)))
    # PCA normals should align with analytic ones up to sign/tolerance
    dots = np.abs(np.sum(out[:, 3:] * pc[:, 3:], -1))
    assert np.median(dots) > 0.95


def test_ply_roundtrip(tmp_path):
    pc = _model_cloud(100)
    for binary in (True, False):
        p = tmp_path / f"m_{binary}.ply"
        write_ply(str(p), pc, binary=binary)
        back = load_ply(str(p))
        np.testing.assert_allclose(back, pc, atol=1e-5)


def test_noise():
    pc = _model_cloud(100)
    noisy = add_noise_pc(pc, 0.001)
    assert 0 < np.abs(noisy[:, :3] - pc[:, :3]).max() < 0.01


def test_ppf_write_read_roundtrip(tmp_path):
    """PPF3DDetector::write/read counterpart (ppf_match_3d.hpp:143-144;
    the canonical lib declares but never implements these — no symbols —
    so the on-disk format is ours; trained state must round-trip exactly
    and matching must be reproducible from the loaded detector."""
    model = _model_cloud()
    det = PPFDetector(relative_sampling_step=0.05)
    det.train_model(model)
    path = str(tmp_path / "ppf_model.npz")
    det.write(path)
    det2 = PPFDetector.read(path)
    np.testing.assert_array_equal(det2._keys_sorted, det._keys_sorted)
    np.testing.assert_array_equal(det2._vals_i, det._vals_i)
    np.testing.assert_array_equal(det2._vals_alpha, det._vals_alpha)
    np.testing.assert_array_equal(det2.model_sampled, det.model_sampled)
    assert det2.model_diameter == det.model_diameter

    T_true = np.asarray(
        SE3.exp(np.array([0.2, -0.1, 0.3, 0.04, -0.01, 0.03], np.float32))
    )
    scene = transform_pc_pose(model, T_true)
    p1 = det.match(scene, relative_scene_sample_step=0.25)
    p2 = det2.match(scene, relative_scene_sample_step=0.25)
    assert len(p1) == len(p2)
    np.testing.assert_allclose(p1[0].pose, p2[0].pose, atol=0)
