"""Device-side cluster NMS (detect_program.make_cluster_stage) vs the
host reference (refine/pose.py cluster_poses + PoseCluster.mean_pose).

The fused detect path runs scoring + pose-cluster NMS ON DEVICE and the
host only unpacks the final cluster records; this differential pins the
device stage to the exact host semantics on randomized hypothesis sets:
same filtering, same (-votes, residual) ordering, same greedy first-fit
clustering against cluster representatives, same cluster aggregation
(hemisphere-aligned quaternion mean, translation/residual means, vote
totals) and the same final by-votes cluster ordering.
"""

import jax
import numpy as np

from object_detector_6d_tpu.api import detect_program as dp
from object_detector_6d_tpu.refine.pose import Pose, cluster_poses

MAX_RESIDUAL = 0.01
TRANS_THR = 0.02


def _rot(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


def _random_case(rng, K_cap, n_classes=3):
    """Hypothesis lanes with deliberate near-duplicates and rejects."""
    poses = np.zeros((K_cap, 4, 4), np.float32)
    res = np.empty(K_cap, np.float32)
    keep = np.empty(K_cap, bool)
    packed = np.zeros((5, K_cap + 1), np.float32)
    # a few cluster centers; lanes perturb around them
    centers = []
    for _ in range(3):
        T = np.eye(4)
        T[:3, :3] = _rot(rng.standard_normal(3), rng.uniform(0, np.pi))
        T[:3, 3] = rng.uniform(-0.3, 0.3, 3)
        centers.append(T)
    for k in range(K_cap):
        c = centers[rng.integers(len(centers))].copy()
        near = rng.random() < 0.6
        d_ang = rng.uniform(0, 0.1 if near else 1.0)
        d_t = rng.uniform(0, 0.008 if near else 0.2, 3)
        c[:3, :3] = c[:3, :3] @ _rot(rng.standard_normal(3), d_ang)
        c[:3, 3] += d_t
        poses[k] = c.astype(np.float32)
        r = rng.random()
        res[k] = np.inf if r < 0.1 else rng.uniform(0, 2 * MAX_RESIDUAL)
        keep[k] = rng.random() < 0.8
        packed[0, k] = rng.integers(0, 600)
        packed[1, k] = rng.integers(0, 400)
        packed[2, k] = rng.choice([80.0, 90.5, 90.5, 97.0])  # forced ties
        packed[3, k] = rng.integers(0, n_classes * 2)  # 2 templates/class
        packed[4, k] = float(keep[k])
    packed[0, -1] = K_cap - 2  # n_raw candidates (no overflow)
    cls_of_tid = (np.arange(n_classes * 2) // 2).astype(np.int32)
    return packed, poses, res, keep, cls_of_tid


def _host_reference(packed, poses, res, keep, cls_of_tid, K_cap):
    """The pre-device-NMS host path (round 2 _finalize_host)."""
    class_names = [f"cls{c}" for c in cls_of_tid]
    out = []
    for k in range(K_cap):
        if not keep[k] or not np.isfinite(res[k]) or res[k] > MAX_RESIDUAL:
            continue
        tid = int(packed[3, k])
        out.append(
            Pose(
                pose=np.asarray(poses[k], np.float64),
                residual=float(res[k]),
                num_votes=int(round(packed[2, k] * 100)),
                class_id=class_names[tid],
                template_id=tid,
                match_x=int(packed[0, k]),
                match_y=int(packed[1, k]),
                match_similarity=float(packed[2, k]),
            )
        )
    clusters = cluster_poses(out, translation_threshold=TRANS_THR)
    return len(out), [c.mean_pose() for c in clusters]


def test_device_cluster_matches_host_reference():
    K_cap = 16
    cluster = jax.jit(dp.make_cluster_stage(K_cap))
    rng = np.random.default_rng(0)
    nms = np.asarray([MAX_RESIDUAL, TRANS_THR], np.float32)
    n_nonempty = 0
    for case in range(25):
        packed, poses, res, keep, cls_of_tid = _random_case(rng, K_cap)
        flat = np.asarray(
            cluster(packed, poses, res, keep, cls_of_tid, nms)
        )
        slots, n_raw, n_pass = dp.unflatten_cluster_outputs(flat, K_cap)
        n_ref_pass, ref = _host_reference(
            packed, poses, res, keep, cls_of_tid, K_cap
        )
        assert n_raw == packed[0, -1]
        assert int(n_pass) == n_ref_pass, f"case {case}"
        got = slots[slots[:, 0] > 0]
        # valid slots are contiguous at the front (vote-key ordering)
        assert not np.any(slots[len(got):, 0] > 0)
        assert len(got) == len(ref), f"case {case}"
        n_nonempty += bool(len(ref))
        for s, r in zip(got, ref):
            assert int(round(s[1])) == r.num_votes
            assert float(s[2]) == np.float32(r.match_similarity)
            assert f"cls{cls_of_tid[int(s[3])]}" == r.class_id
            assert int(s[4]) == r.match_x and int(s[5]) == r.match_y
            np.testing.assert_allclose(s[6], r.residual, rtol=1e-5)
            np.testing.assert_allclose(
                s[8:24].reshape(4, 4), r.pose, atol=2e-6
            )
    assert n_nonempty >= 20  # the generator produced real work


def test_device_cluster_all_invalid():
    K_cap = 8
    cluster = jax.jit(dp.make_cluster_stage(K_cap))
    packed = np.zeros((5, K_cap + 1), np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (K_cap, 1, 1))
    res = np.full(K_cap, np.inf, np.float32)
    keep = np.zeros(K_cap, bool)
    nms = np.asarray([MAX_RESIDUAL, TRANS_THR], np.float32)
    flat = np.asarray(
        cluster(packed, poses, res, keep, np.zeros(4, np.int32), nms)
    )
    slots, n_raw, n_pass = dp.unflatten_cluster_outputs(flat, K_cap)
    assert n_pass == 0 and not np.any(slots[:, 0] > 0)
