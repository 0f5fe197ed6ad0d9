"""Pose3D / PoseCluster3D binary serialization parity (pose_3d.hpp:118-121).

Golden files were produced by the canonical compiled library
(libopencv_surface_matching.so.4.6.0) via a C++ probe:
Pose3D(alpha=0.42, modelIndex=7, numVotes=1234), updatePose(R, t) with
R = [[.36,.48,-.8],[-.8,.6,0],[.48,.64,.6]], t = (0.1, -0.2, 0.3),
residual 0.00321; the cluster holds that pose plus an identity pose
(modelIndex=3, numVotes=99) with id=5.
"""

import io
import pathlib

import numpy as np

from object_detector_6d_tpu.refine.pose import Pose, PoseCluster

GOLD = pathlib.Path(__file__).parent / "golden"

R_REF = np.array([[0.36, 0.48, -0.8], [-0.8, 0.6, 0.0], [0.48, 0.64, 0.6]])
T_REF = np.array([0.1, -0.2, 0.3])


def test_read_oracle_pose3d():
    p = Pose.read_pose(str(GOLD / "oracle_pose3d.bin"))
    assert p.num_votes == 1234 and p.model_index == 7
    np.testing.assert_allclose(p.pose[:3, :3], R_REF, atol=1e-12)
    np.testing.assert_allclose(p.pose[:3, 3], T_REF, atol=1e-12)
    assert abs(p.residual - 0.00321) < 1e-12


def test_write_matches_oracle_bytes():
    """Byte-identical to the oracle's writePose except the t field (we
    write the pose's real translation; the oracle dumps its stale,
    never-updated t member — documented deviation)."""
    p = Pose.read_pose(str(GOLD / "oracle_pose3d.bin"))
    buf = io.BytesIO()
    p.write_pose(buf)
    ours = buf.getvalue()
    ref = (GOLD / "oracle_pose3d.bin").read_bytes()
    assert len(ours) == len(ref) == 212
    # magic + counts + pose matrix identical
    assert ours[:4] == ref[:4]
    assert ours[12:148] == ref[12:148]
    # q + residual identical (oracle's conjugate quat convention)
    assert ours[172:] == ref[172:]
    # angle recomputed from the matrix: equal to 1 ulp
    import struct
    a_ours, = struct.unpack_from("<d", ours, 4)
    a_ref, = struct.unpack_from("<d", ref, 4)
    assert abs(a_ours - a_ref) < 1e-12
    # t field [148:172) is a documented deviation (we write the real
    # translation; the oracle dumps a stale member)


def test_pose_roundtrip():
    p = Pose(pose=np.diag([1.0, -1.0, -1.0, 1.0]), residual=0.5,
             num_votes=9, model_index=2)
    p.pose[:3, 3] = (0.01, 0.02, 0.03)
    buf = io.BytesIO()
    p.write_pose(buf)
    buf.seek(0)
    q = Pose.read_pose(buf)
    np.testing.assert_allclose(q.pose, p.pose, atol=0)
    assert q.num_votes == 9 and q.model_index == 2 and q.residual == 0.5


def test_read_oracle_cluster_and_roundtrip():
    c = PoseCluster.read_pose_cluster(str(GOLD / "oracle_pose_cluster.bin"))
    assert c.id == 5 and c.num_votes == 1234 + 99
    assert len(c.poses) == 2
    np.testing.assert_allclose(c.poses[0].pose[:3, :3], R_REF, atol=1e-12)
    np.testing.assert_allclose(c.poses[1].pose, np.eye(4), atol=1e-12)
    buf = io.BytesIO()
    c.write_pose_cluster(buf)
    buf.seek(0)
    c2 = PoseCluster.read_pose_cluster(buf)
    assert c2.id == c.id and c2.num_votes == c.num_votes
    np.testing.assert_allclose(c2.poses[0].pose, c.poses[0].pose, atol=0)
