"""Pose containers and pose clustering/NMS (reference N12: pose_3d.hpp).

``Pose`` mirrors ppf_match_3d::Pose3D (pose_3d.hpp:70-131): an SE(3)
pose kept as a 4x4 matrix with its quaternion dual form, plus the
residual/votes bookkeeping the scoring stage uses. ``PoseCluster``
mirrors PoseCluster3D (pose_3d.hpp:138-180). ``cluster_poses`` is the
reference's pose clustering: greedy agglomeration of poses within
rotation/translation thresholds, vote-sorted — used both by the PPF
detector and as hypothesis NMS in the detect() pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np


def quat_from_mat(T: np.ndarray) -> np.ndarray:
    """[4, 4] (or [3, 3]) -> unit quaternion (w, x, y, z), w >= 0.

    Pure numpy (host): pose NMS runs per detection on the host, and each
    device op through a remote PJRT tunnel costs a ~30-40 ms round trip
    — routing this through the jnp SE3 helpers made NMS ~10x slower
    than the whole fused detect program. Same Shepperd construction and
    conventions as core/se3.py SE3.to_quat.
    """
    R = np.asarray(T, np.float64)[:3, :3]
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    # multiply by the reciprocal, don't divide: the oracle's dcmToQuat
    # precomputes 1/(4w) and the write_pose byte-parity test catches the
    # 1-ulp difference between x/(4w) and x*(1/(4w))
    if tr > 0:
        w = np.sqrt(max(0.0, 1.0 + tr)) / 2
        s = 1.0 / (4 * w)
        q = np.array([w, (R[2, 1] - R[1, 2]) * s,
                      (R[0, 2] - R[2, 0]) * s,
                      (R[1, 0] - R[0, 1]) * s])
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        x = np.sqrt(max(0.0, 1.0 + R[0, 0] - R[1, 1] - R[2, 2])) / 2
        s = 1.0 / (4 * x)
        q = np.array([(R[2, 1] - R[1, 2]) * s, x,
                      (R[0, 1] + R[1, 0]) * s,
                      (R[0, 2] + R[2, 0]) * s])
    elif R[1, 1] >= R[2, 2]:
        y = np.sqrt(max(0.0, 1.0 - R[0, 0] + R[1, 1] - R[2, 2])) / 2
        s = 1.0 / (4 * y)
        q = np.array([(R[0, 2] - R[2, 0]) * s,
                      (R[0, 1] + R[1, 0]) * s, y,
                      (R[1, 2] + R[2, 1]) * s])
    else:
        z = np.sqrt(max(0.0, 1.0 - R[0, 0] - R[1, 1] + R[2, 2])) / 2
        s = 1.0 / (4 * z)
        q = np.array([(R[1, 0] - R[0, 1]) * s,
                      (R[0, 2] + R[2, 0]) * s,
                      (R[1, 2] + R[2, 1]) * s, z])
    # no final normalization: Shepperd's construction is unit to f64
    # rounding already, and the oracle's dcmToQuat does not normalize
    # either (renormalizing costs 1 ulp of byte parity in write_pose)
    return -q if q[0] < 0 else q


def mat_from_quat(q: np.ndarray, t: Optional[np.ndarray] = None) -> np.ndarray:
    """Unit quaternion (w, x, y, z) (+ optional t) -> [4, 4] (numpy)."""
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    T = np.eye(4)
    T[:3, :3] = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    if t is not None:
        T[:3, 3] = t
    return T


@dataclasses.dataclass
class Pose:
    """SE(3) pose with detection metadata (pose_3d.hpp:70-131)."""

    pose: np.ndarray  # [4, 4] model -> scene
    residual: float = 0.0
    num_votes: int = 0
    model_index: int = 0
    class_id: str = ""
    template_id: int = -1
    match_x: int = -1
    match_y: int = -1
    match_similarity: float = 0.0

    @property
    def q(self) -> np.ndarray:
        """Unit quaternion (w, x, y, z) of the rotation part."""
        return quat_from_mat(self.pose)

    @property
    def t(self) -> np.ndarray:
        return self.pose[:3, 3]

    def update_pose(self, new_pose: np.ndarray) -> None:
        self.pose = np.asarray(new_pose)

    def append_pose(self, incremental: np.ndarray) -> None:
        """Left-compose an incremental transform (Pose3D::appendPose)."""
        self.pose = np.asarray(incremental) @ self.pose

    def write(self) -> dict:
        return {
            "pose": self.pose.tolist(),
            "residual": float(self.residual),
            "num_votes": int(self.num_votes),
            "model_index": int(self.model_index),
        }

    @classmethod
    def read(cls, d: dict) -> "Pose":
        return cls(
            pose=np.asarray(d["pose"], np.float64),
            residual=float(d.get("residual", 0.0)),
            num_votes=int(d.get("num_votes", 0)),
            model_index=int(d.get("model_index", 0)),
        )

    # -- oracle binary format (Pose3D::writePose/readPose,
    #    pose_3d.hpp:118-121; layout probed byte-for-byte from the
    #    compiled libopencv_surface_matching.so.4.6.0) --

    def write_pose(self, f) -> None:
        """Oracle-compatible binary: magic(7673) i32 | angle f64 |
        numVotes i32 | modelIndex i32 | pose 16xf64 | t 3xf64 | q 4xf64
        | residual f64 (alpha is NOT serialized, matching the oracle).

        One intentional improvement: we write ``t`` as the pose's actual
        translation; the oracle dumps its (often stale — updatePose
        never sets it) ``t`` member. Oracle readers ignore t anyway.
        """
        import struct

        close = False
        if isinstance(f, (str, bytes)):
            f = open(f, "wb")
            close = True
        try:
            q = self.q
            angle = 2.0 * float(np.arccos(np.clip(abs(q[0]), 0.0, 1.0)))
            f.write(struct.pack("<idii", 7673, angle,
                                int(self.num_votes), int(self.model_index)))
            f.write(np.asarray(self.pose, "<f8").tobytes())
            f.write(np.asarray(self.pose[:3, 3], "<f8").tobytes())
            # the oracle's dcm-to-quat uses the conjugate (JPL-style)
            # convention relative to our Hamilton quat_from_mat [probed
            # byte-for-byte]; emit its convention
            q_oracle = np.array([q[0], -q[1], -q[2], -q[3]])
            f.write(np.asarray(q_oracle, "<f8").tobytes())
            f.write(struct.pack("<d", float(self.residual)))
        finally:
            if close:
                f.close()

    @classmethod
    def read_pose(cls, f) -> "Pose":
        """Read the oracle's Pose3D binary (see write_pose)."""
        import struct

        close = False
        if isinstance(f, (str, bytes)):
            f = open(f, "rb")
            close = True
        try:
            magic, _angle, nv, mi = struct.unpack("<idii", f.read(20))
            if magic != 7673:
                raise ValueError(f"bad Pose3D magic {magic}")
            pose = np.frombuffer(f.read(128), "<f8").reshape(4, 4).copy()
            f.read(24)  # t member (stale in oracle files; pose has it)
            f.read(32)  # q (recomputed from the matrix on demand)
            (residual,) = struct.unpack("<d", f.read(8))
            return cls(pose=pose, residual=residual, num_votes=nv,
                       model_index=mi)
        finally:
            if close:
                f.close()


@dataclasses.dataclass
class PoseCluster:
    """Accumulated cluster of nearby poses (PoseCluster3D)."""

    poses: List[Pose]
    num_votes: int = 0
    id: int = 0

    def add_pose(self, p: Pose) -> None:
        self.poses.append(p)
        self.num_votes += p.num_votes

    def mean_pose(self) -> Pose:
        """Average the cluster (quaternion mean + translation mean)."""
        qs = np.stack([p.q for p in self.poses])
        # align hemispheres to the first quaternion before averaging
        signs = np.sign(qs @ qs[0])
        signs[signs == 0] = 1.0
        q_mean = (qs * signs[:, None]).mean(0)
        q_mean /= np.linalg.norm(q_mean)
        t_mean = np.stack([p.t for p in self.poses]).mean(0)
        T = mat_from_quat(q_mean, t_mean)
        rep = self.poses[0]
        return Pose(
            pose=np.asarray(T, np.float64),
            residual=float(np.mean([p.residual for p in self.poses])),
            num_votes=self.num_votes,
            model_index=rep.model_index,
            class_id=rep.class_id,
            template_id=rep.template_id,
            match_x=rep.match_x,
            match_y=rep.match_y,
            match_similarity=max(p.match_similarity for p in self.poses),
        )


    # -- oracle binary format (PoseCluster3D::writePoseCluster /
    #    readPoseCluster; probed from the compiled lib: magic(8462597)
    #    i32 | id i32 | numVotes i32 | n i32 | n Pose3D records). Note
    #    the oracle's own readPoseCluster double-frees on destruction
    #    [measured crash]; ours round-trips. --

    def write_pose_cluster(self, f) -> None:
        import struct

        close = False
        if isinstance(f, (str, bytes)):
            f = open(f, "wb")
            close = True
        try:
            f.write(struct.pack("<iiii", 8462597, int(self.id),
                                int(self.num_votes), len(self.poses)))
            for p in self.poses:
                p.write_pose(f)
        finally:
            if close:
                f.close()

    @classmethod
    def read_pose_cluster(cls, f) -> "PoseCluster":
        import struct

        close = False
        if isinstance(f, (str, bytes)):
            f = open(f, "rb")
            close = True
        try:
            magic, cid, nv, n = struct.unpack("<iiii", f.read(16))
            if magic != 8462597:
                raise ValueError(f"bad PoseCluster3D magic {magic}")
            poses = [Pose.read_pose(f) for _ in range(n)]
            return cls(poses=poses, num_votes=nv, id=cid)
        finally:
            if close:
                f.close()


def rotation_angle_between(qa: np.ndarray, qb: np.ndarray) -> float:
    """Geodesic rotation angle between two unit quaternions (radians)."""
    dot = abs(float(np.dot(qa, qb)))
    return 2.0 * float(np.arccos(min(1.0, dot)))


def cluster_poses(
    poses: Sequence[Pose],
    rotation_threshold_rad: float = np.deg2rad(15.0),
    translation_threshold: float = 0.02,
    per_class: bool = True,
) -> List[PoseCluster]:
    """Greedy pose clustering (ppf_match_3d clusterPoses semantics).

    Poses are sorted by votes (then inverse residual) and greedily merged
    into the first cluster whose representative is within both
    thresholds. Returns clusters sorted by total votes.
    """
    order = sorted(
        poses, key=lambda p: (-p.num_votes, p.residual)
    )
    clusters: List[PoseCluster] = []
    for p in order:
        placed = False
        for c in clusters:
            rep = c.poses[0]
            if per_class and rep.class_id != p.class_id:
                continue
            if (
                rotation_angle_between(rep.q, p.q) <= rotation_threshold_rad
                and np.linalg.norm(rep.t - p.t) <= translation_threshold
            ):
                c.add_pose(p)
                placed = True
                break
        if not placed:
            clusters.append(PoseCluster(poses=[p], num_votes=p.num_votes, id=len(clusters)))
    clusters.sort(key=lambda c: -c.num_votes)
    return clusters
