"""ICP vs the oracle on the same clouds: both must recover T^-1."""

import numpy as np

from object_detector_6d_tpu.refine.icp import ICP


def test_pose_matches_oracle(golden):
    g = golden("icp")
    icp = ICP(iterations=100, num_levels=6)
    res, pose = icp.register_model_to_scene(
        g["model_moved"], g["scene"], np.eye(4, dtype=np.float32)
    )
    # both recover the inverse perturbation; compare against the oracle's
    # refined pose directly (SURVEY.md: "ICP pose to 1e-4" class accuracy)
    diff = np.abs(pose - g["oracle_pose"]).max()
    assert diff < 5e-3, f"pose differs from oracle by {diff}"
    err = np.abs(pose @ g["T"] - np.eye(4)).max()
    assert err < 1.5e-3, f"pose error vs injected perturbation {err}"
