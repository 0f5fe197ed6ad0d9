"""Sharded template-bank TP x frame DP on the simulated 8-device mesh.

Verifies the shard_map programs produce the same numbers as the
single-device math (SURVEY.md section 4: CPU mesh via
xla_force_host_platform_device_count).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detector_6d_tpu.parallel.sharding import (
    make_mesh,
    sharded_coarse_match,
    sharded_icp_step,
)
from object_detector_6d_tpu.match.response import response_maps, spread


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"data", "model"}


def test_sharded_coarse_matches_local(mesh):
    dp, tp = mesh.devices.shape
    rng = np.random.RandomState(0)
    B, H, W, T = dp * 2, 96, 128, 8
    nT = tp * 4
    q = (1 << rng.randint(0, 8, (B, H, W))).astype(np.uint8)
    q[rng.uniform(size=(B, H, W)) < 0.7] = 0
    kh = kw = 24
    kernels = np.zeros((nT, 8, kh, kw), np.float32)
    for t in range(nT):
        for _ in range(16):
            kernels[t, rng.randint(8), rng.randint(kh), rng.randint(kw)] += 1
    nfeat = kernels.reshape(nT, -1).sum(-1).astype(np.int32)

    fn = sharded_coarse_match(mesh, t_stride=T, top_k=8)
    v, tid, pos = jax.jit(fn)(jnp.asarray(q), jnp.asarray(kernels), jnp.asarray(nfeat))
    v, tid, pos = np.asarray(v), np.asarray(tid), np.asarray(pos)

    # reference: single-device dense computation
    for b in range(B):
        R = np.asarray(response_maps(spread(jnp.asarray(q[b]), T))).astype(np.float32)
        gh, gw = H // T, W // T
        scores = np.zeros((nT, gh, gw), np.float32)
        for t in range(nT):
            for o in range(8):
                ys, xs = np.nonzero(kernels[t, o])
                for y, x in zip(ys, xs):
                    kcount = kernels[t, o, y, x]
                    for r in range(gh):
                        for c in range(gw):
                            yy, xx = r * T + y, c * T + x
                            if yy < H and xx < W:
                                scores[t, r, c] += kcount * R[o, yy, xx]
        pct = scores * 100.0 / (4.0 * nfeat[:, None, None])
        order = np.argsort(-pct.reshape(nT, -1).reshape(-1), kind="stable")[:8]
        expect_v = np.sort(pct.reshape(-1)[order])[::-1]
        got_v = np.sort(v[b])[::-1]
        np.testing.assert_allclose(got_v, expect_v, atol=1e-4)


def test_sharded_icp_step_matches_unsharded(mesh):
    from object_detector_6d_tpu.refine.icp import _p2pl_step
    from object_detector_6d_tpu.core.se3 import SE3

    dp, tp = mesh.devices.shape
    rng = np.random.RandomState(1)
    n_hyp = tp * 2
    pts = rng.uniform(-0.1, 0.1, (256, 3)).astype(np.float32)
    pts[:, 2] += 1.2
    nrm = rng.normal(size=(256, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    scene = np.concatenate([pts, nrm], -1)
    model = scene[::2].copy()
    twists = rng.uniform(-0.01, 0.01, (n_hyp, 6)).astype(np.float32)
    poses0 = np.stack([np.asarray(SE3.exp(t)) for t in twists])

    fn = sharded_icp_step(mesh)
    new_poses, residuals = jax.jit(fn)(
        jnp.asarray(poses0), jnp.asarray(model), jnp.asarray(scene)
    )
    new_poses = np.asarray(new_poses)

    # unsharded reference
    sp = jnp.asarray(scene[:, :3])
    sn = jnp.asarray(scene[:, 3:])
    sv = jnp.ones(len(scene), bool)
    mask = jnp.ones(len(model), bool)
    for h in range(n_hyp):
        ref, _, _ = _p2pl_step(
            jnp.asarray(poses0[h]), jnp.asarray(model), sp, sn, sv, mask, jnp.float32(2.5)
        )
        np.testing.assert_allclose(new_poses[h], np.asarray(ref), atol=1e-5)
