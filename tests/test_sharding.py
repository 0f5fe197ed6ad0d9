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


@pytest.mark.slow
def test_sharded_detect_program_equals_unsharded(mesh):
    """The PRODUCTION fused detect program under the mesh == single-device.

    Frames DP x template-bank TP in the match stage, hypothesis lanes
    over the model axis in the ICP stage (VERDICT round-1 item 6: shard
    the real program, not a toy)."""
    from object_detector_6d_tpu.api import detect_program as dp_mod
    from object_detector_6d_tpu.core.config import ICPParams
    from object_detector_6d_tpu.data.synthetic import synthetic_bank
    from object_detector_6d_tpu.match import program as mp

    dp, tp = mesh.devices.shape
    rng = np.random.RandomState(0)
    det = synthetic_bank(n_classes=2, per_class=2 * tp, bbox_px=40, seed=0)
    bank = mp.pack_bank(det.class_templates, 2, 2,
                        t0=det.t_at_level[0], t1=det.t_at_level[1], pad_to=tp)
    nT = bank.num_templates
    max_dr = ((bank.max_dr // 16) + 1) * 16
    B, H, W = dp * 2, 120, 160
    K_mat = np.array([[140.0, 0, W / 2], [0, 140.0, H / 2], [0, 0, 1.0]])

    N_pts = 64
    model_bank = rng.uniform(-0.05, 0.05, (nT, N_pts, 6)).astype(np.float32)
    model_bank[..., 2] += 1.0
    model_bank[..., 3:] /= np.linalg.norm(model_bank[..., 3:], axis=-1,
                                          keepdims=True)
    views = dp_mod.PackedViews(
        jnp.asarray(model_bank),
        jnp.asarray(np.tile([0.0, 0.0, 1.0], (nT, 1)).astype(np.float32)),
        jnp.asarray(np.full((nT, 2), 24, np.int32)),
        jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (nT, 1, 1))),
        jnp.asarray(np.ones(nT, bool)),
    )
    common = dict(
        max_candidates=2 * tp, max_dr=max_dr, refine_impl="conv",
        icp=ICPParams(iterations=9, num_levels=3), lift_window=48, batch=B,
    )
    prog_1dev = dp_mod.make_detect_program(
        det.modality_names, det.t_at_level, (H, W),
        det.dn_params, det.cg_params, K_mat, **common)
    prog_mesh = dp_mod.make_detect_program(
        det.modality_names, det.t_at_level, (H, W),
        det.dn_params, det.cg_params, K_mat, mesh=mesh, **common)

    bgrs = jnp.asarray(
        rng.randint(0, 256, (B, H, W, 3), dtype=np.int64).astype(np.uint8))
    deps = jnp.asarray(
        (1000 + rng.randint(0, 400, (B, H, W))).astype(np.uint16))
    args = (
        (bgrs, deps),
        bank.kernels_low, bank.kernels_dec,
        (bank.feat_plane, bank.feat_dr, bank.feat_dc, bank.feat_n),
        jnp.asarray(bank.nfeat[0]), jnp.asarray(bank.nfeat[1]),
        jnp.asarray(bank.sizes[0]), jnp.asarray(bank.sizes[1]),
        views, jnp.float32(60.0),
    )
    p1, poses1, res1, keep1 = [np.asarray(x) for x in prog_1dev(*args)]
    p2, poses2, res2, keep2 = [np.asarray(x) for x in prog_mesh(*args)]
    np.testing.assert_allclose(p1, p2, atol=1e-4)
    np.testing.assert_array_equal(keep1, keep2)
    np.testing.assert_allclose(
        np.where(np.isfinite(res1), res1, 0),
        np.where(np.isfinite(res2), res2, 0), atol=1e-5)
    # Poses: the sharded and unsharded programs fuse the f32 geometry /
    # ICP math differently (shard_map local batch 2 vs one batch-8 vmap),
    # and the gated iterative refinement amplifies ulp-level reassociation
    # into ~1e-3 pose drift along the (residual-flat) scene surface on
    # these noise frames — residuals above agree to 1e-5. Discrete
    # outputs (keep, match arrays) stay exact; poses get a drift bound.
    np.testing.assert_allclose(poses1, poses2, atol=2e-3)

    # same program with on-device scoring + cluster NMS (the production
    # pipeline path and what dryrun_multichip executes): mesh == single
    # on the flattened cluster records too
    prog_1dev_nms = dp_mod.make_detect_program(
        det.modality_names, det.t_at_level, (H, W),
        det.dn_params, det.cg_params, K_mat, device_nms=True, **common)
    prog_mesh_nms = dp_mod.make_detect_program(
        det.modality_names, det.t_at_level, (H, W),
        det.dn_params, det.cg_params, K_mat, mesh=mesh, device_nms=True,
        **common)
    index = {}
    cls_of_tid = jnp.asarray(
        np.array([index.setdefault(c, len(index)) for c in bank.class_ids],
                 np.int32))
    nms_args = args + (cls_of_tid, jnp.asarray([0.05, 0.02], jnp.float32))
    flat1 = np.asarray(prog_1dev_nms(*nms_args))
    flat2 = np.asarray(prog_mesh_nms(*nms_args))
    K_cap = common["max_candidates"]
    s1, raw1, pass1 = dp_mod.unflatten_cluster_outputs(flat1, K_cap)
    s2, raw2, pass2 = dp_mod.unflatten_cluster_outputs(flat2, K_cap)
    np.testing.assert_array_equal(raw1, raw2)
    np.testing.assert_array_equal(pass1, pass2)
    # discrete slot fields exact (valid, votes, rep tid/x/y, members);
    # continuous ones (sim, residual mean, mean pose) at the ICP drift
    # bound documented above
    for col in (0, 1, 3, 4, 5, 7):
        np.testing.assert_array_equal(s1[..., col], s2[..., col])
    np.testing.assert_allclose(s1[..., 2], s2[..., 2], atol=1e-4)
    np.testing.assert_allclose(s1[..., 6], s2[..., 6], atol=1e-5)
    np.testing.assert_allclose(s1[..., 8:], s2[..., 8:], atol=2e-3)


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
