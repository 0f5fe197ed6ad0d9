"""Interpret-mode parity tests for the production Pallas kernels.

The TPU bench path (bench.py / PoseDetector on a TPU backend) selects
``refine_impl="pallas"``, which routes through ops/response_pallas.py and
ops/refine_pallas.py — kernels the CPU suite otherwise never executes
(CPU backends select "conv"). These tests run the SAME kernels through
the Pallas interpreter (``interpret=True``), which emulates the kernel
semantics without a TPU, so a logic regression in either kernel fails
the suite on any host (VERDICT round-2 item 3; SURVEY.md section 4
unit-parity pyramid). Mosaic *lowering* bugs (alignment, stride
corruption — see the module docstrings) still need the on-TPU parity
run (tools/parity_add.py), which is what bench.py exercises.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from object_detector_6d_tpu.match.response import response_maps, spread
from object_detector_6d_tpu.ops.refine_pallas import (
    coarse_sweep,
    refine_sweep_batched,
)
from object_detector_6d_tpu.ops.response_pallas import response_spread_batched


@pytest.mark.parametrize("t", [5, 8])
def test_response_spread_bitexact(t):
    """Fused spread+response kernel == response_maps(spread(q, T)),
    bit-for-bit, over random one-hot orientation frames."""
    rng = np.random.RandomState(7 + t)
    B, H, W = 3, 48, 160
    q = (1 << rng.randint(0, 8, (B, H, W))).astype(np.uint8)
    q[rng.rand(B, H, W) < 0.35] = 0  # unquantized pixels
    got = np.asarray(response_spread_batched(jnp.asarray(q), t, interpret=True))
    want = np.asarray(
        jax.vmap(lambda x: response_maps(spread(x, t)))(jnp.asarray(q))
    )
    np.testing.assert_array_equal(got, want)


def test_response_spread_full_frame_bitexact():
    """One full 640x480 frame at the production T0=5 (edge handling at
    the real aspect ratio)."""
    rng = np.random.RandomState(3)
    q = (1 << rng.randint(0, 8, (1, 480, 640))).astype(np.uint8)
    q[rng.rand(1, 480, 640) < 0.5] = 0
    got = np.asarray(response_spread_batched(jnp.asarray(q), 5, interpret=True))
    want = np.asarray(response_maps(spread(jnp.asarray(q[0]), 5)))[None]
    np.testing.assert_array_equal(got, want)


def test_refine_sweep_batched_vs_numpy():
    """VMEM tile-accumulate kernel == direct numpy tile sums, including
    zero-feature (invalid top-K) candidates and 8-misaligned row starts."""
    rng = np.random.RandomState(11)
    B, P, Hp, Wp = 2, 6, 64, 128
    K, F = 5, 9
    D = rng.randint(0, 5, (B, P, Hp, Wp)).astype(np.int8)
    plane = rng.randint(0, P, (B, K, F)).astype(np.int32)
    r0 = rng.randint(0, Hp - 16, (B, K, F)).astype(np.int32)
    c0 = rng.randint(0, Wp - 16, (B, K, F)).astype(np.int32)
    nfeat = rng.randint(0, F + 1, (B, K)).astype(np.int32)
    nfeat[0, 0] = 0  # invalid top-K slot sweeps nothing
    got = np.asarray(
        refine_sweep_batched(
            jnp.asarray(D), jnp.asarray(plane), jnp.asarray(r0),
            jnp.asarray(c0), jnp.asarray(nfeat), interpret=True,
        )
    )
    want = np.zeros((B, K, 16, 16), np.int32)
    for b in range(B):
        for k in range(K):
            for f in range(nfeat[b, k]):
                want[b, k] += D[
                    b, plane[b, k, f],
                    r0[b, k, f]:r0[b, k, f] + 16,
                    c0[b, k, f]:c0[b, k, f] + 16,
                ].astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_coarse_sweep_vs_numpy():
    """Experimental full-grid coarse kernel == numpy roll-accumulate."""
    rng = np.random.RandomState(5)
    B, P, Hp, Wp = 1, 4, 64, 128
    nT, F, OH = 3, 6, 32
    D = rng.randint(0, 5, (B, P, Hp, Wp)).astype(np.int8)
    plane = rng.randint(0, P, (nT, F)).astype(np.int32)
    dr = rng.randint(0, Hp - OH - 8, (nT, F)).astype(np.int32)
    dc = rng.randint(0, Wp // 2, (nT, F)).astype(np.int32)
    nfeat = np.array([F, 2, 0], np.int32)
    got = np.asarray(
        coarse_sweep(
            jnp.asarray(D), jnp.asarray(plane), jnp.asarray(dr),
            jnp.asarray(dc), jnp.asarray(nfeat), out_h=OH, interpret=True,
        )
    )
    want = np.zeros((B, nT, OH, Wp), np.int32)
    for t in range(nT):
        for f in range(nfeat[t]):
            rolled = np.roll(D[0, plane[t, f]], -int(dc[t, f]), axis=1)
            want[0, t] += rolled[dr[t, f]:dr[t, f] + OH].astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_match_program_pallas_equals_conv():
    """The fused match program with refine_impl='pallas' (interpreted)
    returns exactly the conv path's [B, 5, K+1] output — covers the
    response kernel and the batched refine kernel wired end-to-end the
    way bench.py runs them on TPU."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import scenes

    from object_detector_6d_tpu.api.detector import Detector
    from object_detector_6d_tpu.match import program as mp

    det = Detector()
    K = scenes.K_DEFAULT
    dep, gray, mask = scenes.snowman_scene()
    for off in (0, 25):
        d2, m2, g2 = scenes.render_translated(
            dep, mask, K, np.array([off * 1e-3, 0.0, off * 1e-3]))
        tid, _ = det.add_template(
            [np.repeat(g2[..., None], 3, axis=2), d2], "obj",
            m2.astype(np.uint8) * 255)
        assert tid >= 0
    bank = mp.pack_bank(det.class_templates, 2, 2,
                        t0=det.t_at_level[0], t1=det.t_at_level[1])
    max_dr = ((bank.max_dr // 16) + 1) * 16
    B = 2
    t = np.array([0.03, -0.01, -0.02])
    d2, _, g2 = scenes.render_translated(dep, mask, K, t)
    bgrs = jnp.asarray(np.stack([np.repeat(gray[..., None], 3, axis=2),
                                 np.repeat(g2[..., None], 3, axis=2)]))
    deps = jnp.asarray(np.stack([dep, d2]))
    args = (
        bank.kernels_low, bank.kernels_dec,
        (bank.feat_plane, bank.feat_dr, bank.feat_dc, bank.feat_n),
        jnp.asarray(bank.nfeat[0]), jnp.asarray(bank.nfeat[1]),
        jnp.asarray(bank.sizes[0]), jnp.asarray(bank.sizes[1]),
        jnp.float32(80.0),
    )
    outs = {}
    for impl in ("conv", "pallas"):
        prog = mp.make_match_program(
            det.modality_names, det.t_at_level, (480, 640),
            det.dn_params, det.cg_params,
            max_candidates=8, max_dr=max_dr, refine_impl=impl,
            batch=B, pallas_interpret=True,
        )
        outs[impl] = np.asarray(prog([bgrs, deps], *args))
    keep = outs["conv"][:, 4, :-1] > 0
    assert keep.any(), "scene produced no matches"
    # x, y, template id, keep flag, overflow count: identical everywhere
    np.testing.assert_array_equal(outs["pallas"][:, [0, 1, 3, 4]],
                                  outs["conv"][:, [0, 1, 3, 4]])
    # similarity: identical on kept slots (the pallas kernel skips the
    # feature sweep entirely for invalid top-K slots, the conv path
    # sweeps them anyway — both are discarded by the keep flag)
    np.testing.assert_array_equal(
        np.where(keep, outs["pallas"][:, 2, :-1], 0.0),
        np.where(keep, outs["conv"][:, 2, :-1], 0.0),
    )
