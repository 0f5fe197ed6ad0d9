#!/usr/bin/env python3
"""Device-time breakdown of the fused match program's stages (TPU).

The round-3 profile (tools/prof_detect.py) put the match stage at
~18.4 ms of the 43 ms batch-16 fused-detect execution — the largest
single slice. This tool times each internal stage with the same scan
harness (iterations chained through a data dependency, RPC floor
subtracted):

  quantize      both modalities, both pyramid levels (XLA, vmapped)
  response      fused spread+response Pallas kernel, both levels/mods
  decimate      level-1 plane decimation + pad (layout for the coarse conv)
  coarse_conv   the bf16 MXU sweep over the packed bank (both modalities)
  topk          threshold + flat top-K over [nT, gh, gw] raw scores
  refine        the sparse Pallas local-refinement sweep (level 0)
  match_full    the whole fused match program (reference total)

Run on the axon TPU: python3 tools/prof_match.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import scenes  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 16
H, W = 480, 640
RPC_FLOOR = 0.035


def log(*a):
    print(*a, flush=True)


def device_time(name, fn, args, iters=8, reps=3, floor=RPC_FLOOR):
    @jax.jit
    def many(args):
        def step(acc, _):
            out = fn(*args, acc * 1e-30)
            s = jnp.float32(0)
            for x in jax.tree_util.tree_leaves(out):
                s = s + jnp.sum(jnp.nan_to_num(x.astype(jnp.float32))) * 1e-30
            return s, None
        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
        return acc

    t0 = time.time()
    np.asarray(many(args))
    log(f"  [{name}] compile+first: {time.time()-t0:.1f}s")
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        np.asarray(many(args))
        best = min(best, time.time() - t0)
    per = (best - floor) / iters
    log(f"  [{name}] {per*1e3:8.2f} ms/exec (raw {best*1e3:.1f} ms / {iters})")
    return per


def main():
    log("devices:", jax.devices())
    from object_detector_6d_tpu.api.pipeline import PoseDetector
    from object_detector_6d_tpu.core.config import DetectParams, ICPParams
    from object_detector_6d_tpu.data.synthetic import synthetic_bank
    from object_detector_6d_tpu.match import program as mp
    from object_detector_6d_tpu.match.program import _quantize_pyramids
    from object_detector_6d_tpu.ops.response_pallas import (
        response_spread_batched,
    )
    from object_detector_6d_tpu.ops.refine_pallas import refine_sweep_batched

    K = scenes.K_DEFAULT
    pd = PoseDetector(
        params=DetectParams(match_threshold=80.0, max_hypotheses=16,
                            icp=ICPParams(iterations=32, num_levels=4)),
        model_points=512,
    )
    synthetic_bank(n_classes=12, per_class=10, bbox_px=120, seed=0,
                   detector=pd.detector)
    depA, grayA, maskA = scenes.snowman_scene()
    pd.add_view("objA", depA, K, maskA.astype(np.uint8) * 255,
                rgb=np.repeat(grayA[..., None], 3, axis=2))
    depB, grayB, maskB = scenes.snowman_scene(scale=0.78)
    pd.add_view("objB", depB, K, maskB.astype(np.uint8) * 255,
                rgb=np.repeat(grayB[..., None], 3, axis=2))
    det = pd.detector
    bank = det.get_bank(None)
    nT = bank.num_templates
    log(f"bank: {nT} templates")

    rng = np.random.RandomState(1)
    depths, rgbs = [], []
    for b in range(B):
        tA = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.04, 0.04),
                       rng.uniform(-0.04, 0.04)])
        rA = scenes.render_translated(depA, maskA, K, tA)
        d, _, g = scenes.merge_scenes([rA])
        depths.append(d)
        rgbs.append(np.repeat(g[..., None], 3, axis=2))
    depths_d = jnp.asarray(np.stack(depths))
    rgbs_d = jnp.asarray(np.stack(rgbs))
    sources_b = [rgbs_d, depths_d]

    # --- rpc floor ---
    x0 = jnp.float32(1.0)
    tiny = jax.jit(lambda x: x + 1)
    np.asarray(tiny(x0))
    floor = 1e9
    for _ in range(5):
        t0 = time.time()
        np.asarray(tiny(x0))
        floor = min(floor, time.time() - t0)
    log(f"  [rpc_floor] {floor*1e3:.1f} ms/exec")

    levels = 2
    num_mod = 2
    t0_, t1_ = det.t_at_level
    names = det.modality_names
    dn, cg = det.dn_params, det.cg_params

    # --- quantize (both modalities, both levels) ---
    def quantize_fn(rgbs, depths, eps):
        srcs = [rgbs, depths + (eps * 0).astype(depths.dtype)]
        return jax.vmap(
            lambda *s: _quantize_pyramids(list(s), names, levels, dn, cg)
        )(*srcs)

    device_time("quantize_b16", quantize_fn, (rgbs_d, depths_d), floor=floor)

    # quantized maps as inputs for downstream pieces
    qs_b = jax.jit(lambda r, d: quantize_fn(r, d, jnp.float32(0)))(
        rgbs_d, depths_d)
    qs_b = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), qs_b)

    # --- response (fused spread+response pallas), both levels/mods ---
    def response_fn(q00, q01, q10, q11, eps):
        q00 = (q00.astype(jnp.int32) + (eps * 0).astype(jnp.int32)).astype(jnp.uint8)
        return (
            response_spread_batched(q00, t0_),
            response_spread_batched(q01, t0_),
            response_spread_batched(q10, t1_),
            response_spread_batched(q11, t1_),
        )

    device_time("response_b16", response_fn,
                (qs_b[0][0], qs_b[0][1], qs_b[1][0], qs_b[1][1]), floor=floor)

    R0_b = [response_spread_batched(qs_b[0][m], t0_) for m in range(num_mod)]
    R1_b = [response_spread_batched(qs_b[1][m], t1_) for m in range(num_mod)]
    R0_b = [jnp.asarray(np.asarray(r)) for r in R0_b]
    R1_b = [jnp.asarray(np.asarray(r)) for r in R1_b]

    H1, W1 = H // 2, W // 2
    gh, gw = H1 // t1_, W1 // t1_
    Hd1, Wd1 = -(-H1 // t1_), -(-W1 // t1_)

    def decimate_l1(R):
        R = jnp.pad(R, ((0, 0), (0, Hd1 * t1_ - H1), (0, Wd1 * t1_ - W1)))
        return (
            R.reshape(8, Hd1, t1_, Wd1, t1_)
            .transpose(0, 2, 4, 1, 3)
            .reshape(8 * t1_ * t1_, Hd1, Wd1)
        )

    # --- decimation alone ---
    def decim_fn(R1a, R1b, eps):
        x = (R1a.astype(jnp.int32) + (eps * 0).astype(jnp.int32)).astype(jnp.uint8)
        return (jax.vmap(decimate_l1)(x), jax.vmap(decimate_l1)(R1b))

    device_time("decimate_b16", decim_fn, (R1_b[0], R1_b[1]), floor=floor)

    # --- coarse conv over the bank (both modalities) ---
    k_bf16 = [jnp.asarray(np.asarray(k, np.float32), jnp.bfloat16)
              for k in bank.kernels_low]

    def coarse_conv_fn(R1a, R1b, eps):
        out = None
        for mod, R1 in enumerate((R1a, R1b)):
            k = k_bf16[mod]
            kd = k.shape[3]
            D = jax.vmap(decimate_l1)(R1).astype(jnp.bfloat16) + eps.astype(jnp.bfloat16)
            need_h, need_w = gh + kd - 1, gw + kd - 1
            D = jnp.pad(D, ((0, 0), (0, 0), (0, max(0, need_h - Hd1)),
                            (0, max(0, need_w - Wd1))))
            s = jax.lax.conv_general_dilated(
                D, k, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32,
            )[:, :, :gh, :gw].astype(jnp.int32)
            out = s if out is None else out + s
        return out

    device_time("coarse_conv_b16", coarse_conv_fn, (R1_b[0], R1_b[1]),
                floor=floor)

    # int8 variant: D values are 0..4 and kernels small one-hot counts,
    # so int8 x int8 -> int32 is exact; the v5e MXU runs int8 at 2x the
    # bf16 rate IF XLA lowers the conv to it (measure before wiring)
    k_i8 = [jnp.asarray(np.asarray(k, np.float32), jnp.int8)
            for k in bank.kernels_low]

    def coarse_conv_i8_fn(R1a, R1b, eps):
        out = None
        for mod, R1 in enumerate((R1a, R1b)):
            k = k_i8[mod]
            kd = k.shape[3]
            D = jax.vmap(decimate_l1)(R1).astype(jnp.int8) + (eps * 0).astype(jnp.int8)
            need_h, need_w = gh + kd - 1, gw + kd - 1
            D = jnp.pad(D, ((0, 0), (0, 0), (0, max(0, need_h - Hd1)),
                            (0, max(0, need_w - Wd1))))
            s = jax.lax.conv_general_dilated(
                D, k, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.int32,
            )[:, :, :gh, :gw]
            out = s if out is None else out + s
        return out

    device_time("coarse_conv_i8_b16", coarse_conv_i8_fn, (R1_b[0], R1_b[1]),
                floor=floor)

    raw_b = jax.jit(lambda a, b: coarse_conv_fn(a, b, jnp.float32(0)))(
        R1_b[0], R1_b[1])
    raw_b = jnp.asarray(np.asarray(raw_b))

    # --- threshold + top-K ---
    nfeat_l1 = jnp.asarray(bank.nfeat[1])
    sizes_l1 = jnp.asarray(bank.sizes[1])
    K_cap = 16

    def topk_fn(raw_b, eps):
        def one(raw):
            raw = raw + (eps * 0).astype(jnp.int32)
            wf = (sizes_l1[:, 0] - 1) // t1_ + 1
            hf = (sizes_l1[:, 1] - 1) // t1_ + 1
            span_x = (W1 // t1_) - wf
            span_y = (H1 // t1_) - hf
            rgrid = jax.lax.broadcasted_iota(jnp.int32, (nT, gh, gw), 1)
            cgrid = jax.lax.broadcasted_iota(jnp.int32, (nT, gh, gw), 2)
            in_span = (rgrid <= span_y[:, None, None]) & (cgrid <= span_x[:, None, None])
            raw = jnp.where(in_span, raw, 0)
            nf2 = (2 * nfeat_l1).astype(jnp.float32)
            raw_thr = (nf2 + 0.8 * nf2 + 0.5).astype(jnp.int32)
            above = raw > raw_thr[:, None, None]
            flat = jnp.where(above, raw, -1).reshape(-1)
            return jax.lax.top_k(flat, K_cap)
        return jax.vmap(one)(raw_b)

    device_time("topk_sort_b16", topk_fn, (raw_b,), floor=floor)

    from object_detector_6d_tpu.match.program import exact_topk

    def topk_argmax_fn(raw_b, eps):
        def one(raw):
            raw = raw + (eps * 0).astype(jnp.int32)
            flat = jnp.where(raw > 100, raw, -1).reshape(-1)
            return exact_topk(flat, K_cap)
        return jax.vmap(one)(raw_b)

    device_time("topk_argmax_b16", topk_argmax_fn, (raw_b,), floor=floor)

    # --- refine sweep (pallas) ---
    t0g = t0_
    Hd, Wd = -(-H // t0g), -(-W // t0g)

    def npow2(x):
        return 1 << (x - 1).bit_length()

    max_dr = ((bank.max_dr // 16) + 1) * 16
    Hp2 = npow2(max(Hd + 17, 32))
    Wp2 = npow2(max(Wd + 17, 128))

    def build_D(R, dtype):
        R = R.astype(dtype)
        R = jnp.pad(R, ((0, 0), (0, Hd * t0g - H), (0, Wd * t0g - W)))
        D = (R.reshape(8, Hd, t0g, Wd, t0g).transpose(0, 2, 4, 1, 3)
             .reshape(8 * t0g * t0g, Hd, Wd))
        return jnp.pad(D, ((0, 0), (0, Hp2 - Hd), (0, Wp2 - Wd)))

    tids_b = jnp.asarray(
        np.random.RandomState(2).randint(0, nT, (B, K_cap)).astype(np.int32))
    base_r = jnp.asarray(
        np.random.RandomState(3).randint(8, Hd - 40, (B, K_cap)).astype(np.int32))
    base_c = jnp.asarray(
        np.random.RandomState(4).randint(8, Wd - 40, (B, K_cap)).astype(np.int32))

    def refine_fn(R0a, R0b, eps):
        total16 = jnp.zeros((B, K_cap, 16, 16), jnp.float32)
        for mod, R0 in enumerate((R0a, R0b)):
            D_b = jax.vmap(lambda R: build_D(R, jnp.int8))(R0)
            D_b = D_b + (eps * 0).astype(jnp.int8)
            plane = bank.feat_plane[mod][tids_b]
            r0i = base_r[:, :, None] + bank.feat_dr[mod][tids_b]
            c0i = base_c[:, :, None] + bank.feat_dc[mod][tids_b]
            nfe = bank.feat_n[mod][tids_b]
            total16 = total16 + refine_sweep_batched(
                D_b, plane, r0i, c0i, nfe).astype(jnp.float32)
        return total16

    device_time("refine_b16", refine_fn, (R0_b[0], R0_b[1]), floor=floor)

    # --- full fused match (reference total) ---
    prog = mp.make_match_program(
        names, det.t_at_level, (H, W), dn, cg,
        max_candidates=K_cap, max_dr=max_dr, refine_impl="pallas", batch=B,
    )
    margs = (
        sources_b, bank.kernels_low, bank.kernels_dec,
        (bank.feat_plane, bank.feat_dr, bank.feat_dc, bank.feat_n),
        jnp.asarray(bank.nfeat[0]), jnp.asarray(bank.nfeat[1]),
        jnp.asarray(bank.sizes[0]), jnp.asarray(bank.sizes[1]),
    )

    def match_fn(sources, *rest):
        *bank_args, eps = rest
        return prog(sources, *bank_args, jnp.float32(80.0) + eps)

    device_time("match_full_b16", match_fn, margs, floor=floor)


if __name__ == "__main__":
    main()
