#!/usr/bin/env python3
"""Sub-stage device-time breakdown of the quantize stage (TPU).

tools/prof_match.py put quantize at ~10.8 ms of the 17.2 ms batch-16
match program (2026-08-18) — the largest single slice of fused detect.
This splits it:

  cg_l0        ColorGradient quantize, 640x480 (blur+sobel+atan2+vote)
  cg_pyr       pyr_down_u8 of the BGR image (to build level 1)
  cg_l1        ColorGradient quantize at 320x240
  dn_ring      DepthNormal ring gradient + binning (no median)
  dn_median    the 5x5 one-hot median alone
  dn_full      quantized_normals (ring + bins + median)
  quant_all    the production _quantize_pyramids (reference total)

Run on the axon TPU: python3 tools/prof_quant.py
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


def log(*a):
    print(*a, flush=True)


def device_time(name, fn, args, iters=8, reps=3, floor=0.035):
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
    from object_detector_6d_tpu.core.config import (ColorGradientParams,
                                                    DepthNormalParams)
    from object_detector_6d_tpu.ops.median import median5_onehot_u8
    from object_detector_6d_tpu.quant.color_gradient import (
        quantized_orientations)
    from object_detector_6d_tpu.quant.depth_normal import (interior_mask,
                                                           quantized_normals,
                                                           ring_gradient)
    from object_detector_6d_tpu.quant.pyramid import pyr_down_u8
    from object_detector_6d_tpu.match.program import _quantize_pyramids

    rng = np.random.RandomState(0)
    dep, gray, mask = scenes.snowman_scene()
    deps = jnp.asarray(np.stack([dep] * B))
    bgrs = jnp.asarray(
        rng.randint(0, 256, (B, H, W, 3), dtype=np.int64).astype(np.uint8))

    # rpc floor
    tiny = jax.jit(lambda x: x + 1)
    x0 = jnp.float32(1.0)
    np.asarray(tiny(x0))
    floor = 1e9
    for _ in range(5):
        t0 = time.time()
        np.asarray(tiny(x0))
        floor = min(floor, time.time() - t0)
    log(f"  [rpc_floor] {floor*1e3:.1f} ms/exec")

    def cg_l0(bgrs, eps):
        b = (bgrs.astype(jnp.int32) + (eps * 0).astype(jnp.int32)).astype(jnp.uint8)
        return jax.vmap(lambda im: quantized_orientations(im)[0])(b)

    device_time("cg_l0_b16", cg_l0, (bgrs,), floor=floor)

    def cg_pyr(bgrs, eps):
        b = (bgrs.astype(jnp.int32) + (eps * 0).astype(jnp.int32)).astype(jnp.uint8)
        return jax.vmap(pyr_down_u8)(b)

    device_time("cg_pyr_b16", cg_pyr, (bgrs,), floor=floor)

    bgrs1 = jax.jit(jax.vmap(pyr_down_u8))(bgrs)
    bgrs1 = jnp.asarray(np.asarray(bgrs1))

    def cg_l1(bgrs1, eps):
        b = (bgrs1.astype(jnp.int32) + (eps * 0).astype(jnp.int32)).astype(jnp.uint8)
        return jax.vmap(lambda im: quantized_orientations(im)[0])(b)

    device_time("cg_l1_b16", cg_l1, (bgrs1,), floor=floor)

    def dn_ring(deps, eps):
        d = deps.astype(jnp.int32) + (eps * 0).astype(jnp.int32)

        def one(d):
            ddx, ddy, det = ring_gradient(d, 50)
            return ddx + ddy + det

        return jax.vmap(one)(d)

    device_time("dn_ring_b16", dn_ring, (deps,), floor=floor)

    q0 = jax.jit(jax.vmap(lambda d: quantized_normals(d)))(deps)
    q0 = jnp.asarray(np.asarray(q0))

    def dn_median(q0, eps):
        q = (q0.astype(jnp.int32) + (eps * 0).astype(jnp.int32)).astype(jnp.uint8)
        return jax.vmap(median5_onehot_u8)(q)

    device_time("dn_median_b16", dn_median, (q0,), floor=floor)

    def dn_full(deps, eps):
        d = deps.astype(jnp.int32) + (eps * 0).astype(jnp.int32)
        return jax.vmap(quantized_normals)(d)

    device_time("dn_full_b16", dn_full, (deps,), floor=floor)

    from object_detector_6d_tpu.ops.quantize_pallas import (
        cg_quantize_batched, dn_quantize_batched)

    def cg_l0_pallas(bgrs, eps):
        b = (bgrs.astype(jnp.int32) + (eps * 0).astype(jnp.int32)).astype(jnp.uint8)
        return cg_quantize_batched(b, 10.0)

    device_time("cg_l0_pallas_b16", cg_l0_pallas, (bgrs,), floor=floor)

    def dn_full_pallas(deps, eps):
        d = (deps.astype(jnp.int32) + (eps * 0).astype(jnp.int32))
        return dn_quantize_batched(d, 2000, 50)

    device_time("dn_full_pallas_b16", dn_full_pallas, (deps,), floor=floor)

    cg = ColorGradientParams()
    dn = DepthNormalParams()

    def quant_all(bgrs, deps, eps):
        b = (bgrs.astype(jnp.int32) + (eps * 0).astype(jnp.int32)).astype(jnp.uint8)
        qs = jax.vmap(
            lambda s0, s1: _quantize_pyramids(
                [s0, s1], ["ColorGradient", "DepthNormal"], 2, dn, cg)
        )(b, deps)
        return qs

    device_time("quant_all_b16", quant_all, (bgrs, deps), floor=floor)


if __name__ == "__main__":
    main()
