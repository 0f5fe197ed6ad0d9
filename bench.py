#!/usr/bin/env python3
"""Benchmark: LINEMOD match throughput on a 120-template bank (config 2).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Baseline: the canonical CPU implementation measured at 30.6 ms/frame
(32.7 fps) for the same workload — 640x480 RGB-D frame, 2 modalities,
120 templates, 2 pyramid levels (BASELINE.md). The bank here is
synthetic but shape-identical (63+63/31+31 features, ~120 px bboxes);
match cost is data-independent (dense conv over the packed bank).

Frames are processed in device-resident batches through the fused match
program (one XLA execution per batch), the production streaming setup
(config 5); throughput = frames / wall time over many batches.
"""

import json
import sys
import time

import numpy as np

CPU_BASELINE_FPS = 32.7  # measured: oracle, 120 templates, 1-core x86


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from object_detector_6d_tpu.data.synthetic import synthetic_bank
    from object_detector_6d_tpu.match import program as mp

    log("devices:", jax.devices())
    det = synthetic_bank(n_classes=12, per_class=10, bbox_px=120, seed=0)
    bank = mp.pack_bank(det.class_templates, 2, 2, t0=det.t_at_level[0])
    log(f"bank: {bank.num_templates} templates, max_dr={bank.max_dr}")
    max_dr = ((bank.max_dr // 16) + 1) * 16
    H, W = 480, 640
    prog = mp.make_match_program(
        det.modality_names,
        det.t_at_level,
        (H, W),
        det.dn_params,
        det.cg_params,
        max_candidates=32,
        max_dr=max_dr,
        refine_impl="pallas" if jax.default_backend() == "tpu" else "conv",
        batch=8,
    )

    B = 8
    rng = np.random.RandomState(0)
    bgrs = jnp.asarray(rng.randint(0, 256, (B, H, W, 3), dtype=np.int64).astype(np.uint8))
    deps = jnp.asarray((900 + rng.randint(0, 700, (B, H, W))).astype(np.uint16))
    rest = (
        bank.kernels_low,
        bank.kernels_dec,
        (bank.feat_plane, bank.feat_dr, bank.feat_dc, bank.feat_n),
        jnp.asarray(bank.nfeat[0]),
        jnp.asarray(bank.nfeat[1]),
        jnp.asarray(bank.sizes[0]),
        jnp.asarray(bank.sizes[1]),
        jnp.float32(80.0),
    )
    batched = prog  # natively batched program

    t0 = time.time()
    out = batched((bgrs, deps), *rest)
    np.asarray(out)
    log(f"compile+first batch: {time.time()-t0:.1f}s")

    # steady-state throughput over several synced batches
    n_batches = 6
    t0 = time.time()
    for _ in range(n_batches):
        np.asarray(batched((bgrs, deps), *rest))
    dt = time.time() - t0
    fps = (n_batches * B) / dt
    log(f"steady: {dt/n_batches*1e3:.1f} ms/batch of {B} -> {fps:.1f} fps")

    print(
        json.dumps(
            {
                "metric": "LINEMOD match 640x480, 120 templates, 2 modalities",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / CPU_BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
