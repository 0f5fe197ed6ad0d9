#!/usr/bin/env python3
"""Attribute the non-device half of detect() wall time (VERDICT r04 #1).

BENCH_r04 measured marginal 116.9 ms/batch-32 under G=4 scanned
executions against ~2 x 24.28 = 48.6 ms/batch-32 of device time — over
half the steady-state cost was unattributed host/tunnel overhead. This
tool decomposes the marginal cost of one multi-execution (the headline
retrieval mode) into independently-timed pieces:

  device     chip execution time (bench.bench_device_split's scan-chain
             harness, re-run here with the r05 inf-sanitized reducer)
  dispatch   host time to enqueue n executions WITHOUT retrieving
  transfer   device->host RPC of the completed flat result block
             (np.asarray on handles whose execution already finished)
  finalize   host-side Python post-processing per batch
             (_finalize_host on an already-transferred numpy block)

and sweeps G (frame-batches per execution) at fixed B: if the tunnel
serializes executions, marginal_exec(G) ~= RTT + G * per_batch — the
intercept is the per-execution overhead, the slope the true per-batch
cost. Compile+first lines double as the persistent-cache check
(VERDICT r04 #7): a warm .jax_cache should load the G=4 program in
seconds, not the ~60 s BENCH_r04 paid.

Run ON THE TPU: JAX_PLATFORMS=axon python3 tools/prof_host.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 32


def log(*a):
    print(*a, flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log("devices:", jax.devices())
    import bench

    pd, K, make_frames = bench.build_detector(jnp)
    inputs = [make_frames(B, seed) for seed in range(4)]

    # --- device time (scan-chained, inf-sanitized reducer) -------------
    split = bench.bench_device_split(jax, jnp, pd, K, make_frames, B=16)
    dev_ms_b32 = split["detect_full"] * 2.0
    log(f"[device] detect_full {split['detect_full']:.2f} ms/batch-16 "
        f"-> ~{dev_ms_b32:.1f} ms/batch-32 (split harness)")

    # --- host finalize (pure Python, input already on host) ------------
    G0 = 4
    dg = jnp.stack([inputs[g % 4][0] for g in range(G0)])
    rg = jnp.stack([inputs[g % 4][1] for g in range(G0)])
    t0 = time.time()
    h = pd.detect_fused_dispatch_multi(dg, K, rg)
    big = np.asarray(h[1])
    log(f"[compile] G=4 multi compile+first: {time.time()-t0:.1f}s "
        f"(cache check: BENCH_r04 paid 60.5s cold)")
    (_tag, _fl, _G, _B, K_cap, bank, depths_g, rgbs_g, _K, cids, thr) = h
    subs = [
        (None, B, K_cap, bank, depths_g[g], rgbs_g[g], K, cids, thr)
        for g in range(G0)
    ]
    for g in range(G0):
        pd._finalize_host(big[g], subs[g])  # warm
    reps = 6
    t0 = time.time()
    for _ in range(reps):
        for g in range(G0):
            pd._finalize_host(big[g], subs[g])
    fin_ms = (time.time() - t0) / (reps * G0) * 1e3
    log(f"[finalize] host post-processing: {fin_ms:.1f} ms/batch-{B} "
        f"({fin_ms / B * 1e3:.0f} us/frame, flat block {big[0].nbytes/1024:.0f}"
        f" KiB/batch)")

    # --- G sweep --------------------------------------------------------
    results = {}
    for G in (1, 2, 4, 8):
        multis = []
        for m in range(2):
            dg = jnp.stack([inputs[(2 * m + g) % 4][0] for g in range(G)])
            rg = jnp.stack([inputs[(2 * m + g) % 4][1] for g in range(G)])
            multis.append((dg, rg))

        def dispatch(i):
            return pd.detect_fused_dispatch_multi(
                multis[i % 2][0], K, multis[i % 2][1])

        t0 = time.time()
        np.asarray(dispatch(0)[1])
        log(f"[compile] G={G} compile+first: {time.time()-t0:.1f}s")

        # dispatch-only: enqueue n executions, no retrieval in the loop
        n = 6
        t0 = time.time()
        hs = [dispatch(i) for i in range(n)]
        disp_ms = (time.time() - t0) / n * 1e3
        # drain: sync on the LAST execution — the tunnel serializes, so
        # when it finishes every earlier one has finished too
        np.asarray(hs[-1][1])
        # transfer-only: results are complete; each np.asarray is a pure
        # result RPC (fresh handles — jax caches _npy_value per array)
        t0 = time.time()
        for hh in hs[:-1]:
            np.asarray(hh[1])
        xfer_ms = (time.time() - t0) / (n - 1) * 1e3

        def run_xfer(n):
            t0 = time.time()
            hs = [dispatch(i) for i in range(n)]
            for hh in hs:
                np.asarray(hh[1])
            return time.time() - t0

        def run_full(n):
            t0 = time.time()
            hs = [dispatch(i) for i in range(n)]
            for hh in hs:
                pd.detect_fused_finalize_multi(hh)
            return time.time() - t0

        run_xfer(2)  # steady-state warmup
        t2 = run_xfer(2)
        t6 = run_xfer(6)
        marg_x = (t6 - t2) / 4 * 1e3
        t2f = run_full(2)
        t6f = run_full(6)
        marg_f = (t6f - t2f) / 4 * 1e3
        results[G] = (disp_ms, xfer_ms, marg_x, marg_f)
        log(f"[G={G}] per-execution: dispatch {disp_ms:.1f} ms, "
            f"transfer(done) {xfer_ms:.1f} ms, marginal xfer-only "
            f"{marg_x:.1f} ms, marginal full {marg_f:.1f} ms "
            f"(per batch-{B}: xfer-only {marg_x/G:.1f}, full {marg_f/G:.1f})")

    # --- linear fit of the xfer-only marginal: overhead + G*per_batch ---
    Gs = np.array(sorted(results))
    y = np.array([results[g][2] for g in Gs])
    A = np.stack([np.ones_like(Gs), Gs], -1).astype(float)
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    log(f"\n[fit] marginal_exec(G) ~= {coef[0]:.1f} ms + G * {coef[1]:.1f} "
        f"ms/batch-{B}  (device split says {dev_ms_b32:.1f} ms/batch-32)")
    log(f"[fit] per-execution overhead {coef[0]:.1f} ms; host finalize adds "
        f"{fin_ms:.1f} ms/batch on top of the xfer-only marginal when "
        f"it does not overlap dispatch")


if __name__ == "__main__":
    main()
