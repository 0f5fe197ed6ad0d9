"""Fused per-frame match program: one jitted XLA program per frame.

The host-orchestrated path in api/detector.py makes ~20 small device
calls per frame; through a remote PJRT tunnel each round-trip costs more
than the math. This module fuses the entire hot path into a single jit:

    raw frames -> quantize (both modalities, both levels) -> spread ->
    response maps -> coarse MXU conv sweep over the global template bank
    -> device-side top-K candidate selection -> vmapped 16x16 local
    refinement -> fixed-size candidate arrays

Only the final [K]-sized arrays leave the device. Semantics are
identical to api/detector.py (same oracle-parity rules); the only
difference is the static candidate capacity ``max_candidates`` — the
program also returns the total number of above-threshold coarse
candidates so callers can detect overflow (parity guaranteed when
count <= K, which holds for realistic thresholds).

The template bank is packed once (all classes concatenated) and lives on
device; adding templates invalidates the pack.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from object_detector_6d_tpu.quant.color_gradient import quantized_orientations
from object_detector_6d_tpu.quant.depth_normal import quantized_normals
from object_detector_6d_tpu.quant.pyramid import pyr_down_u8
from object_detector_6d_tpu.match.response import response_maps, spread


@dataclasses.dataclass
class PackedBank:
    """Global template bank packed for the fused program (2 levels)."""

    class_ids: List[str]  # per global template id
    local_tids: np.ndarray  # [nT] local id within class
    # coarse level (lowest): per modality kernels over the T1-decimated
    # response planes, [nT, 8*t1^2, kd, kd] int8 — the stride-T1 sweep
    # becomes a stride-1 conv, which XLA tiles onto the MXU ~2-4x better;
    # responses are 0..4 and kernel cells are small feature counts, so
    # int8 x int8 -> int32 is exact and the v5e MXU runs it ~2.5x faster
    # than bf16 (tools/prof_match.py A/B: 2.06 vs 5.28 ms/batch-16)
    kernels_low: List[jnp.ndarray]
    # refinement level 0: per modality one-hot kernels over the decimated
    # T0 grid, [nT, 8*T0^2, max_dr+1, max_dr+1] bf16 (conv path)
    kernels_dec: List[jnp.ndarray]
    # ... and sparse per-feature arrays (pallas path): plane/dr/dc [nT, F]
    feat_plane: List[jnp.ndarray]
    feat_dr: List[jnp.ndarray]
    feat_dc: List[jnp.ndarray]
    feat_n: List[jnp.ndarray]  # [nT] feature counts per modality
    max_dr: int  # max feature cell offset at level 0
    nfeat: List[np.ndarray]  # per level: [nT] total features (all mods)
    sizes: List[np.ndarray]  # per level: [nT, 2] (w, h)

    @property
    def num_templates(self) -> int:
        return len(self.class_ids)


def pack_bank(
    class_templates: Dict[str, list], num_mod: int, levels: int, t0: int = 5,
    t1: int = 8, pad_to: int = 1,
) -> PackedBank:
    """Concatenate every class's template pyramids into one bank.

    ``pad_to``: round the bank size up to a multiple (for template-axis
    sharding over a mesh). Padding templates have zero features, so
    their raw coarse score is 0 and the strict > threshold rule
    (raw_thr >= 0) means they can never become candidates.
    """
    from object_detector_6d_tpu.quant.features import Template

    class_ids: List[str] = []
    local_tids: List[int] = []
    all_tps = []
    for cid, tps in class_templates.items():
        for i, tp in enumerate(tps):
            class_ids.append(cid)
            local_tids.append(i)
            all_tps.append(tp)
    while pad_to > 1 and len(all_tps) % pad_to:
        class_ids.append("")
        local_tids.append(-1)
        all_tps.append(
            [Template(0, 0, lvl, []) for lvl in range(levels) for _ in range(num_mod)]
        )
    nT = len(all_tps)
    nfeat: List[np.ndarray] = []
    sizes: List[np.ndarray] = []
    for lvl in range(levels):
        nf = np.zeros(nT, np.int32)
        sz = np.zeros((nT, 2), np.int32)
        for mod in range(num_mod):
            for i, t in enumerate((tp[lvl * num_mod + mod] for tp in all_tps)):
                sz[i] = (t.width, t.height)
                nf[i] += len(t.features)
        nfeat.append(nf)
        sizes.append(sz)

    # coarse (lowest level) one-hot conv kernels over the t1-decimated
    # plane layout: channel = label*t1^2 + (fy%t1)*t1 + fx%t1, spatial
    # offset (fy//t1, fx//t1) — see coarse_stage
    lowest = levels - 1
    kernels_low: List[jnp.ndarray] = []
    for mod in range(num_mod):
        tmpls = [tp[lowest * num_mod + mod] for tp in all_tps]
        kh = max((t.height for t in tmpls), default=0) + 1
        kw = max((t.width for t in tmpls), default=0) + 1
        kd = (max(kh, kw) - 1) // t1 + 1
        K = np.zeros((nT, 8 * t1 * t1, kd, kd), np.float32)
        for i, t in enumerate(tmpls):
            for f in t.features:
                plane = f.label * t1 * t1 + (f.y % t1) * t1 + (f.x % t1)
                K[i, plane, f.y // t1, f.x // t1] += 1.0
        kernels_low.append(jnp.asarray(K, dtype=jnp.int8))

    # level-0 one-hot kernels over the decimated T0 grid: channel =
    # label*T0^2 + (fy%T0)*T0 + fx%T0, spatial offset (fy//T0, fx//T0).
    max_dr = 0
    for mod in range(num_mod):
        for tp in all_tps:
            for f in tp[mod].features:
                max_dr = max(max_dr, f.y // t0, f.x // t0)
    kernels_dec: List[jnp.ndarray] = []
    for mod in range(num_mod):
        K2 = np.zeros((nT, 8 * t0 * t0, max_dr + 1, max_dr + 1), np.float32)
        for i, tp in enumerate(all_tps):
            for f in tp[mod].features:
                plane = f.label * t0 * t0 + (f.y % t0) * t0 + (f.x % t0)
                K2[i, plane, f.y // t0, f.x // t0] += 1.0
        kernels_dec.append(jnp.asarray(K2, dtype=jnp.bfloat16))

    feat_plane, feat_dr, feat_dc, feat_n = [], [], [], []
    for mod in range(num_mod):
        tmpls = [tp[mod] for tp in all_tps]
        F = max((len(t.features) for t in tmpls), default=1)
        pla = np.zeros((nT, F), np.int32)
        dra = np.zeros((nT, F), np.int32)
        dca = np.zeros((nT, F), np.int32)
        na = np.zeros((nT,), np.int32)
        for i, t in enumerate(tmpls):
            na[i] = len(t.features)
            for j, f in enumerate(t.features):
                pla[i, j] = f.label * t0 * t0 + (f.y % t0) * t0 + (f.x % t0)
                dra[i, j] = f.y // t0
                dca[i, j] = f.x // t0
        feat_plane.append(jnp.asarray(pla))
        feat_dr.append(jnp.asarray(dra))
        feat_dc.append(jnp.asarray(dca))
        feat_n.append(jnp.asarray(na))

    return PackedBank(
        class_ids,
        np.array(local_tids, np.int32),
        kernels_low,
        kernels_dec,
        feat_plane,
        feat_dr,
        feat_dc,
        feat_n,
        max_dr,
        nfeat,
        sizes,
    )


def _quantize_pyramids(sources, modality_names, levels, dn_params, cg_params):
    """Quantized images [level][modality], all inside the trace."""
    qs = [[] for _ in range(levels)]
    for name, src in zip(modality_names, sources):
        if name == "ColorGradient":
            img = src
            for lvl in range(levels):
                q, _ = quantized_orientations(img, weak_threshold=cg_params.weak_threshold)
                qs[lvl].append(q)
                if lvl + 1 < levels:
                    img = pyr_down_u8(img)
        elif name == "DepthNormal":
            q = quantized_normals(
                src,
                distance_threshold=dn_params.distance_threshold,
                difference_threshold=dn_params.difference_threshold,
            )
            for lvl in range(levels):
                qs[lvl].append(q)
                if lvl + 1 < levels:
                    q = q[::2, ::2]
        else:
            raise ValueError(name)
    return qs


def quantize_pyramids_batched(sources_b, modality_names, levels, dn_params,
                              cg_params, interpret=False):
    """Frame-batched quantize via the fused Pallas kernels.

    Same [level][modality] output structure as ``_quantize_pyramids``
    (each entry [B, H, W] u8), bit-identical results
    (ops/quantize_pallas.py; tests/test_quantize_pallas.py). Used by the
    production TPU path: the 2026-08-19 A/B (tools/prof_quant.py)
    measured CG level-0 at 0.88 ms (Pallas) vs 2.73 ms (XLA) per
    batch-16 and DN at parity, reversing the round-3 parking decision.
    Requires frame heights divisible by 16 (both pyramid levels hit the
    kernels' 8-row block alignment); callers gate on that and fall back
    to the vmapped XLA formulation otherwise.
    """
    from object_detector_6d_tpu.ops.quantize_pallas import (
        cg_quantize_batched,
        dn_quantize_batched,
    )

    qs_b = [[None] * len(modality_names) for _ in range(levels)]
    for m, (name, src_b) in enumerate(zip(modality_names, sources_b)):
        if name == "ColorGradient":
            img_b = src_b
            for lvl in range(levels):
                qs_b[lvl][m] = cg_quantize_batched(
                    img_b, float(cg_params.weak_threshold),
                    interpret=interpret)
                if lvl + 1 < levels:
                    img_b = jax.vmap(pyr_down_u8)(img_b)
        elif name == "DepthNormal":
            q_b = dn_quantize_batched(
                src_b, int(dn_params.distance_threshold),
                int(dn_params.difference_threshold), interpret=interpret)
            for lvl in range(levels):
                qs_b[lvl][m] = q_b
                if lvl + 1 < levels:
                    q_b = q_b[:, ::2, ::2]
        else:
            raise ValueError(name)
    return qs_b


def exact_topk(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k with lax.top_k's ordering via k iterative argmax passes.

    jax.lax.top_k lowers to a sort of the full array — for the coarse
    stage's flat [nT*gh*gw] score vector (~146k entries at 122
    templates) that is a serial O(N log N) cost per frame, while k
    reduce+mask passes stay memory-bound (2k linear passes over the
    vector). Ordering is identical: descending value, ties broken by
    lower index (argmax returns the FIRST maximum; the selected element
    is then sunk below every real score so later passes pick the next).
    Only valid when every real entry is > the sink value; the coarse
    stage's scores are -1 (masked) or >= 0 (raw similarity sums), and
    the sink is -2.
    """
    sink = jnp.asarray(-2, x.dtype)
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x)
        vals.append(x[i])
        idxs.append(i)
        x = x.at[i].set(sink)
    return jnp.stack(vals), jnp.stack(idxs)


def make_match_program(
    modality_names: Sequence[str],
    t_at_level: Sequence[int],
    frame_shape: Tuple[int, int],
    dn_params,
    cg_params,
    max_candidates: int = 64,
    max_dr: int = 64,
    refine_impl: str = "conv",
    batch: int | None = None,
    mesh=None,
    pallas_interpret: bool = False,
    topk_impl: str = "argmax",
):
    """Build the fused per-frame matcher.

    Returns a jitted function
        run(sources, kernels_low, kernels_dec, feat_arrays, nfeat_l0,
            nfeat_l1, sizes_l0, sizes_l1, threshold) -> [5, K+1] f32
    (or [B, 5, K+1] when ``batch`` is set — frames batched natively so
    the Pallas refinement DMA's each frame's response planes once).

    ``refine_impl``: 'conv' (XLA batch-grouped conv; works everywhere) or
    'pallas' (VMEM-resident sparse sweep kernel; TPU only, ~4x faster).
    ``max_dr`` is the bank's largest level-0 feature cell offset.
    ``pallas_interpret`` runs the Pallas kernels in interpreter mode so
    the 'pallas' path is testable on CPU (tests/test_pallas_kernels.py).
    ``topk_impl``: 'argmax' (k iterative argmax passes — exact, avoids
    sorting the flat coarse grid) or 'sort' (jax.lax.top_k); identical
    outputs (test_match.py::test_exact_topk_equals_lax).
    """
    levels = len(t_at_level)
    assert levels == 2, "fused program currently supports 2-level pyramids"
    num_mod = len(modality_names)
    H0, W0 = frame_shape
    H1, W1 = H0 // 2, W0 // 2
    t0, t1 = t_at_level
    gh, gw = H1 // t1, W1 // t1
    off0 = t0 // 2 + (t0 % 2 - 1)
    off1 = t1 // 2 + (t1 % 2 - 1)
    K_cap = max_candidates
    # decimated level-0 grid
    Hd, Wd = -(-H0 // t0), -(-W0 // t0)
    pad_cells = 16 + max_dr + 1

    def npow2(x):
        return 1 << (x - 1).bit_length()

    Hp2 = npow2(max(Hd + 17, 32))
    Wp2 = npow2(max(Wd + 17, 128))

    # level-1 decimated grid (for the coarse sweep): ceil so the partial
    # last cell row/col keeps its real response values
    Hd1, Wd1 = -(-H1 // t1), -(-W1 // t1)

    def decimate_l1(R):
        """[8, H1, W1] -> [8*t1^2, Hd1, Wd1] (zero-padded partial cells)."""
        R = jnp.pad(R, ((0, 0), (0, Hd1 * t1 - H1), (0, Wd1 * t1 - W1)))
        return (
            R.reshape(8, Hd1, t1, Wd1, t1)
            .transpose(0, 2, 4, 1, 3)
            .reshape(8 * t1 * t1, Hd1, Wd1)
        )

    use_pallas_response = refine_impl == "pallas"

    def compute_responses_batched(sources_b):
        """Frame-batched quantize + spread + response for both levels.

        Hoisted OUT of the per-frame vmap so the spread/response math can
        run as ONE Pallas kernel over the frame batch per (level,
        modality) (ops/response_pallas.py): bit-identical to the XLA
        formulation, but immune to the fusion-budget cliff that makes
        the combined XLA program ~3x slower than its parts (a vmapped
        pallas_call is unsupported, hence the restructure).
        Returns (R0_b, R1_b): per modality [B, 8, H, W] u8.
        """
        # Quantize: the fused Pallas kernels (ops/quantize_pallas.py,
        # bit-identical, tested) won the 2026-08-19 re-A/B — CG level-0
        # 0.88 ms (Pallas) vs 2.73 ms (XLA) per batch-16, DN at parity
        # (tools/prof_quant.py) — reversing the round-3 parking call
        # (the earlier loss was measured against a different fusion
        # context). Pallas path needs H0 % 16 == 0 (8-row block
        # alignment at both levels); otherwise the vmapped XLA
        # formulation remains the fallback.
        if use_pallas_response and H0 % 16 == 0:
            qs_b = quantize_pyramids_batched(
                sources_b, modality_names, levels, dn_params, cg_params,
                interpret=pallas_interpret)
        else:
            qs_b = jax.vmap(
                lambda *s: _quantize_pyramids(
                    list(s), modality_names, levels, dn_params, cg_params
                )
            )(*sources_b)
        if use_pallas_response:
            from object_detector_6d_tpu.ops.response_pallas import (
                response_spread_batched,
            )

            R0_b = [response_spread_batched(qs_b[0][m], t0,
                                            interpret=pallas_interpret)
                    for m in range(num_mod)]
            R1_b = [response_spread_batched(qs_b[1][m], t1,
                                            interpret=pallas_interpret)
                    for m in range(num_mod)]
        else:
            R0_b = [jax.vmap(lambda q: response_maps(spread(q, t0)))(qs_b[0][m])
                    for m in range(num_mod)]
            R1_b = [jax.vmap(lambda q: response_maps(spread(q, t1)))(qs_b[1][m])
                    for m in range(num_mod)]
        return R0_b, R1_b

    def coarse_stage(R0, R1, kernels_low, nfeat_l1, sizes_l1, threshold):
        """Single frame: precomputed responses -> coarse sweep -> top-K."""
        raw = None
        for mod in range(num_mod):
            k = kernels_low[mod]  # [nT, 8*t1^2, kd, kd] int8
            kd = k.shape[3]
            # stride-T1 sweep == stride-1 conv over the decimated planes:
            # score[t,r,c] = sum_f R1[l, r*t1+fy, c*t1+fx]
            #              = sum_f D[l*t1^2+(fy%t1)*t1+fx%t1, r+fy//t1, c+fx//t1]
            # int8 x int8 -> int32 is exact here (responses 0..4, kernel
            # cells small counts) and runs the v5e MXU at 2x the bf16 rate.
            D = decimate_l1(R1[mod]).astype(jnp.int8)
            need_h = gh + kd - 1
            need_w = gw + kd - 1
            D = jnp.pad(
                D,
                ((0, 0), (0, max(0, need_h - Hd1)), (0, max(0, need_w - Wd1))),
            )[None]
            s = jax.lax.conv_general_dilated(
                D,
                k,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.int32,
            )[0, :, :gh, :gw]
            raw = s if raw is None else raw + s

        nT = raw.shape[0]
        # per-template valid span at level 1 (oracle similarity() bounds)
        wf = (sizes_l1[:, 0] - 1) // t1 + 1
        hf = (sizes_l1[:, 1] - 1) // t1 + 1
        span_x = (W1 // t1) - wf  # inclusive
        span_y = (H1 // t1) - hf
        rgrid = jax.lax.broadcasted_iota(jnp.int32, (nT, gh, gw), 1)
        cgrid = jax.lax.broadcasted_iota(jnp.int32, (nT, gh, gw), 2)
        in_span = (rgrid <= span_y[:, None, None]) & (cgrid <= span_x[:, None, None])
        raw = jnp.where(in_span, raw, 0)
        # raw threshold: int(2nf + thr/100*2nf + 0.5), f32 exact
        nf2 = (2 * nfeat_l1).astype(jnp.float32)
        raw_thr = (
            nf2
            + threshold.astype(jnp.float32) / jnp.float32(100.0) * nf2
            + jnp.float32(0.5)
        ).astype(jnp.int32)

        above = raw > raw_thr[:, None, None]
        n_above = jnp.sum(above.astype(jnp.int32))
        flat_score = jnp.where(above, raw, -1).reshape(-1)
        if topk_impl == "argmax":
            top_vals, top_idx = exact_topk(flat_score, K_cap)
        else:
            top_vals, top_idx = jax.lax.top_k(flat_score, K_cap)
        valid = top_vals > -1
        tids = top_idx // (gh * gw)
        rc = top_idx % (gh * gw)
        xs = (rc % gw) * t1 + off1
        ys = (rc // gw) * t1 + off1
        return tids, valid, n_above, xs, ys, top_vals

    def anchors_stage(tids, xs, ys, sizes_l0):
        border = 8 * t0
        tw = sizes_l0[tids, 0]
        th = sizes_l0[tids, 1]
        x2 = jnp.minimum(jnp.maximum(xs * 2 + 1, border), W0 - tw - border)
        y2 = jnp.minimum(jnp.maximum(ys * 2 + 1, border), H0 - th - border)
        return x2, y2, x2 // t0 - 8, y2 // t0 - 8

    def build_D(R, dtype):
        """Response map [8, H0, W0] -> decimated planes [8*t0^2, Hp2, Wp2]."""
        R = R.astype(dtype)
        R = jnp.pad(R, ((0, 0), (0, Hd * t0 - H0), (0, Wd * t0 - W0)))
        D = (
            R.reshape(8, Hd, t0, Wd, t0)
            .transpose(0, 2, 4, 1, 3)
            .reshape(8 * t0 * t0, Hd, Wd)
        )
        return jnp.pad(D, ((0, 0), (0, Hp2 - Hd), (0, Wp2 - Wd)))

    def refine_conv(R0, kernels_dec, tids, base_r, base_c):
        total16 = jnp.zeros((K_cap, 16, 16), jnp.float32)
        for mod in range(num_mod):
            D = build_D(R0[mod], jnp.bfloat16)
            kc = kernels_dec[mod][tids]  # [K, P, kd, kd] bf16
            kd = kc.shape[2]
            win = 16 + kd - 1

            def window(br, bc):
                return jax.lax.dynamic_slice(D, (0, br, bc), (D.shape[0], win, win))

            wins = jax.vmap(window)(base_r, base_c)
            s16 = jax.lax.conv_general_dilated(
                wins,
                kc,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                batch_group_count=K_cap,
                preferred_element_type=jnp.float32,
            )[0]
            total16 = total16 + s16
        return total16

    def post_stage(total16, tids, valid, n_above, x2, y2, nfeat_l0, threshold,
                   raw_vals, tid_offset):
        """Pack results. Row 5 carries the raw coarse score so a sharded
        caller can re-merge local top-Ks by the same criterion the
        single-device top_k used; unsharded callers drop it."""
        nf0 = nfeat_l0[tids].astype(jnp.float32)
        pct16 = total16 * jnp.float32(100.0) / (jnp.float32(4.0) * nf0[:, None, None])
        best_flat = jnp.argmax(pct16.reshape(K_cap, -1), axis=1)
        best_r = best_flat // 16
        best_c = best_flat % 16
        best = jnp.take_along_axis(
            pct16.reshape(K_cap, -1), best_flat[:, None], axis=1
        )[:, 0]
        nx = (x2 // t0 - 8 + best_c) * t0 + off0
        ny = (y2 // t0 - 8 + best_r) * t0 + off0
        keep = valid & (best >= threshold.astype(jnp.float32))
        packed = jnp.stack(
            [
                nx.astype(jnp.float32),
                ny.astype(jnp.float32),
                best,
                (tids + tid_offset).astype(jnp.float32),
                keep.astype(jnp.float32),
                raw_vals.astype(jnp.float32),
            ],
            axis=0,
        )  # [6, K]
        n_col = jnp.full((6, 1), n_above.astype(jnp.float32))
        return jnp.concatenate([packed, n_col], axis=1)  # [6, K+1]

    def core(
        sources,
        kernels_low,
        kernels_dec,
        feat_arrays,
        nfeat_l0,
        nfeat_l1,
        sizes_l0,
        sizes_l1,
        threshold,
        tid_offset=0,
    ):
        """Single frame, full pipeline -> [6, K+1] (row 5 = raw score).

        All bank inputs may be a template-axis SHARD; ``tid_offset``
        relabels output template ids to global ids."""
        R0_b, R1_b = compute_responses_batched([s[None] for s in sources])
        R0 = [r[0] for r in R0_b]
        R1 = [r[0] for r in R1_b]
        tids, valid, n_above, xs, ys, raw_vals = coarse_stage(
            R0, R1, kernels_low, nfeat_l1, sizes_l1, threshold
        )
        x2, y2, base_c, base_r = anchors_stage(tids, xs, ys, sizes_l0)
        if refine_impl == "pallas":
            from object_detector_6d_tpu.ops.refine_pallas import refine_sweep

            feat_plane, feat_dr, feat_dc, feat_n = feat_arrays
            total16 = jnp.zeros((K_cap, 16, 16), jnp.float32)
            for mod in range(num_mod):
                D = build_D(R0[mod], jnp.int8)
                plane = feat_plane[mod][tids]
                r0i = base_r[:, None] + feat_dr[mod][tids]
                c0i = base_c[:, None] + feat_dc[mod][tids]
                # invalid top-K slots sweep zero features (kernel skips them)
                nfe = jnp.where(valid, feat_n[mod][tids], 0)
                total16 = total16 + refine_sweep(
                    D, plane, r0i, c0i, nfe, interpret=pallas_interpret
                ).astype(jnp.float32)
        else:
            total16 = refine_conv(R0, kernels_dec, tids, base_r, base_c)
        return post_stage(total16, tids, valid, n_above, x2, y2, nfeat_l0,
                          threshold, raw_vals, tid_offset)

    def core_batched(sources, *args, **kw):
        """vmap of core over the frame axis, Pallas-aware (the refine
        kernel must see the whole frame batch in ONE pallas_call; a
        vmapped pallas_call is unsupported on TPU)."""
        if refine_impl != "pallas":
            return jax.vmap(lambda s: core(s, *args, **kw))(sources)
        kernels_low, kernels_dec, feat_arrays = args[0], args[1], args[2]
        nfeat_l0, nfeat_l1, sizes_l0, sizes_l1, threshold = args[3:8]
        tid_offset = kw.get("tid_offset", 0)
        from object_detector_6d_tpu.ops.refine_pallas import refine_sweep_batched

        R0_b, R1_b = compute_responses_batched(sources)
        pre = jax.vmap(
            lambda r0, r1: coarse_stage(
                r0, r1, kernels_low, nfeat_l1, sizes_l1, threshold
            )
        )(R0_b, R1_b)
        tids_b, valid_b, n_above_b, xs_b, ys_b, raw_b = pre
        x2_b, y2_b, base_c_b, base_r_b = jax.vmap(
            lambda t, x, y: anchors_stage(t, x, y, sizes_l0)
        )(tids_b, xs_b, ys_b)
        B = tids_b.shape[0]
        feat_plane, feat_dr, feat_dc, feat_n = feat_arrays
        total16 = jnp.zeros((B, K_cap, 16, 16), jnp.float32)
        for mod in range(num_mod):
            D_b = jax.vmap(lambda R: build_D(R, jnp.int8))(R0_b[mod])
            plane = feat_plane[mod][tids_b]
            r0i = base_r_b[:, :, None] + feat_dr[mod][tids_b]
            c0i = base_c_b[:, :, None] + feat_dc[mod][tids_b]
            # invalid top-K slots sweep zero features (kernel skips them)
            nfe = jnp.where(valid_b, feat_n[mod][tids_b], 0)
            total16 = total16 + refine_sweep_batched(
                D_b, plane, r0i, c0i, nfe, interpret=pallas_interpret
            ).astype(jnp.float32)
        return jax.vmap(
            lambda t16, t, v, na, x2, y2, rv: post_stage(
                t16, t, v, na, x2, y2, nfeat_l0, threshold, rv, tid_offset
            )
        )(total16, tids_b, valid_b, n_above_b, x2_b, y2_b, raw_b)

    if mesh is not None:
        return _sharded_run(mesh, core_batched, K_cap, batch)

    if batch is None:
        @jax.jit
        def run(*args):
            return core(*args)[:5]
        return run

    @jax.jit
    def run_batched(sources, *args):
        return core_batched(sources, *args)[:, :5]

    return run_batched


def merge_shard_candidates(packed_all: jnp.ndarray, K_cap: int) -> jnp.ndarray:
    """Merge model-axis candidate shards: [tp, 6, K+1] -> [6, K+1].

    Selects the global top-K by raw coarse score (row 5) — the same
    criterion the single-device program's flat top_k used, and in the
    same tie order (shards are concatenated in global-template order, so
    the stable top_k prefers lower template ids on ties exactly like the
    flat single-device scan). ``n_above`` (the overflow count in the
    last column) sums across shards.
    """
    tp = packed_all.shape[0]
    cands = packed_all[:, :, :-1].transpose(1, 0, 2).reshape(6, tp * K_cap)
    # rank by raw score (row 5, -1 for empty slots) — NOT by the keep
    # flag: slots that were valid coarse candidates but failed
    # refinement must still occupy top-K slots exactly as on a single
    # device
    _, sel = jax.lax.top_k(cands[5], K_cap)
    merged = jnp.take_along_axis(cands, sel[None, :].repeat(6, 0), axis=1)
    n_above = jnp.sum(packed_all[:, 0, -1])
    return jnp.concatenate([merged, jnp.full((6, 1), n_above)], axis=1)


def _sharded_run(mesh, core_batched, K_cap, batch):
    """shard_map the fused program: frames over ``data``, templates over
    ``model``; each device runs the full local pipeline on its (frame
    shard x template shard), then candidates merge across the model axis
    (one all_gather — the only coarse-path collective)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    dp = mesh.shape["data"]
    tp = mesh.shape["model"]
    if batch is None or batch % dp:
        raise ValueError(f"sharded program needs batch divisible by data axis "
                         f"({batch} vs {dp})")

    def local(sources, kernels_low, kernels_dec, feat_arrays,
              nfeat_l0, nfeat_l1, sizes_l0, sizes_l1, threshold):
        shard = jax.lax.axis_index("model")
        n_local = nfeat_l0.shape[0]
        packed_l = core_batched(
            sources, kernels_low, kernels_dec, feat_arrays,
            nfeat_l0, nfeat_l1, sizes_l0, sizes_l1, threshold,
            tid_offset=shard * n_local,
        )  # [Bl, 6, K+1]
        packed_all = jax.lax.all_gather(packed_l, "model")  # [tp, Bl, 6, K+1]
        return jax.vmap(
            lambda pa: merge_shard_candidates(pa, K_cap),
            in_axes=1,
        )(packed_all)  # [Bl, 6, K+1]

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data"),  # sources (pytree leaves share the frame axis)
            P("model"), P("model"), P("model"),
            P("model"), P("model"), P("model"), P("model"), P(),
        ),
        out_specs=P("data"),
        check_vma=False,
    )

    @jax.jit
    def run(sources, *args):
        return sharded(sources, *args)[:, :5]

    return run
