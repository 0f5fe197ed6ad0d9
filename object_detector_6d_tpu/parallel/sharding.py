"""Multi-chip sharding: template-bank TP x frame DP over a jax Mesh.

The reference is a single-process CPU pipeline (SURVEY.md section 2.3);
its scaling axes are the template bank and the frame/camera stream. The
TPU-native mapping:

* **data axis (DP)**: frames/cameras shard over ``data`` — each device
  quantizes and builds response maps for its own frames (configs 4-5:
  multi-camera streaming, YCB multi-object).
* **model axis (TP)**: the packed template bank shards over ``model`` —
  each device sweeps its template shard against (replicated) response
  maps of its frame shard, then candidates merge with one
  ``all_gather`` + top-k over the model axis (the only collective in
  the coarse path — it rides ICI).
* **hypothesis axis (SP-analog)**: the ICP hypothesis batch also shards
  over ``model`` (hypotheses are embarrassingly parallel; one
  ``all_gather`` collects refined poses).

Everything is expressed with ``shard_map`` over a ``jax.sharding.Mesh``
so XLA inserts the collectives; no custom transport exists or is needed.
Tested on a CPU-simulated mesh (tests/test_sharding.py) and dry-run by
the driver via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from object_detector_6d_tpu.match.response import response_maps, spread


def make_mesh(n_devices: int | None = None) -> Mesh:
    """2D (data, model) mesh over the available devices.

    Raises a clear error when the runtime exposes fewer devices than
    requested (e.g. asking for 8 with one real chip visible) — callers
    that need a virtual mesh must provision it via ``JAX_PLATFORMS=cpu``
    + ``--xla_force_host_platform_device_count`` *before* jax initializes
    (see tests/conftest.py and __graft_entry__.dryrun_multichip).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh({n}) needs {n} devices but jax.devices() has "
            f"{len(devs)} ({jax.default_backend()} backend). Provision a "
            "virtual CPU mesh with JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before "
            "jax initializes."
        )
    devs = devs[:n]
    # square-ish factorization: model (TP) axis gets the larger factor
    tp = 1
    for cand in (2, 4, 8):
        if n % cand == 0 and n // cand <= cand:
            tp = cand
            break
    else:
        for cand in (8, 4, 2):
            if n % cand == 0:
                tp = cand
                break
    dp = n // tp
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def sharded_coarse_match(mesh: Mesh, t_stride: int, top_k: int = 16):
    """Builds the sharded coarse sweep:

    frames' quantized images shard over ``data``; one-hot template
    kernels shard over ``model``; returns per-frame global top-k
    (scores, template ids, grid positions) after an all_gather over the
    model axis.
    """

    def local_sweep(q_frames, kernels, nfeat):
        # q_frames: [Bl, H, W] u8 (local frames)
        # kernels:  [Tl, 8, kh, kw] f32 (local template shard)
        def per_frame(q):
            R = response_maps(spread(q, t_stride)).astype(jnp.bfloat16)
            H, W = q.shape
            gh, gw = H // t_stride, W // t_stride
            kh, kw = kernels.shape[2], kernels.shape[3]
            need_h = (gh - 1) * t_stride + kh
            need_w = (gw - 1) * t_stride + kw
            Rp = jnp.pad(
                R[None],
                ((0, 0), (0, 0), (0, max(0, need_h - H)), (0, max(0, need_w - W))),
            )
            raw = jax.lax.conv_general_dilated(
                Rp,
                kernels.astype(jnp.bfloat16),
                window_strides=(t_stride, t_stride),
                padding="VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32,
            )[0]
            pct = raw * 100.0 / (4.0 * nfeat[:, None, None].astype(jnp.float32))
            flat = pct.reshape(-1)
            v, i = jax.lax.top_k(flat, top_k)
            gh_gw = gh * gw
            tid_local = i // gh_gw
            # global template id: offset by this shard's position
            shard = jax.lax.axis_index("model")
            tid = tid_local + shard * kernels.shape[0]
            return v, tid, i % gh_gw

        v, tid, pos = jax.vmap(per_frame)(q_frames)
        # merge candidates across the model axis: all_gather + re-top-k
        v_all = jax.lax.all_gather(v, "model", axis=1, tiled=True)  # [Bl, tp*k]
        tid_all = jax.lax.all_gather(tid, "model", axis=1, tiled=True)
        pos_all = jax.lax.all_gather(pos, "model", axis=1, tiled=True)
        vbest, sel = jax.lax.top_k(v_all, top_k)
        tbest = jnp.take_along_axis(tid_all, sel, axis=1)
        pbest = jnp.take_along_axis(pos_all, sel, axis=1)
        return vbest, tbest, pbest

    return shard_map(
        local_sweep,
        mesh=mesh,
        in_specs=(P("data"), P("model"), P("model")),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )


def sharded_icp_step(mesh: Mesh):
    """One sharded point-to-plane ICP iteration over a hypothesis batch.

    Hypotheses shard over the ``model`` axis, frames over ``data``; each
    device refines its hypothesis shard against the (replicated within
    its data row) scene cloud, and refined poses all_gather back.
    """
    from object_detector_6d_tpu.refine.icp import _p2pl_step

    def local_icp(poses, model_pc, scene_pc):
        # poses: [Hl, 4, 4] local hypothesis shard (already per-frame)
        scene_pts = jnp.nan_to_num(scene_pc[:, :3])
        scene_nrm = jnp.nan_to_num(scene_pc[:, 3:6])
        valid = jnp.isfinite(scene_pc).all(-1)
        mask = jnp.ones(model_pc.shape[0], bool)

        def one(pose):
            new_pose, upd, res = _p2pl_step(
                pose, model_pc, scene_pts, scene_nrm, valid, mask, jnp.float32(2.5)
            )
            return new_pose, res

        new_poses, residuals = jax.vmap(one)(poses)
        return (
            jax.lax.all_gather(new_poses, "model", axis=0, tiled=True),
            jax.lax.all_gather(residuals, "model", axis=0, tiled=True),
        )

    return shard_map(
        local_icp,
        mesh=mesh,
        in_specs=(P("model"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
