"""Interpret-mode parity for the fused quantize Pallas kernels.

ops/quantize_pallas.py claims bit-identity with the XLA quantizers
(quant/color_gradient.py, quant/depth_normal.py + ops/median.py) that
are themselves verified bit-exact against the OpenCV oracle. These
tests run the kernels with interpret=True so the claim is enforced on
CPU every suite run (SURVEY.md section 4 unit-parity pyramid; cf.
tests/test_pallas_kernels.py for the response/refine kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detector_6d_tpu.ops.quantize_pallas import (
    cg_quantize_batched,
    dn_quantize_batched,
)
from object_detector_6d_tpu.quant.color_gradient import quantized_orientations
from object_detector_6d_tpu.quant.depth_normal import quantized_normals


def _structured_bgr(rng, H, W):
    """Checkerboard + gradient + noise: exercises all 8 bins, weak and
    strong magnitudes, and channel-select ties."""
    yy, xx = np.mgrid[0:H, 0:W]
    base = ((xx // 8 + yy // 8) % 2) * 160
    ramp = (xx * 255 // W).astype(np.int64)
    img = np.stack(
        [base + rng.randint(0, 40, (H, W)),
         ramp + rng.randint(0, 40, (H, W)),
         rng.randint(0, 256, (H, W))],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("H,W", [(48, 160), (96, 130)])
def test_cg_quantize_matches_xla(H, W):
    rng = np.random.RandomState(0)
    bgrs = np.stack([_structured_bgr(rng, H, W) for _ in range(2)])
    ours = np.asarray(
        cg_quantize_batched(jnp.asarray(bgrs), 10.0, interpret=True))
    ref = np.asarray(
        jax.vmap(lambda im: quantized_orientations(im, 10.0)[0])(
            jnp.asarray(bgrs)))
    np.testing.assert_array_equal(ours, ref)


def test_cg_quantize_flat_image():
    # zero gradients everywhere: all-weak, output must be all zero
    bgr = np.full((1, 48, 140, 3), 77, np.uint8)
    ours = np.asarray(cg_quantize_batched(jnp.asarray(bgr), 10.0,
                                          interpret=True))
    assert not ours.any()


def _structured_depth(rng, H, W):
    """Sloped plane + step edges + zeros: exercises the bilateral mask,
    the distance threshold, and invalid pixels."""
    yy, xx = np.mgrid[0:H, 0:W]
    d = 900 + 3 * xx + 2 * yy
    d[(xx // 16) % 3 == 0] += 80  # steps > difference_threshold
    d[H // 3:H // 2, W // 3:W // 2] = 0  # invalid hole
    d[:, -W // 5:] = 2400  # beyond distance_threshold
    d = d + rng.randint(0, 6, (H, W))
    return d.astype(np.uint16)


@pytest.mark.parametrize("H,W", [(48, 160), (96, 130)])
def test_dn_quantize_matches_xla(H, W):
    rng = np.random.RandomState(1)
    deps = np.stack([_structured_depth(rng, H, W) for _ in range(2)])
    ours = np.asarray(
        dn_quantize_batched(jnp.asarray(deps), 2000, 50, interpret=True))
    ref = np.asarray(
        jax.vmap(lambda d: quantized_normals(d, 2000, 50))(
            jnp.asarray(deps)))
    np.testing.assert_array_equal(ours, ref)


def test_dn_quantize_nondefault_params():
    rng = np.random.RandomState(2)
    deps = _structured_depth(rng, 48, 96)[None]
    ours = np.asarray(
        dn_quantize_batched(jnp.asarray(deps), 1200, 30, interpret=True))
    ref = np.asarray(quantized_normals(jnp.asarray(deps[0]), 1200, 30))[None]
    np.testing.assert_array_equal(ours, ref)
