"""Synthetic test scenes with analytically known geometry (numpy only).

Shared by the oracle-side golden generator (tools/gen_goldens.py, run under
/usr/bin/python3 with OpenCV 4.6 contrib) and the JAX-side tests, so both
sides see bit-identical inputs. Recipes follow SURVEY.md Appendix: the
sphere-cap + checkerboard scene exercises all 8 orientation bins of both
LINEMOD modalities.
"""

from __future__ import annotations

import numpy as np

K_DEFAULT = np.array(
    [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]],
    dtype=np.float64,
)


def sphere_scene(
    width: int = 640,
    height: int = 480,
    bg_mm: int = 1500,
    sphere_px: float = 90.0,
    sphere_cx: int = 330,
    sphere_cy: int = 250,
    sphere_top_mm: int = 1110,
    checker_px: int = 8,
):
    """Depth (u16 mm) + checkerboard gray image + object mask.

    Background plane at ``bg_mm``; a sphere cap of radius ``sphere_px``
    pixels bulging toward the camera to ``sphere_top_mm`` at its apex.
    """
    yy, xx = np.mgrid[0:height, 0:width]
    r2 = (xx - sphere_cx) ** 2 + (yy - sphere_cy) ** 2
    inside = r2 < sphere_px**2
    bulge = np.sqrt(np.maximum(0.0, sphere_px**2 - r2))
    depth = np.where(
        inside,
        bg_mm - (bg_mm - sphere_top_mm) * (bulge / sphere_px),
        float(bg_mm),
    )
    depth_u16 = np.round(depth).astype(np.uint16)

    checker = (((xx // checker_px) + (yy // checker_px)) % 2).astype(np.uint8)
    gray = np.where(inside, 60 + 140 * checker, 128).astype(np.uint8)
    return depth_u16, gray, inside


def noisy_depth(height: int = 48, width: int = 64, seed: int = 0):
    """Small noisy depth field (near-threshold deltas stress bit parity)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    base = 1000 + 50 * np.sin(yy / 5.0) * np.cos(xx / 7.0)
    d = base + rng.randint(-30, 30, (height, width))
    return np.clip(d, 1, 60000).astype(np.uint16)


def ramp_depth(az_deg: float, slope: float = 2.0, height: int = 64, width: int = 64):
    az = np.deg2rad(az_deg)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    d = 1000 + slope * (np.cos(az) * xx + np.sin(az) * yy)
    return np.clip(d, 1, 60000).astype(np.uint16)
