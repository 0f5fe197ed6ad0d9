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


def snowman_scene(
    width: int = 640,
    height: int = 480,
    bg_mm: int = 1500,
    cx: int = 330,
    cy: int = 250,
    scale: float = 1.0,
    depth_off_mm: int = 0,
    checker_px: int = 16,
):
    """Asymmetric object: two overlapping sphere bulges + a side ridge.

    Unlike a single sphere, this shape has no rotational symmetry, so
    point-to-plane ICP constrains all 6 DOF — the geometry detect() tests
    need (a sphere cap slides freely on a sphere).
    """
    yy, xx = np.mgrid[0:height, 0:width]
    depth = np.full((height, width), float(bg_mm))

    def bulge(bx, by, r_px, h_mm):
        r2 = (xx - bx) ** 2 + (yy - by) ** 2
        b = np.sqrt(np.maximum(0.0, r_px**2 - r2)) / r_px * h_mm
        return b

    b1 = bulge(cx, cy, 80 * scale, 300)
    b2 = bulge(cx + int(55 * scale), cy - int(35 * scale), 45 * scale, 380)
    b3 = bulge(cx - int(40 * scale), cy + int(50 * scale), 30 * scale, 200)
    total = np.maximum(np.maximum(b1, b2), b3)
    inside = total > 0
    depth = np.where(inside, bg_mm - total + depth_off_mm, depth)
    depth_u16 = np.round(depth).astype(np.uint16)
    checker = (((xx // checker_px) + (yy // checker_px)) % 2).astype(np.uint8)
    gray = np.where(inside, 60 + 140 * checker, 128).astype(np.uint8)
    return depth_u16, gray, inside


def render_translated(
    depth_u16: np.ndarray,
    mask: np.ndarray,
    K: np.ndarray,
    t_xyz_m,
    bg_mm: int = 1500,
    smooth_texture: bool = False,
):
    """Rigidly translate the masked object in 3D and re-render by z-buffer
    splatting (nearest-pixel). Returns (depth_u16, mask, gray) of the new
    scene — an exactly rigid copy of the object surface (modulo 1 mm
    depth quantization and splat rounding), unlike re-rendering the
    analytic shape at a new image position (which rescales it).
    gray carries a checkerboard texture attached to the object surface.
    """
    H, W = depth_u16.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ys, xs = np.nonzero(mask)
    z = depth_u16[ys, xs].astype(np.float64) / 1000.0
    X = (xs - cx) / fx * z + t_xyz_m[0]
    Y = (ys - cy) / fy * z + t_xyz_m[1]
    Z = z + t_xyz_m[2]
    u = np.round(X / Z * fx + cx).astype(int)
    v = np.round(Y / Z * fy + cy).astype(int)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (Z > 0)
    u, v, Z = u[ok], v[ok], Z[ok]
    xs_ok, ys_ok = xs[ok], ys[ok]
    depth = np.full((H, W), bg_mm / 1000.0)
    order = np.argsort(-Z)  # far first, near overwrites (z-buffer)
    flat = v[order] * W + u[order]
    depth.reshape(-1)[flat] = Z[order]
    new_mask = np.zeros((H, W), bool)
    new_mask.reshape(-1)[flat] = True
    # object-attached texture (from source pixel coords)
    if smooth_texture:
        tex = (127 + 90 * np.sin(xs_ok / 17.0) * np.cos(ys_ok / 23.0)).astype(np.uint8)
    else:
        checker = ((xs_ok // 16 + ys_ok // 16) % 2).astype(np.uint8)
        tex = (60 + 140 * checker).astype(np.uint8)
    gray = np.full((H, W), 128, np.uint8)
    gray.reshape(-1)[flat] = tex[order]
    # fill single-pixel holes inside the splat (median of 3x3 where hole)
    dm = np.round(depth * 1000).astype(np.uint16)
    return dm, new_mask, gray


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
