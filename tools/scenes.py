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


def merge_scenes(rendered, bg_mm: int = 1500):
    """Z-min compose rendered (depth_u16, mask, gray) scenes.

    Each input is one object rendered over the shared background plane
    (render_translated output order); masked pixels compete by depth —
    nearer surface wins, exactly like a z-buffer — so overlapping
    objects occlude each other correctly. Returns (depth_u16, mask_any,
    gray) of the multi-object scene."""
    H, W = rendered[0][0].shape
    depth = np.full((H, W), float(bg_mm))
    gray = np.full((H, W), 128, np.uint8)
    mask_any = np.zeros((H, W), bool)
    for d, m, g in rendered:
        df = d.astype(np.float64)
        nearer = m & (df < depth)
        depth = np.where(nearer, df, depth)
        gray = np.where(nearer, g, gray)
        mask_any |= nearer
    return np.round(depth).astype(np.uint16), mask_any, gray


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


def render_posed(
    depth_u16: np.ndarray,
    mask: np.ndarray,
    K: np.ndarray,
    pose: np.ndarray,  # [4, 4] camera-frame rigid transform (model->scene)
    bg_mm: int = 1500,
    fill_holes: bool = True,
):
    """Apply a full SE(3) to the masked object and re-render (z-buffer).

    Generalizes render_translated: scene points p' = R p + t for every
    masked surface point p of the training view. Returns
    (depth_u16, mask, gray). The returned pose ground truth IS ``pose``
    (camera-frame model->scene). Rotations stretch the splat, opening
    pin-holes; ``fill_holes`` closes 1-px holes with a 3x3 neighborhood
    minimum-depth fill restricted to hole pixels surrounded by splat.
    """
    H, W = depth_u16.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    R, t = np.asarray(pose)[:3, :3], np.asarray(pose)[:3, 3]
    ys, xs = np.nonzero(mask)
    z = depth_u16[ys, xs].astype(np.float64) / 1000.0
    P = np.stack([(xs - cx) / fx * z, (ys - cy) / fy * z, z], -1)
    Q = P @ R.T + t
    u = np.round(Q[:, 0] / Q[:, 2] * fx + cx).astype(int)
    v = np.round(Q[:, 1] / Q[:, 2] * fy + cy).astype(int)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (Q[:, 2] > 0)
    u, v, Z = u[ok], v[ok], Q[:, 2][ok]
    xs_ok, ys_ok = xs[ok], ys[ok]
    depth = np.full((H, W), bg_mm / 1000.0)
    order = np.argsort(-Z)
    flat = v[order] * W + u[order]
    depth.reshape(-1)[flat] = Z[order]
    new_mask = np.zeros((H, W), bool)
    new_mask.reshape(-1)[flat] = True
    checker = ((xs_ok // 16 + ys_ok // 16) % 2).astype(np.uint8)
    tex = (60 + 140 * checker).astype(np.uint8)
    gray = np.full((H, W), 128, np.uint8)
    gray.reshape(-1)[flat] = tex[order]
    if fill_holes:
        # hole = non-splat pixel with >= 6 splat neighbors; fill with the
        # neighborhood's min depth (nearest surface wins) + median texture
        nb = np.zeros((H, W), np.int32)
        nd = np.full((H, W), np.inf)
        ng = np.zeros((H, W), np.float64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                sm = np.roll(np.roll(new_mask, dy, 0), dx, 1)
                sd = np.roll(np.roll(depth, dy, 0), dx, 1)
                sg = np.roll(np.roll(gray, dy, 0), dx, 1)
                nb += sm
                nd = np.where(sm, np.minimum(nd, sd), nd)
                ng += np.where(sm, sg, 0)
        hole = (~new_mask) & (nb >= 6)
        depth = np.where(hole, np.where(np.isfinite(nd), nd, depth), depth)
        gray = np.where(hole, (ng / np.maximum(nb, 1)).astype(np.uint8), gray)
        new_mask = new_mask | hole
    return np.round(depth * 1000).astype(np.uint16), new_mask, gray


def rot_about(axis, deg, centroid):
    """[4, 4] rotation about ``axis`` through ``centroid`` (camera frame)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(a) * Kx + (1 - np.cos(a)) * (Kx @ Kx)
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = np.asarray(centroid) - R @ np.asarray(centroid)
    return pose


def masked_centroid(depth_u16, mask, K):
    """Camera-frame centroid of the masked surface points."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ys, xs = np.nonzero(mask)
    z = depth_u16[ys, xs].astype(np.float64) / 1000.0
    P = np.stack([(xs - cx) / fx * z, (ys - cy) / fy * z, z], -1)
    return P.mean(0)


def snowman_model(points_per_sphere: int = 12000, seed: int = 0):
    """Object-frame model cloud [N, 6] (xyz + exact normals, meters).

    Three intersecting spheres (radii 80/45/30 mm, non-collinear
    centers) — the same asymmetric topology as snowman_scene but as a
    free-floating closed surface with analytically exact normals, for
    view-sphere training (api/templates.render_view) and rotation tests.
    Points inside another sphere are dropped (union surface).
    """
    rng = np.random.RandomState(seed)
    spheres = [
        (np.array([0.0, 0.0, 0.0]), 0.080),
        (np.array([0.055, -0.035, 0.020]), 0.045),
        (np.array([-0.040, 0.050, -0.015]), 0.030),
    ]
    pts, nrm = [], []
    for ci, (c, r) in enumerate(spheres):
        v = rng.normal(size=(points_per_sphere, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        p = c + r * v
        keep = np.ones(len(p), bool)
        for cj, (c2, r2) in enumerate(spheres):
            if cj != ci:
                keep &= np.linalg.norm(p - c2, axis=1) >= r2
        pts.append(p[keep])
        nrm.append(v[keep])
    return np.concatenate(
        [np.concatenate(pts), np.concatenate(nrm)], axis=1
    ).astype(np.float32)


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
