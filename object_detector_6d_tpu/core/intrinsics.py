"""Pinhole camera intrinsics as a JAX pytree.

Mirrors the semantics of the reference stack's ``kinfu::Intr``
(intrinsics.hpp:15-76): fx, fy, cx, cy with a per-pyramid-level ``scale``
(level ``n`` halves the focal lengths/centers ``n`` times, matching the
``1/(1<<n)`` convention), plus ``project`` / ``reproject`` functors
(``Projector``/``Reprojector``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class Intrinsics:
    """fx, fy, cx, cy pinhole intrinsics (any float dtype / tracers)."""

    def __init__(self, fx, fy, cx, cy):
        self.fx = fx
        self.fy = fy
        self.cx = cx
        self.cy = cy

    @classmethod
    def from_matrix(cls, K) -> "Intrinsics":
        K = jnp.asarray(K)
        return cls(K[0, 0], K[1, 1], K[0, 2], K[1, 2])

    def matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(jnp.asarray(self.fx))
        o = jnp.ones_like(jnp.asarray(self.fx))
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    def scale(self, level: int) -> "Intrinsics":
        """Intrinsics for pyramid level ``level`` (kinfu::Intr::scale)."""
        s = 1.0 / (1 << level)
        return Intrinsics(self.fx * s, self.fy * s, self.cx * s, self.cy * s)

    def project(self, pts) -> jnp.ndarray:
        """Project camera-frame points ``[..., 3]`` to pixels ``[..., 2]``.

        Matches ``kinfu::Intr::Projector``: u = fx*x/z + cx, v = fy*y/z + cy.
        """
        pts = jnp.asarray(pts)
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        u = self.fx * x / z + self.cx
        v = self.fy * y / z + self.cy
        return jnp.stack([u, v], axis=-1)

    def reproject(self, u, v, z) -> jnp.ndarray:
        """Back-project pixel (u, v) at depth z to a camera-frame point.

        Matches ``kinfu::Intr::Reprojector``: x = z*(u-cx)/fx, y = z*(v-cy)/fy.
        """
        x = z * (u - self.cx) / self.fx
        y = z * (v - self.cy) / self.fy
        return jnp.stack([x, y, jnp.broadcast_to(z, jnp.shape(x))], axis=-1)

    def tree_flatten(self):
        return (self.fx, self.fy, self.cx, self.cy), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return (
            f"Intrinsics(fx={self.fx}, fy={self.fy}, "
            f"cx={self.cx}, cy={self.cy})"
        )


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(u, v) pixel-coordinate images of shape [H, W]."""
    v = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    u = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    return u, v
