"""Axis-aligned bounding boxes (counterpart of include/mitsuba/core/bbox.h)."""

from __future__ import annotations

import jax.numpy as jnp

from .types import pytree_dataclass


@pytree_dataclass
class BoundingBox:
    min: jnp.ndarray  # (..., 3)
    max: jnp.ndarray  # (..., 3)

    @staticmethod
    def of_points(p):
        return BoundingBox(min=jnp.min(p, axis=-2), max=jnp.max(p, axis=-2))

    def expand(self, other):
        return BoundingBox(min=jnp.minimum(self.min, other.min),
                           max=jnp.maximum(self.max, other.max))

    def center(self):
        return 0.5 * (self.min + self.max)

    def extents(self):
        return self.max - self.min

    def surface_area(self):
        e = self.extents()
        return 2.0 * (e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 0] * e[..., 2])

    def contains(self, p):
        return jnp.all((p >= self.min) & (p <= self.max), axis=-1)

    def bounding_sphere(self):
        c = self.center()
        r = jnp.sqrt(jnp.sum((self.max - c) ** 2, axis=-1))
        return c, r


def ray_intersect_aabb(bb_min, bb_max, o, d_rcp, mint, maxt):
    """Slab test (reference: bbox.h ``ray_intersect``). Returns
    (hit, near_t, far_t); robust for axis-parallel rays via IEEE inf."""
    t1 = (bb_min - o) * d_rcp
    t2 = (bb_max - o) * d_rcp
    tmin = jnp.minimum(t1, t2)
    tmax = jnp.maximum(t1, t2)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    hit = (near <= far) & (far >= mint) & (near <= maxt)
    return hit, near, far
