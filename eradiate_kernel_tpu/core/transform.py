"""Homogeneous 4x4 transforms.

Counterpart of include/mitsuba/core/transform.h. A Transform is stored as the
pair (matrix, inverse-transpose) exactly like the reference so that normals
transform correctly; constructors are host-side (numpy-friendly) but all
application functions are jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .math import normalize
from .types import pytree_dataclass


_PREC = jax.lax.Precision.HIGHEST  # geometry transforms stay exact f32


@pytree_dataclass
class Transform:
    m: jnp.ndarray        # (..., 4, 4)
    inv_t: jnp.ndarray    # (..., 4, 4) inverse transpose

    # -- constructors ---------------------------------------------------------
    @staticmethod
    def from_matrix(m):
        m = jnp.asarray(m, dtype=jnp.float32)
        inv = jnp.linalg.inv(m)
        return Transform(m=m, inv_t=jnp.swapaxes(inv, -1, -2))

    @staticmethod
    def identity():
        return Transform.from_matrix(np.eye(4, dtype=np.float32))

    @staticmethod
    def translate(v):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = np.asarray(v, dtype=np.float32)
        return Transform.from_matrix(m)

    @staticmethod
    def scale(v):
        v = np.broadcast_to(np.asarray(v, dtype=np.float32), (3,))
        m = np.diag(np.concatenate([v, [1.0]]).astype(np.float32))
        return Transform.from_matrix(m)

    @staticmethod
    def rotate(axis, angle_deg):
        """Rotation about an axis by an angle in degrees (reference convention)."""
        a = np.asarray(axis, dtype=np.float64)
        a = a / np.linalg.norm(a)
        th = np.deg2rad(float(angle_deg))
        c, s = np.cos(th), np.sin(th)
        x, y, z = a
        K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        R = np.eye(3) + s * K + (1 - c) * (K @ K)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = R.astype(np.float32)
        return Transform.from_matrix(m)

    @staticmethod
    def look_at(origin, target, up):
        """Camera-to-world: +z looks at target, +y is up, +x right
        (reference: transform.h ``look_at``; left-handed like Mitsuba)."""
        origin = np.asarray(origin, dtype=np.float64)
        target = np.asarray(target, dtype=np.float64)
        up = np.asarray(up, dtype=np.float64)
        dir_ = target - origin
        dir_ = dir_ / np.linalg.norm(dir_)
        left = np.cross(up / np.linalg.norm(up), dir_)
        left = left / np.linalg.norm(left)
        new_up = np.cross(dir_, left)
        m = np.eye(4, dtype=np.float32)
        m[:3, 0] = left
        m[:3, 1] = new_up
        m[:3, 2] = dir_
        m[:3, 3] = origin
        return Transform.from_matrix(m)

    @staticmethod
    def perspective(fov_deg, near, far):
        """Projective transform mapping the view frustum to [0,1]^2 in x,y
        (reference: transform.h ``perspective``)."""
        recip = 1.0 / (far - near)
        cot = 1.0 / np.tan(np.deg2rad(float(fov_deg)) / 2.0)
        m = np.array(
            [
                [cot, 0, 0, 0],
                [0, cot, 0, 0],
                [0, 0, far * recip, -near * far * recip],
                [0, 0, 1, 0],
            ],
            dtype=np.float32,
        )
        return Transform.from_matrix(m)

    # -- application ----------------------------------------------------------
    def transform_point(self, p):
        ph = jnp.matmul(self.m[..., :3, :3], p[..., None], precision=_PREC)
        ph = ph[..., 0] + self.m[..., :3, 3]
        w = jnp.sum(self.m[..., 3, :3] * p, axis=-1) + self.m[..., 3, 3]
        return ph / w[..., None]

    def transform_affine_point(self, p):
        return jnp.matmul(self.m[..., :3, :3], p[..., None], precision=_PREC)[..., 0] + self.m[..., :3, 3]

    def transform_vector(self, v):
        return jnp.matmul(self.m[..., :3, :3], v[..., None], precision=_PREC)[..., 0]

    def transform_normal(self, n):
        return jnp.matmul(self.inv_t[..., :3, :3], n[..., None], precision=_PREC)[..., 0]

    def transform_unit_vector(self, v):
        return normalize(self.transform_vector(v))

    def transform_ray(self, o, d):
        return self.transform_affine_point(o), self.transform_vector(d)

    def inverse(self):
        return Transform(m=jnp.swapaxes(self.inv_t, -1, -2),
                         inv_t=jnp.swapaxes(self.m, -1, -2))

    def __matmul__(self, other):
        return Transform(m=self.m @ other.m, inv_t=self.inv_t @ other.inv_t)

    @property
    def translation(self):
        return self.m[..., :3, 3]


def as_transform(t) -> Transform:
    """Accept Transform | 4x4 array-like | dict | list-of-dicts | None.

    Dict forms mirror the XML/dict loader's transform tags (xml.cpp Tag
    handling): {'type': 'look_at'|'translate'|'scale'|'rotate'|'matrix', ...}.
    A list of such dicts composes left-to-right like successive XML child
    tags (each new op premultiplies: last listed is applied last)."""
    if t is None:
        return Transform.identity()
    if isinstance(t, Transform):
        return t
    if isinstance(t, dict):
        kind = t["type"]
        if kind in ("look_at", "lookat"):
            return Transform.look_at(t.get("origin", [0, 0, 0]),
                                     t.get("target", [0, 0, 1]),
                                     t.get("up", [0, 1, 0]))
        if kind == "translate":
            return Transform.translate(t.get("value", [0, 0, 0]))
        if kind == "scale":
            return Transform.scale(t.get("value", 1.0))
        if kind == "rotate":
            return Transform.rotate(t.get("axis", [0, 0, 1]),
                                    t.get("angle", 0.0))
        if kind == "matrix":
            return Transform.from_matrix(np.asarray(t["value"], np.float32)
                                         .reshape(4, 4))
        raise ValueError(f"unknown transform dict type {kind!r}")
    if isinstance(t, (list, tuple)) and t and isinstance(t[0], dict):
        out = Transform.identity()
        for step in t:
            out = as_transform(step) @ out
        return out
    return Transform.from_matrix(np.asarray(t, dtype=np.float32))
