"""Shading frame: orthonormal basis with convenience trig in local coords.

Counterpart of include/mitsuba/core/frame.h. A Frame is a pytree of three
(..., 3) arrays; local +z is the normal.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import coordinate_system, dot, safe_sqrt, sqr
from .types import pytree_dataclass


@pytree_dataclass
class Frame:
    s: jnp.ndarray
    t: jnp.ndarray
    n: jnp.ndarray

    @staticmethod
    def from_normal(n):
        s, t = coordinate_system(n)
        return Frame(s=s, t=t, n=n)

    def to_local(self, v):
        return jnp.stack([dot(v, self.s), dot(v, self.t), dot(v, self.n)], axis=-1)

    def to_world(self, v):
        return (
            self.s * v[..., 0:1] + self.t * v[..., 1:2] + self.n * v[..., 2:3]
        )


# --- local-frame trigonometry (v assumed unit, z = cos theta) ---------------

def cos_theta(v):
    return v[..., 2]


def cos_theta_2(v):
    return sqr(v[..., 2])


def sin_theta_2(v):
    return jnp.maximum(0.0, 1.0 - sqr(v[..., 2]))


def sin_theta(v):
    return safe_sqrt(sin_theta_2(v))


def tan_theta(v):
    return sin_theta(v) / v[..., 2]


def tan_theta_2(v):
    return sin_theta_2(v) / jnp.maximum(sqr(v[..., 2]), 1e-20)


def sin_phi(v):
    s = sin_theta(v)
    return jnp.where(s > 1e-9, v[..., 1] / jnp.maximum(s, 1e-9), 0.0)


def cos_phi(v):
    s = sin_theta(v)
    return jnp.where(s > 1e-9, v[..., 0] / jnp.maximum(s, 1e-9), 1.0)


def sin_cos_phi_2(v):
    s2 = sin_theta_2(v)
    inv = jnp.where(s2 > 1e-18, 1.0 / jnp.maximum(s2, 1e-18), 0.0)
    sin2 = jnp.clip(sqr(v[..., 1]) * inv, 0.0, 1.0)
    cos2 = jnp.clip(sqr(v[..., 0]) * inv, 0.0, 1.0)
    return jnp.where(s2 > 1e-18, sin2, 0.0), jnp.where(s2 > 1e-18, cos2, 1.0)


def same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0
