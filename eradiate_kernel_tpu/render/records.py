"""Interaction and sampling records.

Counterparts of include/mitsuba/render/interaction.h:13-580 and records.h:20-182.
All records are SoA pytrees over the wavefront shape. The two-phase hit contract
is preserved: the accelerator fills a detached ``PreliminaryIntersection``; the
differentiable ``SurfaceInteraction`` is recomputed from primitive data by
``compute_surface_interaction`` (interaction.h:571-580).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.frame import Frame
from ..core.math import INVALID_T, RayEpsilon, dot, normalize
from ..core.ray import Ray
from ..core.types import pytree_dataclass


@pytree_dataclass
class PreliminaryIntersection:
    """Detached output of the ray accelerator (cf. optix_rt.cu out-buffers)."""

    t: jnp.ndarray           # (...,) inf if miss
    prim_uv: jnp.ndarray     # (..., 2) barycentric / param uv
    prim_index: jnp.ndarray  # (...,) i32 index into the family's primitive pool
    shape_index: jnp.ndarray  # (...,) i32, -1 if miss

    @property
    def is_valid(self):
        return jnp.isfinite(self.t) & (self.shape_index >= 0)


@pytree_dataclass
class SurfaceInteraction:
    """Differentiable surface interaction (interaction.h:183-360)."""

    t: jnp.ndarray            # (...,)
    p: jnp.ndarray            # (..., 3)
    n: jnp.ndarray            # (..., 3) geometric normal
    sh_frame: Frame           # shading frame (n may be interpolated)
    uv: jnp.ndarray           # (..., 2)
    prim_uv: jnp.ndarray      # (..., 2) barycentric/parametric coords
    dp_du: jnp.ndarray        # (..., 3)
    dp_dv: jnp.ndarray        # (..., 3)
    wi: jnp.ndarray           # (..., 3) incident dir, local shading frame
    wavelengths: jnp.ndarray  # (..., nw)
    time: jnp.ndarray         # (...,)
    prim_index: jnp.ndarray   # (...,) i32
    shape_index: jnp.ndarray  # (...,) i32 (-1: invalid)

    @property
    def is_valid(self):
        return self.shape_index >= 0

    def to_world(self, v):
        return self.sh_frame.to_world(v)

    def to_local(self, v):
        return self.sh_frame.to_local(v)

    def spawn_ray(self, d, maxt=None):
        """Offset along the geometric normal (interaction.h spawn_ray)."""
        scale = 1.0 + jnp.max(jnp.abs(self.p), axis=-1)
        eps = RayEpsilon * scale
        sgn = jnp.where(dot(self.n, d) >= 0.0, 1.0, -1.0)
        o = self.p + (eps * sgn)[..., None] * self.n
        if maxt is None:
            maxt = jnp.full(self.t.shape, INVALID_T, self.t.dtype)
        return Ray(o=o, d=d, mint=jnp.zeros_like(self.t), maxt=maxt,
                   time=self.time, wavelengths=self.wavelengths)

    def spawn_ray_to(self, target):
        """Shadow ray toward ``target`` with an epsilon gap at both ends
        (interaction.h spawn_ray_to). The distance/maxt are recomputed from
        the *offset* origin so the endpoint gap is independent of the
        self-intersection offset."""
        scale = 1.0 + jnp.max(jnp.abs(self.p), axis=-1)
        eps = RayEpsilon * scale
        delta0 = target - self.p
        d0 = normalize(delta0)
        sgn = jnp.where(dot(self.n, d0) >= 0.0, 1.0, -1.0)
        o = self.p + (eps * sgn)[..., None] * self.n
        delta = target - o
        dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-30))
        d = delta / dist[..., None]
        maxt = dist * (1.0 - ShadowEpsilonFactor)
        return Ray(o=o, d=d, mint=jnp.zeros_like(dist), maxt=maxt,
                   time=self.time, wavelengths=self.wavelengths), dist


ShadowEpsilonFactor = RayEpsilon * 10.0  # reference math::ShadowEpsilon


def invalid_si(batch_shape, n_wavelengths, dtype=jnp.float32):
    z3 = jnp.zeros(batch_shape + (3,), dtype)
    z = jnp.zeros(batch_shape, dtype)
    up = jnp.zeros(batch_shape + (3,), dtype).at[..., 2].set(1.0)
    return SurfaceInteraction(
        t=jnp.full(batch_shape, INVALID_T, dtype), p=z3, n=up,
        sh_frame=Frame(s=jnp.zeros_like(z3).at[..., 0].set(1.0),
                       t=jnp.zeros_like(z3).at[..., 1].set(1.0), n=up),
        uv=jnp.zeros(batch_shape + (2,), dtype),
        prim_uv=jnp.zeros(batch_shape + (2,), dtype), dp_du=z3, dp_dv=z3,
        wi=up, wavelengths=jnp.zeros(batch_shape + (n_wavelengths,), dtype),
        time=z, prim_index=jnp.zeros(batch_shape, jnp.int32),
        shape_index=jnp.full(batch_shape, -1, jnp.int32))


@pytree_dataclass
class PositionSample:
    """records.h:20 PositionSample3f."""

    p: jnp.ndarray    # (..., 3)
    n: jnp.ndarray    # (..., 3)
    uv: jnp.ndarray   # (..., 2)
    pdf: jnp.ndarray  # (...,) area measure
    delta: jnp.ndarray  # (...,) bool


@pytree_dataclass
class DirectionSample:
    """records.h:103 DirectionSample3f: a position sample seen from a
    reference point, pdf in solid-angle measure."""

    p: jnp.ndarray
    n: jnp.ndarray
    uv: jnp.ndarray
    d: jnp.ndarray       # (..., 3) ref -> target unit
    dist: jnp.ndarray    # (...,)
    pdf: jnp.ndarray     # (...,) solid angle
    delta: jnp.ndarray   # bool
    emitter_index: jnp.ndarray  # (...,) i32, -1 invalid


@pytree_dataclass
class RayDifferential:
    """Offset-ray differentials (ray.h:21-44 RayDifferential3f): the camera
    ray re-sampled one film pixel over in x and y, already pre-scaled by the
    sample-density factor 1/sqrt(spp) (Ray::scale_differential applied with
    integrator.cpp:257-261's diff_scale_factor)."""

    o_x: jnp.ndarray  # (..., 3)
    d_x: jnp.ndarray  # (..., 3)
    o_y: jnp.ndarray  # (..., 3)
    d_y: jnp.ndarray  # (..., 3)


def compute_uv_partials(si, rd):
    """SurfaceInteraction::compute_uv_partials (interaction.h:217-249):
    intersect both offset rays with the hit's tangent plane and solve the
    2x2 least-squares system projecting dp_dx/dp_dy onto (dp_du, dp_dv).
    Returns (duv_dx, duv_dy), zero where dp_du/dp_dv are degenerate."""
    d = dot(si.n, si.p)
    t_x = (d - dot(si.n, rd.o_x)) / dot(si.n, rd.d_x)
    t_y = (d - dot(si.n, rd.o_y)) / dot(si.n, rd.d_y)
    dp_dx = rd.o_x + rd.d_x * t_x[..., None] - si.p
    dp_dy = rd.o_y + rd.d_y * t_y[..., None] - si.p

    a00 = dot(si.dp_du, si.dp_du)
    a01 = dot(si.dp_du, si.dp_dv)
    a11 = dot(si.dp_dv, si.dp_dv)
    inv_det = 1.0 / (a00 * a11 - a01 * a01)
    inv_det = jnp.where(jnp.isfinite(inv_det), inv_det, 0.0)

    b0x = dot(si.dp_du, dp_dx)
    b1x = dot(si.dp_dv, dp_dx)
    b0y = dot(si.dp_du, dp_dy)
    b1y = dot(si.dp_dv, dp_dy)
    duv_dx = jnp.stack([a11 * b0x - a01 * b1x,
                        a00 * b1x - a01 * b0x], -1) * inv_det[..., None]
    duv_dy = jnp.stack([a11 * b0y - a01 * b1y,
                        a00 * b1y - a01 * b0y], -1) * inv_det[..., None]
    return duv_dx, duv_dy
