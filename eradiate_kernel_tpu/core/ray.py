"""Rays and ray utilities.

Counterpart of include/mitsuba/core/ray.h:21-44. A Ray batch is a pytree of
SoA arrays with a common leading wavefront shape; ``wavelengths`` carries the
hero wavelengths in spectral mode (shape (..., 4)) and is an empty placeholder
otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import RayEpsilon, dot
from .types import pytree_dataclass


@pytree_dataclass
class Ray:
    o: jnp.ndarray            # (..., 3)
    d: jnp.ndarray            # (..., 3) unit direction
    mint: jnp.ndarray         # (...,)
    maxt: jnp.ndarray         # (...,)
    time: jnp.ndarray         # (...,)
    wavelengths: jnp.ndarray  # (..., nw) or (..., 0)

    @staticmethod
    def make(o, d, mint=None, maxt=None, time=None, wavelengths=None):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        batch = jnp.broadcast_shapes(o.shape[:-1], d.shape[:-1])
        o = jnp.broadcast_to(o, batch + (3,))
        d = jnp.broadcast_to(d, batch + (3,))
        if mint is None:
            mint = jnp.full(batch, RayEpsilon, o.dtype)
        else:
            mint = jnp.broadcast_to(jnp.asarray(mint, o.dtype), batch)
        if maxt is None:
            maxt = jnp.full(batch, jnp.inf, o.dtype)
        else:
            maxt = jnp.broadcast_to(jnp.asarray(maxt, o.dtype), batch)
        if time is None:
            time = jnp.zeros(batch, o.dtype)
        else:
            time = jnp.broadcast_to(jnp.asarray(time, o.dtype), batch)
        if wavelengths is None:
            wavelengths = jnp.zeros(batch + (0,), o.dtype)
        return Ray(o=o, d=d, mint=mint, maxt=maxt, time=time, wavelengths=wavelengths)

    def at(self, t):
        return self.o + self.d * t[..., None]

    def with_bounds(self, mint=None, maxt=None):
        r = self
        if mint is not None:
            r = r.replace(mint=jnp.broadcast_to(jnp.asarray(mint), r.mint.shape))
        if maxt is not None:
            r = r.replace(maxt=jnp.broadcast_to(jnp.asarray(maxt), r.maxt.shape))
        return r


def spawn_ray(p, n, d, wavelengths, time, maxt=None):
    """Offset ray origin along the geometric normal to avoid self-intersection
    (reference: interaction.h ``spawn_ray`` uses (1+|p|) scaled epsilon)."""
    scale = 1.0 + jnp.max(jnp.abs(p), axis=-1)
    eps = RayEpsilon * scale
    sgn = jnp.where(dot(n, d) >= 0.0, 1.0, -1.0)
    o = p + (eps * sgn)[..., None] * n
    mint = jnp.zeros(p.shape[:-1], p.dtype)
    if maxt is None:
        maxt_arr = jnp.full(p.shape[:-1], jnp.inf, p.dtype)
    else:
        maxt_arr = maxt
    return Ray(o=o, d=d, mint=mint, maxt=maxt_arr, time=time, wavelengths=wavelengths)
