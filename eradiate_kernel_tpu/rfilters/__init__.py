"""Reconstruction filters (counterparts of src/rfilters/*.cpp).

Pure functions of the (signed) distance from the pixel center; evaluated
exactly rather than via the reference's discretized lookup table
(rfilter.h:48) — on TPU the direct evaluation fuses into the splat.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DEFAULTS = {
    "box": {"radius": 0.5},
    "tent": {"radius": 1.0},
    "gaussian": {"stddev": 0.5},
    "mitchell": {"B": 1.0 / 3.0, "C": 1.0 / 3.0},
    "catmullrom": {"B": 0.0, "C": 0.5},
    "lanczos": {"lobes": 3},
}


def filter_radius(kind: str, params=None) -> float:
    p = {**DEFAULTS[kind], **(params or {})}
    if kind == "box":
        return p["radius"]
    if kind == "tent":
        return p["radius"]
    if kind == "gaussian":
        return 4.0 * p["stddev"]
    if kind in ("mitchell", "catmullrom"):
        return 2.0
    if kind == "lanczos":
        return float(p["lobes"])
    raise ValueError(kind)


def eval_filter(kind: str, x, params=None):
    """x: signed distance in pixels."""
    p = {**DEFAULTS[kind], **(params or {})}
    ax = jnp.abs(x)
    if kind == "box":
        return jnp.where(ax <= p["radius"], 1.0, 0.0)
    if kind == "tent":
        return jnp.maximum(0.0, 1.0 - ax / p["radius"])
    if kind == "gaussian":
        s = p["stddev"]
        r = 4.0 * s
        alpha = -1.0 / (2.0 * s * s)
        v = jnp.exp(alpha * ax * ax) - np.exp(alpha * r * r)
        return jnp.maximum(0.0, v)
    if kind in ("mitchell", "catmullrom"):
        B, C = p["B"], p["C"]
        x2 = ax * ax
        x3 = x2 * ax
        v1 = ((12 - 9 * B - 6 * C) * x3 + (-18 + 12 * B + 6 * C) * x2
              + (6 - 2 * B)) * (1.0 / 6.0)
        v2 = ((-B - 6 * C) * x3 + (6 * B + 30 * C) * x2
              + (-12 * B - 48 * C) * ax + (8 * B + 24 * C)) * (1.0 / 6.0)
        return jnp.where(ax < 1.0, v1, jnp.where(ax < 2.0, v2, 0.0))
    if kind == "lanczos":
        n = p["lobes"]
        px = jnp.pi * ax
        sinc = jnp.where(ax < 1e-6, 1.0, jnp.sin(px) / jnp.maximum(px, 1e-9))
        sincn = jnp.where(ax < 1e-6, 1.0,
                          jnp.sin(px / n) / jnp.maximum(px / n, 1e-9))
        return jnp.where(ax < n, sinc * sincn, 0.0)
    raise ValueError(kind)
