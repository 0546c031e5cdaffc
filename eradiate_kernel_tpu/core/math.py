"""Elementary math helpers shared across the renderer.

Counterparts of include/mitsuba/core/math.h in the reference; everything is a
pure jnp function over arrays of arbitrary leading batch shape with a trailing
dimension of 3 for vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# RayEpsilon = float32 machine epsilon * 1500 (reference: math.h) — the
# self-intersection offset scale. Must survive f32 rounding when added to
# coordinates of order 1.
RayEpsilon = 1.1920929e-07 * 1500.0  # ~1.8e-4
ShadowEpsilon = RayEpsilon * 10.0
EPSILON = jnp.finfo(jnp.float32).eps / 2

# Finite "no hit" sentinel. Using inf would poison reverse-mode AD: masked
# lanes' inf intermediates turn 0-cotangents into NaN (0 * inf). Comparisons
# (t < maxt etc.) behave identically; 1e18 squares without f32 overflow.
INVALID_T = 1e18


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_rsqrt(x):
    return jax.lax.rsqrt(jnp.maximum(x, jnp.finfo(jnp.float32).tiny))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def sqr(x):
    return x * x


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def norm(v, keepdims=False):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=keepdims), 0.0))


def squared_norm(v, keepdims=False):
    return jnp.sum(v * v, axis=-1, keepdims=keepdims)


def normalize(v):
    return v * safe_rsqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def cross(a, b):
    return jnp.cross(a, b)


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def rcp(x):
    """Reciprocal with the reference's convention: 1/0 = ±inf (IEEE)."""
    return 1.0 / x


def safe_div(a, b, eps=1e-20):
    """a/b where |b|<=eps yields 0 (used for guarded pdf/weight ratios)."""
    ok = jnp.abs(b) > eps
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)


def fmadd(a, b, c):
    return a * b + c


def sign(x):
    return jnp.where(x >= 0, 1.0, -1.0)


def mulsign(a, b):
    """a * sign(b) with sign(±0)=±1 semantics like enoki mulsign."""
    return jnp.where(b >= 0, a, -a)


def select(mask, a, b):
    if mask is not None and getattr(mask, "ndim", 0) > 0 and getattr(a, "ndim", 0) > mask.ndim:
        mask = mask[..., None]
    return jnp.where(mask, a, b)


def coordinate_system(n):
    """Build an orthonormal basis around unit vector n.

    Duff et al. 2017 branchless construction (reference: mitsuba/core/vector.h
    ``coordinate_system``). n: (..., 3) -> (s, t) each (..., 3).
    """
    z = n[..., 2]
    sign_ = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign_ + z)
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [
            mulsign(sqr(n[..., 0]) * a, z) + 1.0,
            mulsign(b, z),
            mulsign(-n[..., 0], z),
        ],
        axis=-1,
    )
    t = jnp.stack([b, sqr(n[..., 1]) * a + sign_, -n[..., 1]], axis=-1)
    return s, t


def sph_to_dir(theta, phi):
    """Spherical (theta from +z, phi from +x) to unit direction."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([st * cp, st * sp, ct], axis=-1)


def dir_to_sph(d):
    theta = safe_acos(d[..., 2])
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    return theta, phi


def solve_quadratic(a, b, c):
    """Numerically stable quadratic solve (reference: mitsuba/core/math.h
    ``solve_quadratic``). Returns (valid, x0, x1) with x0 <= x1.

    Handles the linear case a ~= 0.
    """
    linear = jnp.abs(a) < 1e-20
    x_lin = -c / jnp.where(linear, jnp.where(b == 0, 1.0, b), 1.0)
    valid_lin = linear & (b != 0.0)

    disc = b * b - 4.0 * a * c
    valid_quad = disc >= 0.0
    sqrt_disc = safe_sqrt(disc)
    # Numerically stable: q = -0.5 (b + sign(b) sqrt(disc))
    temp = -0.5 * (b + mulsign(sqrt_disc, b))
    a_safe = jnp.where(linear, 1.0, a)
    x0q = temp / a_safe
    x1q = c / jnp.where(temp == 0, 1.0, temp)
    x0 = jnp.minimum(x0q, x1q)
    x1 = jnp.maximum(x0q, x1q)

    valid = jnp.where(linear, valid_lin, valid_quad)
    x0 = jnp.where(linear, x_lin, x0)
    x1 = jnp.where(linear, x_lin, x1)
    return valid, x0, x1


def linear_search(values, x):
    """Index i such that values[i] <= x < values[i+1], clamped to valid range.

    values: (N,) sorted ascending; x: (...,). Uses searchsorted (XLA lowers to
    a vectorized binary search).
    """
    idx = jnp.searchsorted(values, x, side="right") - 1
    return jnp.clip(idx, 0, values.shape[0] - 2)


def morton_encode2(x, y):
    """Interleave bits of two uint32 (16 bits each) -> morton code."""

    def part(v):
        v = v & 0x0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return part(x.astype(jnp.uint32)) | (part(y.astype(jnp.uint32)) << 1)


def legendre_p(n: int, x):
    """Legendre polynomial P_n(x) via recurrence (static n)."""
    if n == 0:
        return jnp.ones_like(x)
    p0 = jnp.ones_like(x)
    p1 = x
    for k in range(2, n + 1):
        p0, p1 = p1, ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
    return p1
