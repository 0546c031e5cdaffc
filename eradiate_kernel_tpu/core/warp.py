"""Sampling warps: [0,1)^2 -> various domains, with pdfs.

Counterpart of include/mitsuba/core/warp.h:27-312. Every ``square_to_X``
comes with ``square_to_X_pdf`` evaluated at the warped point; all are pure
jnp functions over (..., 2) sample arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt, sqr

TWO_PI = 2.0 * jnp.pi
INV_PI = 1.0 / jnp.pi
INV_TWO_PI = 1.0 / (2.0 * jnp.pi)
INV_FOUR_PI = 1.0 / (4.0 * jnp.pi)


# --- disk --------------------------------------------------------------------

def square_to_uniform_disk(sample):
    r = jnp.sqrt(sample[..., 0])
    phi = TWO_PI * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_pdf(p):
    inside = jnp.sum(p * p, axis=-1) <= 1.0
    return jnp.where(inside, INV_PI, 0.0)


def square_to_uniform_disk_concentric(sample):
    """Shirley-Chiu concentric mapping (warp.h:49-77)."""
    x = 2.0 * sample[..., 0] - 1.0
    y = 2.0 * sample[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * jnp.pi * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * jnp.pi - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def uniform_disk_to_square_concentric(p):
    quadrant_0_or_2 = jnp.abs(p[..., 0]) > jnp.abs(p[..., 1])
    r_sign = jnp.where(quadrant_0_or_2, p[..., 0], p[..., 1])
    r = jnp.sqrt(jnp.sum(p * p, axis=-1)) * jnp.sign(r_sign + (r_sign == 0))
    phi = jnp.arctan2(p[..., 1] * jnp.sign(r_sign + (r_sign == 0)),
                      p[..., 0] * jnp.sign(r_sign + (r_sign == 0)))
    t = 4.0 / jnp.pi * phi
    t = jnp.where(quadrant_0_or_2, t, 2.0 - t) * r
    a = jnp.where(quadrant_0_or_2, r, t)
    b = jnp.where(quadrant_0_or_2, t, r)
    return jnp.stack([(a + 1.0) * 0.5, (b + 1.0) * 0.5], axis=-1)


# --- triangle ----------------------------------------------------------------

def square_to_uniform_triangle(sample):
    """Barycentric (u, v) with u+v<=1 (warp.h square_to_uniform_triangle)."""
    t = safe_sqrt(1.0 - sample[..., 0])
    return jnp.stack([1.0 - t, t * sample[..., 1]], axis=-1)


def square_to_uniform_triangle_pdf(p):
    inside = (p[..., 0] >= 0) & (p[..., 1] >= 0) & (p[..., 0] + p[..., 1] <= 1.0)
    return jnp.where(inside, 2.0, 0.0)


# --- sphere / hemisphere -----------------------------------------------------

def square_to_uniform_sphere(sample):
    z = 1.0 - 2.0 * sample[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * sample[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(d):
    return jnp.full(d.shape[:-1], INV_FOUR_PI)


def square_to_uniform_hemisphere(sample):
    """Concentric low-distortion mapping (warp.h:158-173)."""
    p = square_to_uniform_disk_concentric(sample)
    z = 1.0 - jnp.sum(p * p, axis=-1)
    scale = safe_sqrt(z + 1.0)
    return jnp.stack([p[..., 0] * scale, p[..., 1] * scale, z], axis=-1)


def square_to_uniform_hemisphere_pdf(d):
    return jnp.where(d[..., 2] >= 0, INV_TWO_PI, 0.0)


def square_to_cosine_hemisphere(sample):
    p = square_to_uniform_disk_concentric(sample)
    z = safe_sqrt(1.0 - jnp.sum(p * p, axis=-1))
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def square_to_uniform_cone(sample, cos_cutoff):
    """Uniform direction in a cone around +z (warp.h ``square_to_uniform_cone``)."""
    one_minus = 1.0 - cos_cutoff
    ct = 1.0 - one_minus * sample[..., 1]
    st = safe_sqrt(1.0 - ct * ct)
    phi = TWO_PI * sample[..., 0]
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def square_to_uniform_cone_pdf(d, cos_cutoff):
    pdf = INV_TWO_PI / (1.0 - cos_cutoff)
    return jnp.where(d[..., 2] >= cos_cutoff, pdf, 0.0)


# --- 1D warps ----------------------------------------------------------------

def square_to_tent(sample):
    """2D tent over [-1,1]^2."""
    return jnp.stack([interval_to_tent(sample[..., 0]),
                      interval_to_tent(sample[..., 1])], axis=-1)


def square_to_tent_pdf(p):
    inside = jnp.all(jnp.abs(p) <= 1.0, axis=-1)
    v = (1.0 - jnp.abs(p[..., 0])) * (1.0 - jnp.abs(p[..., 1]))
    return jnp.where(inside, v, 0.0)


def interval_to_tent(sample):
    """[0,1) -> [-1,1] tent-distributed (warp.h ``interval_to_tent``)."""
    t = sample - 0.5
    return jnp.sign(t) * (1.0 - safe_sqrt(1.0 - 2.0 * jnp.abs(t)))


def interval_to_nonuniform_tent(a, b, c, sample):
    """Tent with nodes a<b<c (warp.h ``interval_to_nonuniform_tent``)."""
    factor_lo = (a - b) / (a - c)  # probability mass of left side
    left = sample < factor_lo
    s = jnp.where(left, sample / factor_lo, (sample - factor_lo) / (1.0 - factor_lo))
    x_left = a + (b - a) * safe_sqrt(s)
    x_right = c + (b - c) * safe_sqrt(1.0 - s)
    return jnp.where(left, x_left, x_right)


def square_to_std_normal(sample):
    """Box-Muller (warp.h ``square_to_std_normal``)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - sample[..., 0], 1e-38)))
    phi = TWO_PI * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_std_normal_pdf(p):
    return INV_TWO_PI * jnp.exp(-0.5 * jnp.sum(p * p, axis=-1))


# --- microfacet / vMF --------------------------------------------------------

def square_to_beckmann(sample, alpha):
    phi = TWO_PI * sample[..., 0]
    log_arg = jnp.maximum(1.0 - sample[..., 1], 1e-38)
    tan_theta_2 = -sqr(alpha) * jnp.log(log_arg)
    ct = 1.0 / jnp.sqrt(1.0 + tan_theta_2)
    st = safe_sqrt(1.0 - ct * ct)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def square_to_beckmann_pdf(m, alpha):
    """pdf of square_to_beckmann = D_beckmann(m) * cos(theta_m)."""
    ct = m[..., 2]
    ct2 = sqr(ct)
    tt2 = (1.0 - ct2) / jnp.maximum(ct2, 1e-20)
    a2 = sqr(alpha)
    pdf = jnp.exp(-tt2 / a2) / (jnp.pi * a2 * jnp.maximum(ct2 * ct, 1e-20))
    return jnp.where(ct > 1e-9, pdf, 0.0)


def square_to_von_mises_fisher(sample, kappa):
    """vMF on the sphere around +z with concentration kappa (warp.h)."""
    sy = jnp.maximum(sample[..., 1], 1e-7)
    ct = 1.0 + jnp.log(sy + (1.0 - sy) * jnp.exp(-2.0 * kappa)) / kappa
    st = safe_sqrt(1.0 - ct * ct)
    phi = TWO_PI * sample[..., 0]
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def square_to_von_mises_fisher_pdf(d, kappa):
    return jnp.exp(kappa * (d[..., 2] - 1.0)) * (kappa * INV_TWO_PI) / (1.0 - jnp.exp(-2.0 * kappa))


# --- rough fresnel / GGX visible normals live in render/microfacet ------------


# --- linear / bilinear interpolant warps (warp.h:356-434) ---------------------

def interval_to_linear(a, b, u):
    """Sample t in [0,1] with density proportional to lerp(a, b, t)
    (warp.h interval_to_linear)."""
    denom = b - a
    t = (safe_sqrt(a * a + (b * b - a * a) * u) - a) / jnp.where(
        jnp.abs(denom) < 1e-12, 1e-12, denom)
    return jnp.where(jnp.abs(denom) < 1e-12 * (a + b), u,
                     jnp.clip(t, 0.0, 1.0))


def linear_to_interval(a, b, t):
    """Inverse of interval_to_linear: the CDF of the linear density."""
    denom = a + b
    u = t * (2.0 * a + (b - a) * t) / jnp.where(jnp.abs(denom) < 1e-12,
                                                1e-12, denom)
    return jnp.where(jnp.abs(denom) < 1e-12, t, jnp.clip(u, 0.0, 1.0))


def square_to_bilinear(v00, v10, v01, v11, sample):
    """Sample [0,1]^2 with density prop. to the bilinear interpolant with
    corner values v00 (x0,y0), v10 (x1,y0), v01 (x0,y1), v11 (x1,y1)
    (warp.h:393-407). Returns (position, interpolant value at position)."""
    r0 = v00 + v10
    r1 = v01 + v11
    y = interval_to_linear(r0, r1, sample[..., 1])
    c0 = v00 * (1 - y) + v01 * y
    c1 = v10 * (1 - y) + v11 * y
    x = interval_to_linear(c0, c1, sample[..., 0])
    pdf = c0 * (1 - x) + c1 * x
    return jnp.stack([x, y], -1), pdf


def bilinear_to_square(v00, v10, v01, v11, pos):
    """Inverse of square_to_bilinear (warp.h:409-426)."""
    x = pos[..., 0]
    y = pos[..., 1]
    r0 = v00 + v10
    r1 = v01 + v11
    c0 = v00 * (1 - y) + v01 * y
    c1 = v10 * (1 - y) + v11 * y
    pdf = c0 * (1 - x) + c1 * x
    return jnp.stack([linear_to_interval(c0, c1, x),
                      linear_to_interval(r0, r1, y)], -1), pdf


def square_to_bilinear_pdf(v00, v10, v01, v11, pos):
    x = pos[..., 0]
    y = pos[..., 1]
    return ((v00 * (1 - x) + v10 * x) * (1 - y)
            + (v01 * (1 - x) + v11 * x) * y)
