"""Microfacet (normal) distributions: GGX and Beckmann.

Counterpart of include/mitsuba/render/microfacet.h: distribution eval,
Smith shadowing-masking, and visible-normal (VNDF) sampling. Anisotropic
roughness (alpha_u, alpha_v) is supported throughout. All functions are pure
wavefront math — directions live in the local shading frame (+z = normal).

GGX visible-normal sampling follows Heitz 2018 ("Sampling the GGX
Distribution of Visible Normals"); Beckmann visible sampling uses the slope-
space algorithm of the reference (microfacet.h sample_visible_11) with the
rational erfinv-free Beckmann CDF inversion replaced by a Newton-polished
inverse, which XLA compiles to straight-line VPU code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.frame import cos_theta
from ..core.math import cross, dot, normalize, safe_sqrt, sqr

GGX = 0
BECKMANN = 1

_TYPE_NAMES = {"ggx": GGX, "beckmann": BECKMANN}


def distr_type(name: str) -> int:
    return _TYPE_NAMES[name]


def _alpha2(m, alpha_u, alpha_v):
    """(x/au)^2 + (y/av)^2 helper."""
    return sqr(m[..., 0] / alpha_u) + sqr(m[..., 1] / alpha_v)


def eval_d(dist_type: int, m, alpha_u, alpha_v):
    """Microfacet density D(m) (microfacet.h eval()); zero on the lower
    hemisphere."""
    cos2 = sqr(m[..., 2])
    az = alpha_u * alpha_v
    if dist_type == GGX:
        t = _alpha2(m, alpha_u, alpha_v) + cos2
        d = 1.0 / jnp.maximum(jnp.pi * az * sqr(t), 1e-20)
    else:
        d = jnp.exp(-_alpha2(m, alpha_u, alpha_v)
                    / jnp.maximum(cos2, 1e-12)) \
            / jnp.maximum(jnp.pi * az * sqr(cos2), 1e-20)
    return jnp.where(m[..., 2] > 0.0, d, 0.0)


def smith_g1(dist_type: int, v, m, alpha_u, alpha_v):
    """Smith mono-directional shadowing G1(v, m) (microfacet.h smith_g1)."""
    cz = v[..., 2]
    xy_alpha_2 = sqr(alpha_u * v[..., 0]) + sqr(alpha_v * v[..., 1])
    tan2 = xy_alpha_2 / jnp.maximum(sqr(cz), 1e-12)
    if dist_type == GGX:
        g = 2.0 / (1.0 + jnp.sqrt(1.0 + tan2))
    else:
        a = 1.0 / jnp.maximum(jnp.sqrt(tan2), 1e-12)
        a2 = sqr(a)
        g = jnp.where(a >= 1.6, 1.0,
                      (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2))
    # sidedness: v must lie on m's side of the surface
    ok = dot(v, m) * cz > 0.0
    g = jnp.where(ok, g, 0.0)
    g = jnp.where(xy_alpha_2 == 0.0, 1.0, g)
    return jnp.where(ok, g, 0.0)


def g_smith(dist_type: int, wi, wo, m, alpha_u, alpha_v):
    """Separable Smith shadowing-masking G(wi, wo, m) (microfacet.h G())."""
    return smith_g1(dist_type, wi, m, alpha_u, alpha_v) \
        * smith_g1(dist_type, wo, m, alpha_u, alpha_v)


def _sample_ggx_vndf(wi, alpha_u, alpha_v, sample):
    """Heitz 2018 VNDF sampling; wi must be in the upper hemisphere."""
    # stretch to the hemisphere configuration
    vh = normalize(jnp.stack([alpha_u * wi[..., 0], alpha_v * wi[..., 1],
                              wi[..., 2]], -1))
    # orthonormal basis around vh
    lensq = sqr(vh[..., 0]) + sqr(vh[..., 1])
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where((lensq > 1e-12)[..., None],
                   jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len,
                              jnp.zeros_like(inv_len)], -1),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape))
    t2 = cross(vh, t1)
    # parameterize the projected area
    r = jnp.sqrt(sample[..., 0])
    phi = 2.0 * jnp.pi * sample[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - sqr(p1)) + s * p2
    # reproject onto the hemisphere
    nh = p1[..., None] * t1 + p2[..., None] * t2 \
        + safe_sqrt(1.0 - sqr(p1) - sqr(p2))[..., None] * vh
    # unstretch
    m = normalize(jnp.stack([alpha_u * nh[..., 0], alpha_v * nh[..., 1],
                             jnp.maximum(nh[..., 2], 1e-6)], -1))
    return m


_SQRT_PI_INV = float(1.0 / np.sqrt(np.pi))  # no backend init at import


def _beckmann_sample_visible_11(cos_theta_i, u1, u2):
    """Visible-slope sampling of the standard (alpha=1) Beckmann distribution
    (microfacet.h sample_visible_11, Heitz & d'Eon 2014): invert the visible
    slope CDF with a fixed 3-step Newton polish in erf space — straight-line
    VPU code under XLA."""
    from jax.scipy.special import erf, erfinv

    ct = jnp.clip(cos_theta_i, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - sqr(ct), 1e-20))
    tan_t = st / jnp.maximum(ct, 1e-6)
    cot_t = 1.0 / jnp.maximum(tan_t, 1e-6)

    # normal-incidence branch: slopes are a standard 2D gaussian
    r = jnp.sqrt(-jnp.log(jnp.maximum(1.0 - u1, 1e-10)))
    phi = 2.0 * jnp.pi * u2
    sx_normal = r * jnp.cos(phi)
    sy_normal = r * jnp.sin(phi)

    # tilted branch: invert the marginal visible-slope CDF in erf space
    c = erf(cot_t)
    ux = jnp.maximum(u1, 1e-6)
    theta = jnp.arccos(jnp.clip(ct, 0.0, 1.0))
    fit = 1.0 + theta * (-0.876 + theta * (0.4265 - 0.0594 * theta))
    b = c - (1.0 + c) * jnp.power(1.0 - ux, fit)
    norm = 1.0 / (1.0 + c + _SQRT_PI_INV * tan_t * jnp.exp(-sqr(cot_t)))
    for _ in range(3):
        b = jnp.clip(b, -0.9999, c - 1e-6)
        inv_erf = erfinv(b)
        value = norm * (1.0 + b + _SQRT_PI_INV * tan_t
                        * jnp.exp(-sqr(inv_erf))) - ux
        deriv = norm * (1.0 - inv_erf * tan_t)
        b = b - value / jnp.where(jnp.abs(deriv) < 1e-10, 1e-10, deriv)
    sx_tilt = erfinv(jnp.clip(b, -0.9999, c - 1e-6))
    sy_tilt = erfinv(jnp.clip(2.0 * jnp.maximum(u2, 1e-6) - 1.0,
                              -0.9999, 0.9999))

    normal_inc = ct > 0.9999
    return (jnp.where(normal_inc, sx_normal, sx_tilt),
            jnp.where(normal_inc, sy_normal, sy_tilt))


def _sample_beckmann_vndf(wi, alpha_u, alpha_v, sample2):
    """Visible-normal Beckmann sampling; wi in the upper hemisphere."""
    # stretch wi
    wi_s = normalize(jnp.stack([alpha_u * wi[..., 0], alpha_v * wi[..., 1],
                                wi[..., 2]], -1))
    sx, sy = _beckmann_sample_visible_11(wi_s[..., 2], sample2[..., 0],
                                         sample2[..., 1])
    # rotate by phi of wi_s
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(
        sqr(wi_s[..., 0]) + sqr(wi_s[..., 1]), 1e-20))
    cp = wi_s[..., 0] * inv_len
    sp = wi_s[..., 1] * inv_len
    # near-normal incidence: phi undefined, use identity rotation
    near_n = (sqr(wi_s[..., 0]) + sqr(wi_s[..., 1])) < 1e-12
    cp = jnp.where(near_n, 1.0, cp)
    sp = jnp.where(near_n, 0.0, sp)
    rx = cp * sx - sp * sy
    ry = sp * sx + cp * sy
    # unstretch + build normal
    rx = rx * alpha_u
    ry = ry * alpha_v
    return normalize(jnp.stack([-rx, -ry, jnp.ones_like(rx)], -1))


def sample(dist_type: int, wi, alpha_u, alpha_v, sample2):
    """Sample a visible microfacet normal given incident direction wi
    (microfacet.h sample() with sample_visible=true, the reference default).
    wi is flipped into the upper hemisphere first. Returns (m, pdf)."""
    flip = wi[..., 2] < 0.0
    wi_u = jnp.where(flip[..., None], -wi, wi)
    if dist_type == GGX:
        m = _sample_ggx_vndf(wi_u, alpha_u, alpha_v, sample2)
    else:
        m = _sample_beckmann_vndf(wi_u, alpha_u, alpha_v, sample2)
    return m, pdf(dist_type, wi_u, m, alpha_u, alpha_v)


def pdf(dist_type: int, wi, m, alpha_u, alpha_v):
    """Density of sample() in normal (solid-angle) space: the visible-normal
    density G1(wi) |wi.m| D(m) / |cos_theta_i| (microfacet.h pdf())."""
    flip = wi[..., 2] < 0.0
    wi_u = jnp.where(flip[..., None], -wi, wi)
    d = eval_d(dist_type, m, alpha_u, alpha_v)
    g1 = smith_g1(dist_type, wi_u, m, alpha_u, alpha_v)
    return g1 * jnp.abs(dot(wi_u, m)) * d \
        / jnp.maximum(jnp.abs(cos_theta(wi_u)), 1e-12)
