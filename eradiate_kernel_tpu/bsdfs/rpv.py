"""Rahman–Pinty–Verstraete (RPV) Earth-surface BRDF.

Reference: src/bsdfs/rpv.cpp:67-146 [ERADIATE]. Params rho_0, g (asymmetry),
k (Minnaert exponent), rho_c (hot-spot), all texture indices. Sampled with a
cosine hemisphere (rpv.cpp sample()).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..core.frame import cos_theta, sin_theta, tan_theta, sin_cos_phi_2
from ..core.math import safe_sqrt, sqr
from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common

FLAGS = common.GlossyReflection | common.FrontSide


def build(props, builder):
    rho_0 = builder.texture(props.get("rho_0", 0.1))
    return {
        "rho_0": rho_0,
        "g": builder.texture(props.get("g", 0.0)),
        "k": builder.texture(props.get("k", 0.1)),
        "rho_c": (builder.texture(props["rho_c"]) if "rho_c" in props
                  else rho_0),
        "twosided": builder.twosided_flag(props),
    }


def _sincos_phi(v):
    s2, c2 = sin_cos_phi_2(v)
    sp = safe_sqrt(s2) * jnp.sign(v[..., 1] + (v[..., 1] == 0))
    cp = safe_sqrt(c2) * jnp.sign(v[..., 0] + (v[..., 0] == 0))
    return sp, cp


def eval_rpv(scene, params, slot, si, wi, wo, active):
    """rpv.cpp:107-146 eval_rpv — BRDF value WITHOUT the cosine factor."""
    uv, wl = si.uv, si.wavelengths
    rho_0 = texture_eval(scene, _tg(params["rho_0"], slot), uv, wl, active)
    rho_c = texture_eval(scene, _tg(params["rho_c"], slot), uv, wl, active)
    g = texture_eval(scene, _tg(params["g"], slot), uv, wl, active)
    k = texture_eval(scene, _tg(params["k"], slot), uv, wl, active)

    sp1, cp1 = _sincos_phi(wi)
    sp2, cp2 = _sincos_phi(wo)
    cos_dphi = cp1 * cp2 + sp1 * sp2
    st1, ct1, tt1 = sin_theta(wi), jnp.maximum(cos_theta(wi), 1e-6), tan_theta(wi)
    st2, ct2, tt2 = sin_theta(wo), jnp.maximum(cos_theta(wo), 1e-6), tan_theta(wo)

    G = safe_sqrt(sqr(tt1) + sqr(tt2) - 2.0 * tt1 * tt2 * cos_dphi)
    cos_g = ct1 * ct2 + st1 * st2 * cos_dphi
    F = (1.0 - sqr(g)) / jnp.maximum(
        (1.0 + sqr(g) + 2.0 * g * cos_g[..., None]) ** 1.5, 1e-9)

    minnaert = (ct1 * ct2 * (ct1 + ct2))[..., None] ** (k - 1.0)
    value = rho_0 * minnaert * F * (1.0 + (1.0 - rho_c) / (1.0 + G[..., None])) \
        / jnp.pi
    return value


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    act = active & (wi[..., 2] > 0.0)
    wo = warp.square_to_cosine_hemisphere(s2)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    value = eval_rpv(scene, params, slot, si, wi, wo, act)
    bs = common.BSDFSample(
        wo=jnp.where(flip[..., None], common.flip_z(wo), wo),
        pdf=jnp.where(act, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, FLAGS, jnp.uint32))
    # weight = value * cos / pdf = value * pi (cosine cancels)
    weight = jnp.where((act & (pdf > 0))[..., None], value * jnp.pi, 0.0)
    return bs, weight


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    wo = jnp.where(flip[..., None], common.flip_z(wo), wo)
    act = active & (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    value = eval_rpv(scene, params, slot, si, wi, wo, act) \
        * jnp.abs(wo[..., 2])[..., None]
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    return (jnp.where(act[..., None], value, 0.0), jnp.where(act, pdf, 0.0))
