"""Rough dielectric (reference: src/bsdfs/roughdielectric.cpp; Walter 2007).

Microfacet reflection + transmission through a rough interface. Params:
int_ior/ext_ior, distribution, alpha(_u/_v), specular_reflectance/
specular_transmittance textures.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.math import normalize, sqr
from ..render import fresnel as fr
from ..render import microfacet as mf
from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common
from .roughconductor import _dist_sweep

FLAGS = (common.GlossyReflection | common.GlossyTransmission
         | common.FrontSide | common.BackSide | common.NonSymmetric
         | common.Anisotropic)


def build(props, builder):
    int_ior = fr.lookup_ior(props.get("int_ior", "bk7"))
    ext_ior = fr.lookup_ior(props.get("ext_ior", "air"))
    alpha = float(props.get("alpha", 0.1))
    return {
        "eta": np.float32(int_ior / ext_ior),
        "alpha_u": np.float32(props.get("alpha_u", alpha)),
        "alpha_v": np.float32(props.get("alpha_v", alpha)),
        "dist": np.int32(mf.distr_type(props.get("distribution", "ggx"))),
        "specular_reflectance": np.int32(
            builder.texture(props.get("specular_reflectance", 1.0))),
        "specular_transmittance": np.int32(
            builder.texture(props.get("specular_transmittance", 1.0))),
        "twosided": builder.twosided_flag(props),
    }


def _mulsign(v, s):
    return v * jnp.sign(s + (s == 0))[..., None]


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    eta = _tg(params["eta"], slot)
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)
    wi = si.wi
    cos_i = wi[..., 2]
    act = active & (cos_i != 0.0)
    wi_up = _mulsign(wi, cos_i)  # flip into m's hemisphere

    def per_dist(ty):
        m, pdf_m = mf.sample(ty, wi_up, au, av, s2)
        return m, pdf_m

    m, pdf_m = _dist_sweep(params, slot, per_dist)
    # m stays in the +z local hemisphere; the SIGN of dot(wi, m) tells
    # fresnel() whether we enter or exit the dense medium
    # (roughdielectric.cpp sample(): F = fresnel(dot(wi, m), eta))
    f, cos_t, eta_it, eta_ti = fr.fresnel(jnp.sum(wi * m, -1), eta)
    select_r = s1 <= f

    wo_r = fr.reflect_m(wi, m)
    wo_t = fr.refract_m(wi, m, cos_t, eta_ti)
    wo = jnp.where(select_r[..., None], wo_r, wo_t)
    cos_o = wo[..., 2]
    # geometric consistency: reflection same side, transmission opposite
    ok = jnp.where(select_r, cos_i * cos_o > 0, cos_i * cos_o < 0)
    act = act & ok & (pdf_m > 0)

    # VNDF sample weight = G2/G1(wi) = G1(wo) for separable Smith
    dist = _tg(params["dist"], slot)
    au_b = jnp.broadcast_to(au, cos_o.shape)
    av_b = jnp.broadcast_to(av, cos_o.shape)
    g1_ggx = mf.smith_g1(mf.GGX, _mulsign(wo, cos_o), m, au_b, av_b)
    g1_beck = mf.smith_g1(mf.BECKMANN, _mulsign(wo, cos_o), m, au_b, av_b)
    w_nof = jnp.where(dist == mf.GGX, g1_ggx, g1_beck)

    dwh_dwo_r = 1.0 / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * m, -1)), 1e-12)
    denom_t = jnp.sum(wi * m, -1) + eta_it * jnp.sum(wo * m, -1)
    dwh_dwo_t = sqr(eta_it) * jnp.abs(jnp.sum(wo * m, -1)) \
        / jnp.maximum(sqr(denom_t), 1e-12)
    pdf = pdf_m * jnp.where(select_r, f, 1.0 - f) \
        * jnp.where(select_r, dwh_dwo_r, dwh_dwo_t)

    refl = texture_eval(scene, _tg(params["specular_reflectance"], slot), si.uv,
                        si.wavelengths, act)
    trans = texture_eval(scene, _tg(params["specular_transmittance"], slot), si.uv,
                         si.wavelengths, act)
    t_factor = sqr(eta_ti) if mode == common.RADIANCE else jnp.ones_like(eta_ti)
    weight = jnp.where(select_r[..., None], refl,
                       trans * t_factor[..., None]) * w_nof[..., None]

    lobe = jnp.where(select_r,
                     jnp.uint32(common.GlossyReflection | common.FrontSide
                                | common.BackSide),
                     jnp.uint32(common.GlossyTransmission | common.FrontSide
                                | common.BackSide | common.NonSymmetric))
    bs = common.BSDFSample(
        wo=wo, pdf=jnp.where(act, pdf, 0.0),
        eta=jnp.where(select_r, 1.0, eta_it),
        sampled_type=lobe)
    return bs, jnp.where((act & (pdf > 0))[..., None], weight, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    eta = _tg(params["eta"], slot)
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)
    wi = si.wi
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    reflect = cos_i * cos_o > 0.0
    act = active & (cos_i != 0.0) & (cos_o != 0.0)

    # relative IOR along the actual crossing
    eta_e = jnp.where(cos_i > 0, eta, 1.0 / eta)
    # half-vector: reflection h ~ wi+wo; transmission h ~ wi + eta*wo
    m_raw = wi + wo * jnp.where(reflect, 1.0, eta_e)[..., None]
    m = normalize(m_raw)
    m = _mulsign(m, m[..., 2])  # upper hemisphere

    wi_up = _mulsign(wi, cos_i)
    wo_up = _mulsign(wo, cos_o)

    # signed incident cosine against the upper-hemisphere m picks the correct
    # IOR orientation (roughdielectric.cpp eval())
    f, _, eta_it, eta_ti = fr.fresnel(jnp.sum(wi * m, -1), eta)

    def per_dist(ty):
        d = mf.eval_d(ty, m, au, av)
        g = mf.smith_g1(ty, wi_up, m, au, av) * mf.smith_g1(ty, wo_up, m, au, av)
        pdf_m = mf.pdf(ty, wi_up, m, au, av)
        return d, g, pdf_m

    d, g, pdf_m = _dist_sweep(params, slot, per_dist)

    wim = jnp.sum(wi * m, -1)
    wom = jnp.sum(wo * m, -1)

    # sidedness of the reconstructed half-vector: beyond the fold of the
    # refraction map the algebraic m is inconsistent with (wi, wo) and the
    # sampler can never produce such pairs (roughdielectric.cpp eval():
    # dot(wi,m)*cos_theta_i > 0 && dot(wo,m)*cos_theta_o > 0)
    act = act & (wim * cos_i > 0.0) & (wom * cos_o > 0.0)

    # reflection: f*|cos_o| = F D G / (4 |cos_i|)
    val_r = f * d * g / jnp.maximum(4.0 * jnp.abs(cos_i), 1e-12)
    pdf_r = pdf_m * f / jnp.maximum(4.0 * jnp.abs(wom), 1e-12)

    # transmission (Walter eq. 21, times |cos_o| and the radiance factor)
    denom = wim + eta_it * wom
    common_t = d * g * jnp.abs(wim * wom) \
        / jnp.maximum(jnp.abs(cos_i) * sqr(denom), 1e-12)
    t_scale = sqr(eta_ti) if mode == common.RADIANCE else jnp.ones_like(eta_ti)
    val_t = (1.0 - f) * sqr(eta_it) * common_t * t_scale
    dwh_dwo_t = sqr(eta_it) * jnp.abs(wom) / jnp.maximum(sqr(denom), 1e-12)
    pdf_t = pdf_m * (1.0 - f) * dwh_dwo_t

    value = jnp.where(reflect, val_r, val_t)
    pdf = jnp.where(reflect, pdf_r, pdf_t)

    refl_tex = texture_eval(scene, _tg(params["specular_reflectance"], slot), si.uv,
                            si.wavelengths, act)
    trans_tex = texture_eval(scene, _tg(params["specular_transmittance"], slot),
                             si.uv, si.wavelengths, act)
    tex = jnp.where(reflect[..., None], refl_tex, trans_tex)
    return (jnp.where(act[..., None], value[..., None] * tex, 0.0),
            jnp.where(act, pdf, 0.0))
