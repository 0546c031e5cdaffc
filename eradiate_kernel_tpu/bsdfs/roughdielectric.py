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


def eval_mueller(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    """Polarized rough-dielectric eval: the scalar microfacet eval with the
    Fresnel factor replaced by the specular reflection / transmission
    Mueller matrix about the reconstructed facet normal m, rotated from the
    s/p frame of the plane of incidence into the implicit Stokes bases of
    (-wo, wi). Returns the per-channel (..., nc, 4, 4) stack (value incl.
    cos_o). Beyond the reference: roughdielectric.cpp has no polarized
    branch (it scales the Mueller throughput by the scalar value); here the
    per-facet s/p split is carried exactly, matching what conductor/
    dielectric/roughconductor already do.
    """
    from ..core import mueller as mu

    eta = _tg(params["eta"], slot)
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)
    wi = si.wi
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    reflect = cos_i * cos_o > 0.0
    act = active & (cos_i != 0.0) & (cos_o != 0.0)

    eta_e = jnp.where(cos_i > 0, eta, 1.0 / eta)
    m_raw = wi + wo * jnp.where(reflect, 1.0, eta_e)[..., None]
    m = normalize(m_raw)
    m = _mulsign(m, m[..., 2])

    wi_up = _mulsign(wi, cos_i)
    wo_up = _mulsign(wo, cos_o)
    f, _, eta_it, eta_ti = fr.fresnel(jnp.sum(wi * m, -1), eta)

    def per_dist(ty):
        d = mf.eval_d(ty, m, au, av)
        g = mf.smith_g1(ty, wi_up, m, au, av) * mf.smith_g1(ty, wo_up, m,
                                                            au, av)
        return (d * g,)

    (dg,) = _dist_sweep(params, slot, per_dist)

    wim = jnp.sum(wi * m, -1)
    wom = jnp.sum(wo * m, -1)
    act = act & (wim * cos_i > 0.0) & (wom * cos_o > 0.0)

    # Fresnel-free magnitudes (eval_pdf with f / (1-f) factored out)
    val_r_nof = dg / jnp.maximum(4.0 * jnp.abs(cos_i), 1e-12)
    denom = wim + eta_it * wom
    common_t = dg * jnp.abs(wim * wom) \
        / jnp.maximum(jnp.abs(cos_i) * sqr(denom), 1e-12)
    t_scale = sqr(eta_ti) if mode == common.RADIANCE else jnp.ones_like(eta_ti)
    val_t_nof = sqr(eta_it) * common_t * t_scale
    val_nof = jnp.where(reflect, val_r_nof, val_t_nof)

    # per-facet Fresnel Mueller about m, IOR oriented by the signed cosine
    wo_hat = wo if mode == common.RADIANCE else wi
    wi_hat = wi if mode == common.RADIANCE else wo
    ci_m = jnp.sum(wo_hat * m, -1)
    eta_rel = jnp.where(ci_m >= 0, eta, 1.0 / eta)
    R = mu.specular_reflection(jnp.abs(ci_m), eta_rel)
    T = mu.specular_transmission(jnp.abs(ci_m), eta_rel)
    f_m = jnp.where(reflect[..., None, None], R, T)
    # rescale so M00 matches the scalar Fresnel split exactly (f is
    # evaluated against wi.m as in eval_pdf; reciprocity makes the two
    # orientations agree analytically, this removes the residual numeric
    # difference)
    m00 = f_m[..., 0, 0]
    target = jnp.where(reflect, f, 1.0 - f)
    scale = jnp.where(m00 > 1e-12, target / jnp.maximum(m00, 1e-12), 0.0)
    f_m = f_m * scale[..., None, None]

    def safe_basis(v, d):
        n2 = jnp.sum(v * v, -1, keepdims=True)
        ok = n2 > 1e-14
        v = jnp.where(ok, v, 1.0)
        v = v / jnp.sqrt(jnp.where(ok, jnp.sum(v * v, -1, keepdims=True),
                                   1.0))
        return jnp.where(ok, v, mu.stokes_basis(d))

    s_in = safe_basis(jnp.cross(m, -wo_hat), -wo_hat)
    s_out = safe_basis(jnp.cross(m, wi_hat), wi_hat)
    f_m = mu.rotate_mueller_basis(
        f_m, -wo_hat, s_in, mu.stokes_basis(-wo_hat),
        wi_hat, s_out, mu.stokes_basis(wi_hat))

    refl_tex = texture_eval(scene, _tg(params["specular_reflectance"], slot),
                            si.uv, si.wavelengths, act)
    trans_tex = texture_eval(scene, _tg(params["specular_transmittance"],
                                        slot), si.uv, si.wavelengths, act)
    tex = jnp.where(reflect[..., None], refl_tex, trans_tex)
    out = (tex * val_nof[..., None])[..., None, None] * f_m[..., None, :, :]
    return jnp.where(act[..., None, None, None], out, 0.0)
