"""Polarized plastic (reference: src/bsdfs/pplastic.cpp, the Baek et al.
2018 pBRDF): a rough microfacet specular lobe plus a Lambertian base
attenuated by the two smooth refractions in and out of the coating.

Unlike plastic/roughplastic there is no internal-scattering normalization —
the two components are added ad hoc (pplastic.cpp:66-84). In unpolarized
variants eval follows pplastic.cpp:305-330; `eval_mueller` provides the
full polarization-aware Mueller-matrix BSDF (pplastic.cpp:229-302) for the
stokes integrator's polarized transport.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import mueller as mu
from ..core import warp
from ..core.math import normalize
from ..core.gather import table_gather as _tg
from ..render import fresnel as fr
from ..render import microfacet as mf
from ..render.texture import texture_eval
from . import common
from .roughconductor import _dist_sweep

FLAGS = (common.GlossyReflection | common.DiffuseReflection
         | common.FrontSide)


def _mean_reflectance(value, default):
    """Scalar mean of a constant reflectance prop (texture means default to
    the reference's parameters_changed() fallback behavior)."""
    if value is None:
        return default
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, (list, tuple)):
        return float(np.mean([float(v) for v in value]))
    if isinstance(value, dict) and isinstance(value.get("value"),
                                              (int, float)):
        return float(value["value"])
    return default


def build(props, builder):
    int_ior = fr.lookup_ior(props.get("int_ior", "polypropylene"))
    ext_ior = fr.lookup_ior(props.get("ext_ior", "air"))
    eta = int_ior / ext_ior
    alpha = float(props.get("alpha", 0.1))
    # specular sampling weight = s_mean / (d_mean + s_mean)
    # (pplastic.cpp parameters_changed)
    d_mean = _mean_reflectance(props.get("diffuse_reflectance"), 0.5)
    s_mean = _mean_reflectance(props.get("specular_reflectance"), 1.0)
    return {
        "eta": np.float32(eta),
        "alpha_u": np.float32(props.get("alpha_u", alpha)),
        "alpha_v": np.float32(props.get("alpha_v", alpha)),
        "dist": np.int32(mf.distr_type(props.get("distribution",
                                                 "beckmann"))),
        "diffuse_reflectance": np.int32(
            builder.texture(props.get("diffuse_reflectance", 0.5))),
        "specular_reflectance": np.int32(
            builder.texture(props.get("specular_reflectance", 1.0))),
        "spec_weight": np.float32(s_mean / max(d_mean + s_mean, 1e-6)),
        "twosided": builder.twosided_flag(props),
    }


def _spec_terms(params, slot, wi, wo):
    """(D, G, G1(wi,H), H) for the per-lane distribution."""
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)
    h = normalize(wi + wo)

    def per_dist(ty):
        return (mf.eval_d(ty, h, au, av),
                mf.g_smith(ty, wi, wo, h, au, av),
                mf.smith_g1(ty, wi, h, au, av))

    d, g, g1 = _dist_sweep(params, slot, per_dist)
    return d, g, g1, h


def _pdf(params, slot, wi, wo, act):
    """Lobe-mixture pdf (pplastic.cpp:336-375): constant spec weight,
    visible-normal specular density + cosine diffuse density."""
    d, _g, g1, h = _spec_terms(params, slot, wi, wo)
    cos_i = wi[..., 2]
    p_spec = d * g1 / jnp.maximum(4.0 * cos_i, 1e-12)
    p_spec = jnp.where((jnp.sum(wi * h, -1) > 0) & (jnp.sum(wo * h, -1) > 0),
                       p_spec, 0.0)
    ws = _tg(params["spec_weight"], slot)
    pdf = ws * p_spec + (1.0 - ws) * warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(act, pdf, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    wo = jnp.where(flip[..., None], common.flip_z(wo), wo)
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    act = active & (cos_i > 0.0) & (cos_o > 0.0)
    eta = _tg(params["eta"], slot)

    d, g, _g1, h = _spec_terms(params, slot, wi, wo)
    f, _, _, _ = fr.fresnel(jnp.sum(wi * h, -1), eta)
    spec = texture_eval(scene, _tg(params["specular_reflectance"], slot),
                        si.uv, si.wavelengths, act)
    spec_val = spec * (f * d * g / jnp.maximum(4.0 * cos_i, 1e-12))[..., None]

    # diffuse attenuated by the in/out refractions (pplastic.cpp:319-329)
    f_i, _, _, _ = fr.fresnel(cos_i, eta)
    f_o, _, _, _ = fr.fresnel(cos_o, eta)
    diff = texture_eval(scene, _tg(params["diffuse_reflectance"], slot),
                        si.uv, si.wavelengths, act)
    diff_val = diff * ((1.0 - f_i) * (1.0 - f_o)
                       * cos_o / jnp.pi)[..., None]

    value = jnp.where(act[..., None], spec_val + diff_val, 0.0)
    return value, _pdf(params, slot, wi, wo, act)


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    act = active & (wi[..., 2] > 0.0)
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)
    ws = _tg(params["spec_weight"], slot)
    sel_spec = s1 < ws

    def per_dist(ty):
        m, _ = mf.sample(ty, wi, au, av, s2)
        return (m,)
    (m,) = _dist_sweep(params, slot, per_dist)
    wo = jnp.where(sel_spec[..., None], fr.reflect_m(wi, m),
                   warp.square_to_cosine_hemisphere(s2))
    act_o = act & (wo[..., 2] > 0.0)

    wo_world = jnp.where(flip[..., None], common.flip_z(wo), wo)
    value, pdf = eval_pdf(scene, params, slot, si, wo_world, active, mode)
    weight = jnp.where((act_o & (pdf > 0))[..., None],
                       value / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
    lobe = jnp.where(sel_spec,
                     jnp.uint32(common.GlossyReflection | common.FrontSide),
                     jnp.uint32(common.DiffuseReflection | common.FrontSide))
    bs = common.BSDFSample(
        wo=wo_world, pdf=jnp.where(act_o, pdf, 0.0),
        eta=jnp.ones_like(pdf), sampled_type=lobe)
    return bs, weight


def _safe_cross_basis(a, b, fallback_d):
    """normalize(cross(a, b)) with a stokes_basis fallback where the cross
    degenerates (normal incidence) — any frame is valid there since the
    Fresnel Mueller matrix is rotationally symmetric at cos=1."""
    c = jnp.cross(a, b)
    n2 = jnp.sum(c * c, -1, keepdims=True)
    ok = n2 > 1e-12
    c = jnp.where(ok, c, 1.0)  # double-where: keep NaN out of the VJP
    c = c / jnp.sqrt(jnp.where(ok, jnp.sum(c * c, -1, keepdims=True), 1.0))
    return jnp.where(ok, c, mu.stokes_basis(fallback_d))


def eval_mueller(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    """Polarization-aware eval (pplastic.cpp:229-302): per-channel Mueller
    matrices (..., nc, 4, 4) expressed in the implicit stokes_basis frames
    of -wo_hat (incident light) and wi_hat (outgoing light)."""
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    wo = jnp.where(flip[..., None], common.flip_z(wo), wo)
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    act = active & (cos_i > 0.0) & (cos_o > 0.0)
    eta = _tg(params["eta"], slot)

    # light arrives along -wo_hat, leaves along +wi_hat (pplastic.cpp:236)
    wo_hat = wo if mode == common.RADIANCE else wi
    wi_hat = wi if mode == common.RADIANCE else wo

    d, g, _g1, h = _spec_terms(params, slot, wi, wo)
    f_m = mu.specular_reflection(jnp.sum(wo_hat * h, -1), eta)
    s_in = _safe_cross_basis(h, -wo_hat, -wo_hat)
    s_out = _safe_cross_basis(h, wi_hat, wi_hat)
    f_m = mu.rotate_mueller_basis(
        f_m, -wo_hat, s_in, mu.stokes_basis(-wo_hat),
        wi_hat, s_out, mu.stokes_basis(wi_hat))
    spec = texture_eval(scene, _tg(params["specular_reflectance"], slot),
                        si.uv, si.wavelengths, act)
    spec_m = (spec * (d * g / jnp.maximum(4.0 * cos_i, 1e-12))[..., None]
              )[..., None, None] * f_m[..., None, :, :]

    # diffuse: refract in (To), depolarized subsurface, refract out (Ti)
    t_o = mu.specular_transmission(jnp.abs(wo_hat[..., 2]), eta)
    diff = texture_eval(scene, _tg(params["diffuse_reflectance"], slot),
                        si.uv, si.wavelengths, act)
    inv_eta = 1.0 / eta
    _, cos_t_i, _, eta_ti = fr.fresnel(cos_i, eta)
    wi_hat_p = -fr.refract(wi_hat, cos_t_i, eta_ti)
    t_i = mu.specular_transmission(jnp.abs(wi_hat_p[..., 2]), inv_eta)
    diff_m = t_i @ mu.depolarizer(1.0) @ t_o
    n = jnp.zeros_like(wo_hat).at[..., 2].set(1.0)
    s_in = _safe_cross_basis(n, -wo_hat, -wo_hat)
    s_out = _safe_cross_basis(n, wi_hat, wi_hat)
    diff_m = mu.rotate_mueller_basis(
        diff_m, -wo_hat, s_in, mu.stokes_basis(-wo_hat),
        wi_hat, s_out, mu.stokes_basis(wi_hat))
    diff_m = (diff * (cos_o / jnp.pi)[..., None]
              )[..., None, None] * diff_m[..., None, :, :]

    out = spec_m + diff_m
    return jnp.where(act[..., None, None, None], out, 0.0)
