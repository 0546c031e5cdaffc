"""Rough plastic: microfacet coat over an internally-scattering diffuse base
(reference: src/bsdfs/roughplastic.cpp).

The reference modulates the diffuse term with tabulated rough-interface
transmittances; we use the smooth Fresnel factors (1-F_i)(1-F_o) — exact in
the alpha->0 limit and within a few percent for the alphas plastic uses.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import warp
from ..core.math import normalize
from ..render import fresnel as fr
from ..render import microfacet as mf
from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common
from .plastic import _diffuse_term
from .roughconductor import _dist_sweep

FLAGS = (common.GlossyReflection | common.DiffuseReflection
         | common.FrontSide)


def build(props, builder):
    int_ior = fr.lookup_ior(props.get("int_ior", "polypropylene"))
    ext_ior = fr.lookup_ior(props.get("ext_ior", "air"))
    eta = int_ior / ext_ior
    alpha = float(props.get("alpha", 0.1))
    return {
        "eta": np.float32(eta),
        "fdr_int": np.float32(
            np.asarray(fr.fresnel_diffuse_reflectance(1.0 / eta))),
        "alpha_u": np.float32(alpha),
        "alpha_v": np.float32(alpha),
        "dist": np.int32(mf.distr_type(props.get("distribution", "ggx"))),
        "diffuse_reflectance": np.int32(
            builder.texture(props.get("diffuse_reflectance", 0.5))),
        "specular_reflectance": np.int32(
            builder.texture(props.get("specular_reflectance", 1.0))),
        "nonlinear": np.bool_(props.get("nonlinear", False)),
        "spec_weight": np.float32(props.get("specular_sampling_weight", 0.5)),
        "twosided": builder.twosided_flag(props),
    }


def _prob_spec(params, slot, f_i):
    ws = _tg(params["spec_weight"], slot)
    wd = 1.0 - ws
    denom = f_i * ws + (1.0 - f_i) * wd
    return jnp.where(denom > 0, f_i * ws / jnp.maximum(denom, 1e-12), 1.0)


def _spec_eval(scene, params, slot, si, wi, wo, act):
    """(value_with_cos, pdf_m-based pdf) of the microfacet lobe."""
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)
    eta = _tg(params["eta"], slot)
    cos_i = wi[..., 2]
    h = normalize(wi + wo)

    def per_dist(ty):
        d = mf.eval_d(ty, h, au, av)
        g = mf.g_smith(ty, wi, wo, h, au, av)
        pdf_m = mf.pdf(ty, wi, h, au, av)
        return d, g, pdf_m

    d, g, pdf_m = _dist_sweep(params, slot, per_dist)
    f, _, _, _ = fr.fresnel(jnp.sum(wi * h, -1), eta)
    val = f * d * g / jnp.maximum(4.0 * cos_i, 1e-12)
    pdf = pdf_m / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-12)
    spec = texture_eval(scene, _tg(params["specular_reflectance"], slot), si.uv,
                        si.wavelengths, act)
    return val[..., None] * spec, pdf


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    cos_i = wi[..., 2]
    act = active & (cos_i > 0.0)
    eta = _tg(params["eta"], slot)
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)

    f_i, _, _, _ = fr.fresnel(cos_i, eta)
    prob_spec = _prob_spec(params, slot, f_i)
    sel_spec = s1 < prob_spec

    def per_dist(ty):
        m, _ = mf.sample(ty, wi, au, av, s2)
        return (m,)
    (m,) = _dist_sweep(params, slot, per_dist)
    wo_spec = fr.reflect_m(wi, m)
    wo_diff = warp.square_to_cosine_hemisphere(s2)
    wo = jnp.where(sel_spec[..., None], wo_spec, wo_diff)
    cos_o = wo[..., 2]
    act_o = act & (cos_o > 0.0)

    value, pdf = eval_pdf(scene, params, slot, si,
                          jnp.where(flip[..., None], common.flip_z(wo), wo),
                          active, mode)
    weight = jnp.where((act_o & (pdf > 0))[..., None],
                       value / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
    lobe = jnp.where(sel_spec,
                     jnp.uint32(common.GlossyReflection | common.FrontSide),
                     jnp.uint32(common.DiffuseReflection | common.FrontSide))
    bs = common.BSDFSample(
        wo=jnp.where(flip[..., None], common.flip_z(wo), wo),
        pdf=jnp.where(act_o, pdf, 0.0),
        eta=jnp.ones_like(pdf), sampled_type=lobe)
    return bs, weight


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    wo = jnp.where(flip[..., None], common.flip_z(wo), wo)
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    act = active & (cos_i > 0.0) & (cos_o > 0.0)
    eta = _tg(params["eta"], slot)

    f_i, _, _, _ = fr.fresnel(cos_i, eta)
    f_o, _, _, _ = fr.fresnel(cos_o, eta)
    spec_val, spec_pdf = _spec_eval(scene, params, slot, si, wi, wo, act)
    diff_val = _diffuse_term(scene, params, slot, si, f_i, f_o, cos_o, act, mode)
    value = spec_val + diff_val

    prob_spec = _prob_spec(params, slot, f_i)
    pdf = prob_spec * spec_pdf \
        + (1.0 - prob_spec) * warp.square_to_cosine_hemisphere_pdf(wo)
    return (jnp.where(act[..., None], value, 0.0), jnp.where(act, pdf, 0.0))
