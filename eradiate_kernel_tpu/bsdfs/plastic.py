"""Smooth plastic: specular coat over a diffuse base with internal scattering
(reference: src/bsdfs/plastic.cpp).

Params: int_ior/ext_ior, diffuse_reflectance / specular_reflectance textures,
nonlinear (account for saturation from internal scattering).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import warp
from ..render import fresnel as fr
from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common

FLAGS = (common.DeltaReflection | common.DiffuseReflection
         | common.FrontSide)


def build(props, builder):
    int_ior = fr.lookup_ior(props.get("int_ior", "polypropylene"))
    ext_ior = fr.lookup_ior(props.get("ext_ior", "air"))
    eta = int_ior / ext_ior
    # hemispherically-averaged sampling weights (plastic.cpp constructor):
    # use luminance-ish scalar approximations at build time
    return {
        "eta": np.float32(eta),
        "fdr_int": np.float32(
            np.asarray(fr.fresnel_diffuse_reflectance(1.0 / eta))),
        "diffuse_reflectance": np.int32(
            builder.texture(props.get("diffuse_reflectance", 0.5))),
        "specular_reflectance": np.int32(
            builder.texture(props.get("specular_reflectance", 1.0))),
        "nonlinear": np.bool_(props.get("nonlinear", False)),
        "spec_weight": np.float32(props.get("specular_sampling_weight", 0.5)),
        "twosided": builder.twosided_flag(props),
    }


def _probs(params, slot, f_i):
    """Lobe selection probability for the specular component
    (plastic.cpp sample()): prob_spec = F_i * w_s / (F_i w_s + (1-F_i) w_d)."""
    ws = _tg(params["spec_weight"], slot)
    wd = 1.0 - ws
    denom = f_i * ws + (1.0 - f_i) * wd
    return jnp.where(denom > 0, f_i * ws / jnp.maximum(denom, 1e-12), 1.0)


def _diffuse_term(scene, params, slot, si, f_i, f_o, cos_o, active,
                  mode=common.RADIANCE):
    """Internal-scattering-corrected diffuse value WITH cosine
    (plastic.cpp eval())."""
    eta = _tg(params["eta"], slot)
    fdr = _tg(params["fdr_int"], slot)
    nonlinear = _tg(params["nonlinear"], slot)
    diff = texture_eval(scene, _tg(params["diffuse_reflectance"], slot), si.uv,
                        si.wavelengths, active)
    sat = jnp.where(nonlinear[..., None], diff, jnp.ones_like(diff))
    value = diff / (1.0 - sat * fdr[..., None])
    inv_eta_2 = 1.0 / jnp.square(eta)
    value = value * (warp.INV_PI * inv_eta_2 * cos_o
                     * (1.0 - f_i) * (1.0 - f_o))[..., None]
    return value


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    cos_i = wi[..., 2]
    act = active & (cos_i > 0.0)
    eta = _tg(params["eta"], slot)

    f_i, _, _, _ = fr.fresnel(cos_i, eta)
    prob_spec = _probs(params, slot, f_i)
    sel_spec = s1 < prob_spec

    wo_spec = fr.reflect(wi)
    wo_diff = warp.square_to_cosine_hemisphere(s2)
    wo = jnp.where(sel_spec[..., None], wo_spec, wo_diff)
    cos_o = wo[..., 2]
    f_o, _, _, _ = fr.fresnel(cos_o, eta)

    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo) * (1.0 - prob_spec)
    pdf = jnp.where(sel_spec, prob_spec, pdf_diff)

    spec = texture_eval(scene, _tg(params["specular_reflectance"], slot), si.uv,
                        si.wavelengths, act)
    w_spec = spec * (f_i / jnp.maximum(prob_spec, 1e-12))[..., None]
    diff_val = _diffuse_term(scene, params, slot, si, f_i, f_o, cos_o, act, mode)
    w_diff = diff_val / jnp.maximum(pdf_diff, 1e-12)[..., None]
    weight = jnp.where(sel_spec[..., None], w_spec, w_diff)

    lobe = jnp.where(sel_spec,
                     jnp.uint32(common.DeltaReflection | common.FrontSide),
                     jnp.uint32(common.DiffuseReflection | common.FrontSide))
    bs = common.BSDFSample(
        wo=jnp.where(flip[..., None], common.flip_z(wo), wo),
        pdf=jnp.where(act, pdf, 0.0),
        eta=jnp.ones_like(pdf), sampled_type=lobe)
    return bs, jnp.where((act & (pdf > 0))[..., None], weight, 0.0)


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
    value = _diffuse_term(scene, params, slot, si, f_i, f_o, cos_o, act, mode)
    prob_spec = _probs(params, slot, f_i)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo) * (1.0 - prob_spec)
    return (jnp.where(act[..., None], value, 0.0), jnp.where(act, pdf, 0.0))
