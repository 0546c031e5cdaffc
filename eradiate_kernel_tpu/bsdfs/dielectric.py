"""Smooth dielectric (reference: src/bsdfs/dielectric.cpp).

Params: int_ior/ext_ior (names or numbers -> eta = int/ext),
specular_reflectance/specular_transmittance textures. Delta reflection +
delta transmission; radiance-mode transmission carries the eta_ti^2
radiance-compression factor (dielectric.cpp sample()).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..render import fresnel as fr
from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common

FLAGS = (common.DeltaReflection | common.DeltaTransmission
         | common.FrontSide | common.BackSide | common.NonSymmetric)


def build(props, builder):
    int_ior = fr.lookup_ior(props.get("int_ior", "bk7"))
    ext_ior = fr.lookup_ior(props.get("ext_ior", "air"))
    return {
        "eta": np.float32(int_ior / ext_ior),
        "specular_reflectance": np.int32(
            builder.texture(props.get("specular_reflectance", 1.0))),
        "specular_transmittance": np.int32(
            builder.texture(props.get("specular_transmittance", 1.0))),
        "twosided": builder.twosided_flag(props),
    }


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    eta = _tg(params["eta"], slot)
    wi = si.wi
    cos_i = wi[..., 2]
    r, cos_t, eta_it, eta_ti = fr.fresnel(cos_i, eta)
    act = active & (cos_i != 0.0)

    select_r = s1 <= r
    wo = jnp.where(select_r[..., None], fr.reflect(wi),
                   fr.refract(wi, cos_t, eta_ti))
    pdf = jnp.where(select_r, r, 1.0 - r)
    bs_eta = jnp.where(select_r, 1.0, eta_it)
    lobe = jnp.where(select_r,
                     jnp.uint32(common.DeltaReflection | common.FrontSide
                                | common.BackSide),
                     jnp.uint32(common.DeltaTransmission | common.FrontSide
                                | common.BackSide | common.NonSymmetric))

    refl = texture_eval(scene, _tg(params["specular_reflectance"], slot), si.uv,
                        si.wavelengths, act)
    trans = texture_eval(scene, _tg(params["specular_transmittance"], slot), si.uv,
                         si.wavelengths, act)
    # radiance transport: transmitted radiance is compressed by eta_ti^2
    # (dielectric.cpp:165-170); importance mode omits the factor
    trans_factor = jnp.square(eta_ti) if mode == common.RADIANCE \
        else jnp.ones_like(eta_ti)
    factor = jnp.where(select_r, 1.0, trans_factor)
    weight = jnp.where(select_r[..., None], refl, trans) * factor[..., None]

    bs = common.BSDFSample(wo=wo, pdf=jnp.where(act, pdf, 0.0),
                           eta=bs_eta, sampled_type=lobe)
    return bs, jnp.where(act[..., None], weight, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.zeros(si.t.shape + (nc,)), jnp.zeros(si.t.shape)


def eval_null_transmission(scene, params, slot, si, active):
    """Unscattered transmission through the interface (bsdf.h
    eval_null_transmission default = 0 for non-null BSDFs)."""
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.zeros(si.t.shape + (nc,))
