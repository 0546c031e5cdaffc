"""Bi-Lambertian BSDF: different diffuse reflectance and transmittance
(canopy leaves). Reference: src/bsdfs/bilambertian.cpp:53-175 [ERADIATE]."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common

FLAGS = (common.DiffuseReflection | common.DiffuseTransmission
         | common.FrontSide | common.BackSide)


def build(props, builder):
    return {
        "reflectance": builder.texture(props.get("reflectance", 0.5)),
        "transmittance": builder.texture(props.get("transmittance", 0.5)),
        "twosided": builder.twosided_flag(props),
    }


def _weights(scene, params, slot, si, active):
    r = texture_eval(scene, _tg(params["reflectance"], slot), si.uv,
                     si.wavelengths, active)
    t = texture_eval(scene, _tg(params["transmittance"], slot), si.uv,
                     si.wavelengths, active)
    denom = jnp.maximum(jnp.mean(r + t, -1), 1e-12)
    w_r = jnp.where(jnp.mean(r + t, -1) > 0, jnp.mean(r, -1) / denom, 0.0)
    return r, t, w_r


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    cos_i = si.wi[..., 2]
    r, t, w_r = _weights(scene, params, slot, si, active)
    wo = warp.square_to_cosine_hemisphere(s2)
    pdf_base = warp.square_to_cosine_hemisphere_pdf(wo)

    sel_r = (s1 < w_r) & active
    value = jnp.where(sel_r[..., None],
                      r / jnp.maximum(w_r, 1e-12)[..., None],
                      t / jnp.maximum(1.0 - w_r, 1e-12)[..., None])
    pdf = jnp.where(sel_r, pdf_base * w_r, pdf_base * (1.0 - w_r))

    # flip into the incoming hemisphere, then flip again for transmission
    wo = jnp.where((cos_i > 0)[..., None], wo, common.flip_z(wo))
    wo = jnp.where(sel_r[..., None], wo, common.flip_z(wo))

    sampled = jnp.where(sel_r,
                        jnp.uint32(common.DiffuseReflection),
                        jnp.uint32(common.DiffuseTransmission))
    bs = common.BSDFSample(wo=wo, pdf=jnp.where(active, pdf, 0.0),
                           eta=jnp.ones_like(pdf), sampled_type=sampled)
    return bs, jnp.where((active & (pdf > 0))[..., None], value, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    cos_i = si.wi[..., 2]
    cos_o = wo[..., 2]
    r, t, w_r = _weights(scene, params, slot, si, active)
    is_reflect = jnp.sign(cos_i) == jnp.sign(cos_o)
    value = jnp.where(is_reflect[..., None], r, t) \
        * (jnp.abs(cos_o) / jnp.pi)[..., None]
    wo_flip_pdf = warp.square_to_cosine_hemisphere_pdf(
        jnp.stack([wo[..., 0], wo[..., 1], jnp.abs(cos_o)], -1))
    pdf = jnp.where(is_reflect, wo_flip_pdf * w_r, wo_flip_pdf * (1.0 - w_r))
    return (jnp.where(active[..., None], value, 0.0),
            jnp.where(active, pdf, 0.0))
