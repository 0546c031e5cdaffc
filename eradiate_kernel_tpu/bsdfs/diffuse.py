"""Smooth Lambertian BSDF (reference: src/bsdfs/diffuse.cpp).

Params: reflectance — texture index. Extra shared column: twosided (bool).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common

FLAGS = common.DiffuseReflection | common.FrontSide


def build(props, builder):
    return {
        "reflectance": builder.texture(props.get("reflectance", 0.5)),
        "twosided": builder.twosided_flag(props),
    }


def _refl(scene, params, slot, si, active):
    return texture_eval(scene, _tg(params["reflectance"], slot), si.uv,
                        si.wavelengths, active,
                        si_extra={"prim_index": si.prim_index,
                                  "prim_uv": si.prim_uv})


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    cos_i = wi[..., 2]
    act = active & (cos_i > 0.0)
    wo = warp.square_to_cosine_hemisphere(s2)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    value = _refl(scene, params, slot, si, act)
    weight = jnp.where(act[..., None], value, 0.0)
    bs = common.BSDFSample(
        wo=jnp.where(flip[..., None], common.flip_z(wo), wo),
        pdf=jnp.where(act, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, FLAGS, jnp.uint32))
    return bs, weight


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    wo = jnp.where(flip[..., None], common.flip_z(wo), wo)
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    act = active & (cos_i > 0.0) & (cos_o > 0.0)
    refl = _refl(scene, params, slot, si, act)
    value = refl * (cos_o[..., None] / jnp.pi)
    pdf = cos_o / jnp.pi
    return (jnp.where(act[..., None], value, 0.0), jnp.where(act, pdf, 0.0))
