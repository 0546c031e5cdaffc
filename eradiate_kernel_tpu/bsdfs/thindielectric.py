"""Thin dielectric sheet (reference: src/bsdfs/thindielectric.cpp).

Both interfaces are accounted for: R' = R + TRT + TR^3T + ... = 2R/(1+R);
transmission leaves the direction unchanged (wo = -wi) and carries no
radiance-compression factor since the medium is not entered (eta = 1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..render import fresnel as fr
from ..render.texture import texture_eval
from ..core.gather import table_gather as _tg
from . import common

FLAGS = (common.DeltaReflection | common.Null
         | common.FrontSide | common.BackSide)


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
    r, _, _, _ = fr.fresnel(jnp.abs(cos_i), eta)
    # double-interface compound reflectance (thindielectric.cpp:62)
    r = jnp.where(r < 1.0, 2.0 * r / (1.0 + r), 1.0)
    act = active & (cos_i != 0.0)

    select_r = s1 <= r
    wo = jnp.where(select_r[..., None], fr.reflect(wi), -wi)
    pdf = jnp.where(select_r, r, 1.0 - r)
    lobe = jnp.where(select_r,
                     jnp.uint32(common.DeltaReflection | common.FrontSide
                                | common.BackSide),
                     jnp.uint32(common.Null | common.FrontSide
                                | common.BackSide))
    refl = texture_eval(scene, _tg(params["specular_reflectance"], slot), si.uv,
                        si.wavelengths, act)
    trans = texture_eval(scene, _tg(params["specular_transmittance"], slot), si.uv,
                         si.wavelengths, act)
    weight = jnp.where(select_r[..., None], refl, trans)
    bs = common.BSDFSample(wo=wo, pdf=jnp.where(act, pdf, 0.0),
                           eta=jnp.ones_like(pdf), sampled_type=lobe)
    return bs, jnp.where(act[..., None], weight, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.zeros(si.t.shape + (nc,)), jnp.zeros(si.t.shape)


def eval_null_transmission(scene, params, slot, si, active):
    """Straight-through transmittance (1 - R') — lets shadow rays pass with
    attenuation (thindielectric.cpp eval_null_transmission... via Null lobe)."""
    eta = _tg(params["eta"], slot)
    r, _, _, _ = fr.fresnel(jnp.abs(si.wi[..., 2]), eta)
    r = jnp.where(r < 1.0, 2.0 * r / (1.0 + r), 1.0)
    trans = texture_eval(scene, _tg(params["specular_transmittance"], slot), si.uv,
                         si.wavelengths, active)
    return jnp.where(active[..., None], trans * (1.0 - r)[..., None], 0.0)
