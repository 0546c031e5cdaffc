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


def sample_mueller_weight(scene, params, slot, si, bs, weight, active,
                          mode=common.RADIANCE):
    """Polarized delta-dielectric weight (dielectric.cpp:250-307): the
    Fresnel reflection/transmission Mueller matrix of the selected lobe
    divided by the lobe pdf, rotated from the plane-of-incidence s/p frame
    into the implicit local Stokes bases, with reflectance/transmittance
    absorbers and the radiance-mode eta_ti^2 solid-angle compression."""
    from ..core import mueller as mu

    eta = _tg(params["eta"], slot)
    wi = si.wi
    cos_i = wi[..., 2]
    act = active & (cos_i != 0.0)

    wo_hat = bs.wo if mode == common.RADIANCE else wi
    wi_hat = wi if mode == common.RADIANCE else bs.wo
    ci = wo_hat[..., 2]
    # the reference's fresnel_polarized handles signed incidence internally;
    # here the inside-hit case flips the relative ior explicitly
    eta_rel = jnp.where(ci >= 0, eta, 1.0 / eta)
    R = mu.specular_reflection(jnp.abs(ci), eta_rel)
    T = mu.specular_transmission(jnp.abs(ci), eta_rel)

    selected_r = (bs.sampled_type & common.DeltaReflection) != 0
    r, _cos_t, _eta_it, eta_ti = fr.fresnel(cos_i, eta)
    pdf = jnp.where(selected_r, r, 1.0 - r)
    m4 = jnp.where(selected_r[..., None, None], R, T) \
        / jnp.maximum(pdf, 1e-12)[..., None, None]

    # s axis perpendicular to the plane of incidence (dielectric.cpp:272-274)
    n = jnp.zeros_like(wo_hat).at[..., 2].set(1.0)

    def safe_basis(v, d):
        n2 = jnp.sum(v * v, -1, keepdims=True)
        ok = n2 > 1e-14
        v = jnp.where(ok, v, 1.0)
        v = v / jnp.sqrt(jnp.where(ok, jnp.sum(v * v, -1, keepdims=True), 1.0))
        return jnp.where(ok, v, mu.stokes_basis(d))

    s_in = safe_basis(jnp.cross(n, -wo_hat), -wo_hat)
    s_out = safe_basis(jnp.cross(n, wi_hat), wi_hat)
    m4 = mu.rotate_mueller_basis(
        m4, -wo_hat, s_in, mu.stokes_basis(-wo_hat),
        wi_hat, s_out, mu.stokes_basis(wi_hat))

    refl = texture_eval(scene, _tg(params["specular_reflectance"], slot),
                        si.uv, si.wavelengths, act)
    trans = texture_eval(scene, _tg(params["specular_transmittance"], slot),
                         si.uv, si.wavelengths, act)
    factor = jnp.square(eta_ti) if mode == common.RADIANCE \
        else jnp.ones_like(eta_ti)
    ch_scale = jnp.where(selected_r[..., None], refl,
                         trans * factor[..., None])
    out = m4[..., None, :, :] * ch_scale[..., None, None]
    return jnp.where(act[..., None, None, None], out, 0.0)
