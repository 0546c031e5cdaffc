"""Perfectly smooth conductor (reference: src/bsdfs/conductor.cpp).

Params: eta, k — spectrum indices (complex relative IOR); material presets
from fresnel.CONDUCTOR_PRESETS; specular_reflectance — texture index.
Default material is "none" (perfect mirror, conductor.cpp docs).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..render import fresnel as fr
from ..render.texture import scene_spectrum_eval, texture_eval
from ..core.gather import table_gather as _tg
from . import common

FLAGS = common.DeltaReflection | common.FrontSide


def _eta_k(props, builder):
    def unbounded(v):
        # eta/k exceed 1, which the srgb-upsampling placeholder for rgb
        # triples clamps away in spectral mode — fall back to the mean there
        if builder.variant.is_spectral and isinstance(v, (list, tuple)):
            return builder.spectrum({"type": "uniform",
                                     "value": float(np.mean(v))})
        return builder.spectrum(v)

    mat = props.get("material", "none")
    if "eta" in props or "k" in props:
        eta = unbounded(props.get("eta", 0.0))
        k = unbounded(props.get("k", 1.0))
    else:
        eta_rgb, k_rgb = fr.CONDUCTOR_PRESETS[mat.lower()]
        eta = unbounded(list(eta_rgb))
        k = unbounded(list(k_rgb))
    return eta, k


def build(props, builder):
    eta, k = _eta_k(props, builder)
    return {
        "eta": np.int32(eta),
        "k": np.int32(k),
        "specular_reflectance": np.int32(
            builder.texture(props.get("specular_reflectance", 1.0))),
        "twosided": builder.twosided_flag(props),
    }


def _fresnel_term(scene, params, slot, si, cos_i, active):
    eta = scene_spectrum_eval(scene, _tg(params["eta"], slot), si.wavelengths)
    k = scene_spectrum_eval(scene, _tg(params["k"], slot), si.wavelengths)
    f = fr.fresnel_conductor(cos_i, eta, k)
    refl = texture_eval(scene, _tg(params["specular_reflectance"], slot), si.uv,
                        si.wavelengths, active)
    return f * refl


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    cos_i = wi[..., 2]
    act = active & (cos_i > 0.0)
    wo = fr.reflect(wi)
    weight = _fresnel_term(scene, params, slot, si, cos_i, act)
    bs = common.BSDFSample(
        wo=jnp.where(flip[..., None], common.flip_z(wo), wo),
        pdf=jnp.where(act, 1.0, 0.0),
        eta=jnp.ones_like(cos_i),
        sampled_type=jnp.full(cos_i.shape, FLAGS, jnp.uint32))
    return bs, jnp.where(act[..., None], weight, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    nc = si.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    return jnp.zeros(si.t.shape + (nc,)), jnp.zeros(si.t.shape)


def sample_mueller_weight(scene, params, slot, si, bs, weight, active,
                          mode=common.RADIANCE):
    """Polarized specular-reflection weight (conductor.cpp:242-264): the
    complex-Fresnel Mueller matrix per channel, rotated from the s/p plane
    of incidence into the implicit local Stokes bases of (-bs.wo, si.wi),
    attenuated by specular_reflectance as an absorber. pdf is 1 (delta)."""
    from ..core import mueller as mu
    from ..core.math import normalize as _normalize

    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    wo = jnp.where(flip[..., None], common.flip_z(bs.wo), bs.wo)
    cos_i = wi[..., 2]
    act = active & (cos_i > 0.0)

    eta = scene_spectrum_eval(scene, _tg(params["eta"], slot), si.wavelengths)
    k = scene_spectrum_eval(scene, _tg(params["k"], slot), si.wavelengths)
    refl = texture_eval(scene, _tg(params["specular_reflectance"], slot),
                        si.uv, si.wavelengths, act)

    wo_hat = wo if mode == common.RADIANCE else wi
    wi_hat = wi if mode == common.RADIANCE else wo
    # per-channel Fresnel Mueller (cos broadcast over the channel axis)
    f_m = mu.specular_reflection(wo_hat[..., 2:3], eta, k)  # (..., nc, 4, 4)

    # s axis perpendicular to the plane of incidence (conductor.cpp:255-257);
    # at normal incidence the plane degenerates — any basis works there
    n = jnp.zeros_like(wo_hat).at[..., 2].set(1.0)

    def safe_basis(v, d):
        n2 = jnp.sum(v * v, -1, keepdims=True)
        ok = n2 > 1e-14
        v = jnp.where(ok, v, 1.0)
        v = v / jnp.sqrt(jnp.where(ok, jnp.sum(v * v, -1, keepdims=True), 1.0))
        return jnp.where(ok, v, mu.stokes_basis(d))

    s_in = safe_basis(jnp.cross(n, -wo_hat), -wo_hat)
    s_out = safe_basis(jnp.cross(n, wi_hat), wi_hat)
    f_m = mu.rotate_mueller_basis(
        f_m, -wo_hat[..., None, :], s_in[..., None, :],
        mu.stokes_basis(-wo_hat)[..., None, :],
        wi_hat[..., None, :], s_out[..., None, :],
        mu.stokes_basis(wi_hat)[..., None, :])
    f_m = f_m * refl[..., None, None]
    return jnp.where(act[..., None, None, None], f_m, 0.0)
