"""Rough conductor via microfacet theory (reference: src/bsdfs/roughconductor.cpp).

Params: distribution ('ggx'|'beckmann'), alpha / alpha_u / alpha_v (scalar
roughness; texture support can layer on later), eta/k spectra,
specular_reflectance texture.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..render import fresnel as fr
from ..render import microfacet as mf
from ..render.texture import scene_spectrum_eval, texture_eval
from ..core.gather import table_gather as _tg
from . import common
from .conductor import _eta_k

FLAGS = common.GlossyReflection | common.FrontSide


def build(props, builder):
    eta, k = _eta_k(props, builder)
    alpha = float(props.get("alpha", 0.1))
    return {
        "eta": np.int32(eta),
        "k": np.int32(k),
        "alpha_u": np.float32(props.get("alpha_u", alpha)),
        "alpha_v": np.float32(props.get("alpha_v", alpha)),
        "dist": np.int32(mf.distr_type(props.get("distribution", "ggx"))),
        "specular_reflectance": np.int32(
            builder.texture(props.get("specular_reflectance", 1.0))),
        "twosided": builder.twosided_flag(props),
    }


def _dist_sweep(params, slot, fn):
    """Run fn(dist_type) for the (at most two) distribution types present and
    blend by the per-lane dist id. Keeps dist a data column while tracing
    both branches only when both exist."""
    dist = _tg(params["dist"], slot)
    types = [mf.GGX, mf.BECKMANN]
    out = None
    for ty in types:
        res = fn(ty)
        m = dist == ty
        if out is None:
            out = [jnp.where(m[..., None] if r.ndim > m.ndim else m, r, 0.0)
                   for r in res]
        else:
            out = [jnp.where(m[..., None] if r.ndim > m.ndim else m, r, o)
                   for r, o in zip(res, out)]
    return out


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    cos_i = wi[..., 2]
    act = active & (cos_i > 0.0)
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)

    def per_dist(ty):
        m, pdf_m = mf.sample(ty, wi, au, av, s2)
        wo = fr.reflect_m(wi, m)
        cos_o = wo[..., 2]
        ok = (pdf_m > 0) & (cos_o > 0)
        # Jacobian of the half-direction map: dwh/dwo = 1 / (4 |wo . m|)
        pdf = pdf_m / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * m, -1)), 1e-12)
        # VNDF: weight = F * G2 / G1(wi) (roughconductor.cpp sample())
        w_nof = mf.smith_g1(ty, wo, m, au, av)
        w_nof = jnp.where(ok, w_nof, 0.0)
        pdf = jnp.where(ok, pdf, 0.0)
        return wo, pdf, w_nof, jnp.sum(wi * m, -1)

    wo, pdf, w_nof, cos_im = _dist_sweep(params, slot, per_dist)

    eta = scene_spectrum_eval(scene, _tg(params["eta"], slot), si.wavelengths)
    kk = scene_spectrum_eval(scene, _tg(params["k"], slot), si.wavelengths)
    f = fr.fresnel_conductor(cos_im, eta, kk)
    refl = texture_eval(scene, _tg(params["specular_reflectance"], slot), si.uv,
                        si.wavelengths, act)
    weight = f * refl * w_nof[..., None]

    bs = common.BSDFSample(
        wo=jnp.where(flip[..., None], common.flip_z(wo), wo),
        pdf=jnp.where(act, pdf, 0.0),
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, FLAGS, jnp.uint32))
    return bs, jnp.where((act & (pdf > 0))[..., None], weight, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    wo = jnp.where(flip[..., None], common.flip_z(wo), wo)
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    act = active & (cos_i > 0.0) & (cos_o > 0.0)
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)

    from ..core.math import normalize
    h = normalize(wi + wo)

    def per_dist(ty):
        d = mf.eval_d(ty, h, au, av)
        g = mf.g_smith(ty, wi, wo, h, au, av)
        val = d * g / jnp.maximum(4.0 * cos_i, 1e-12)  # * cos_o included below
        pdf_m = mf.pdf(ty, wi, h, au, av)
        pdf = pdf_m / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-12)
        return val, pdf

    val_nof, pdf = _dist_sweep(params, slot, per_dist)

    eta = scene_spectrum_eval(scene, _tg(params["eta"], slot), si.wavelengths)
    kk = scene_spectrum_eval(scene, _tg(params["k"], slot), si.wavelengths)
    f = fr.fresnel_conductor(jnp.sum(wi * h, -1), eta, kk)
    refl = texture_eval(scene, _tg(params["specular_reflectance"], slot), si.uv,
                        si.wavelengths, act)
    value = f * refl * val_nof[..., None]  # already divided by 4 cos_i;
    # note: D G F / (4 cos_i cos_o) * cos_o = D G F / (4 cos_i)
    return (jnp.where(act[..., None], value, 0.0),
            jnp.where(act, pdf, 0.0))


def eval_mueller(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    """Polarized microfacet eval (roughconductor.cpp:315-340): the smooth
    eval with the scalar conductor Fresnel replaced by the complex-Fresnel
    Mueller matrix about the half vector, rotated from the s/p frame of the
    microfacet reflection into the implicit Stokes bases of (-wo, wi).
    Returns the per-channel (..., nc, 4, 4) stack (value incl. cos_o)."""
    from ..core import mueller as mu
    from ..core.math import normalize

    two = _tg(params["twosided"], slot)
    wi, flip = common.twosided_frame(two, si.wi)
    wo = jnp.where(flip[..., None], common.flip_z(wo), wo)
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    act = active & (cos_i > 0.0) & (cos_o > 0.0)
    au = _tg(params["alpha_u"], slot)
    av = _tg(params["alpha_v"], slot)
    h = normalize(wi + wo)

    def per_dist(ty):
        d = mf.eval_d(ty, h, au, av)
        g = mf.g_smith(ty, wi, wo, h, au, av)
        return (d * g / jnp.maximum(4.0 * cos_i, 1e-12),)

    (val_nof,) = _dist_sweep(params, slot, per_dist)

    eta = scene_spectrum_eval(scene, _tg(params["eta"], slot), si.wavelengths)
    kk = scene_spectrum_eval(scene, _tg(params["k"], slot), si.wavelengths)
    refl = texture_eval(scene, _tg(params["specular_reflectance"], slot),
                        si.uv, si.wavelengths, act)

    wo_hat = wo if mode == common.RADIANCE else wi
    wi_hat = wi if mode == common.RADIANCE else wo
    f_m = mu.specular_reflection(jnp.sum(wo_hat * h, -1)[..., None], eta, kk)

    def safe_basis(v, d):
        n2 = jnp.sum(v * v, -1, keepdims=True)
        ok = n2 > 1e-14
        v = jnp.where(ok, v, 1.0)
        v = v / jnp.sqrt(jnp.where(ok, jnp.sum(v * v, -1, keepdims=True), 1.0))
        return jnp.where(ok, v, mu.stokes_basis(d))

    s_in = safe_basis(jnp.cross(h, -wo_hat), -wo_hat)
    s_out = safe_basis(jnp.cross(h, wi_hat), wi_hat)
    f_m = mu.rotate_mueller_basis(
        f_m, -wo_hat[..., None, :], s_in[..., None, :],
        mu.stokes_basis(-wo_hat)[..., None, :],
        wi_hat[..., None, :], s_out[..., None, :],
        mu.stokes_basis(wi_hat)[..., None, :])
    out = (refl * val_nof[..., None])[..., None, None] * f_m
    return jnp.where(act[..., None, None, None], out, 0.0)
