"""Data-driven measured BRDF (reference: src/bsdfs/measured.cpp — the
Dupuy & Jakob 2018 adaptively-parameterized measured-material format).

A `.bsdf` tensor file stores, on a (phi_i, theta_i) grid of incident
directions: the microfacet NDF and projected area sigma, a VNDF warp over the
half-vector unit square, a luminance warp for importance sampling, and
spectral measurements parameterized over the VNDF-warped unit square.
Sampling = luminance warp ∘ VNDF warp ∘ microfacet reflection
(measured.cpp:170-270); eval/pdf invert the same chain (measured.cpp:272-381).

TPU mapping: the five Marginal2D interpolants become `core.marginal2d` table
pytrees; because each slot's tables have distinct static resolutions, dispatch
sweeps slots statically (tables stay shared across lanes — no per-lane
gather of whole grids). Table prep happens host-side at scene build.

Spectral lookups use si.wavelengths; in rgb/mono variants (where the
reference refuses to run, measured.cpp:27-28) we evaluate the spectra at
fixed representative primaries instead — a documented extension.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import marginal2d as m2d
from ..core.math import normalize, safe_asin
from . import common

FLAGS = common.GlossyReflection | common.FrontSide

_RGB_REP_WAVELENGTHS = (612.0, 549.0, 465.0)


def build(props, builder):
    if "fields" in props:
        fields = props["fields"]
    else:
        from ..utils.tensorfile import read_tensor_file
        fields = read_tensor_file(props["filename"])

    theta_i = np.asarray(fields["theta_i"], np.float32)
    phi_i = np.asarray(fields["phi_i"], np.float32)
    wav = np.asarray(fields["wavelengths"], np.float32)
    ndf = np.asarray(fields["ndf"], np.float32)
    sigma = np.asarray(fields["sigma"], np.float32)
    vndf = np.asarray(fields["vndf"], np.float32)
    lum = np.asarray(fields["luminance"], np.float32)
    spectra = np.asarray(fields["spectra"], np.float32)
    jac = bool(np.asarray(fields.get("jacobian", [1])).ravel()[0])

    P, T = len(phi_i), len(theta_i)
    L = len(wav)
    assert vndf.shape[:2] == (P, T) and lum.shape[:2] == (P, T)
    assert spectra.shape[:3] == (P, T, L)

    isotropic = P <= 2
    reduction = 0
    if not isotropic:
        reduction = int(round((2 * np.pi) / (phi_i[-1] - phi_i[0])))

    vndf_tabs = m2d.build_continuous(vndf, normalize=True)
    lum_tabs = m2d.build_continuous(lum, normalize=True)

    static = ((P, T, L),
              tuple(vndf.shape[-2:]), tuple(lum.shape[-2:]),
              tuple(spectra.shape[-2:]),
              tuple(ndf.shape), tuple(sigma.shape),
              isotropic, jac, reduction)
    return {
        "phi_i": phi_i, "theta_i": theta_i, "wavelengths": wav,
        "ndf": ndf, "sigma": sigma, "spectra": spectra,
        "vndf_data": vndf_tabs["data"],
        "vndf_cond": vndf_tabs["cond_cdf"],
        "vndf_marg": vndf_tabs["marg_cdf"],
        "lum_data": lum_tabs["data"],
        "lum_cond": lum_tabs["cond_cdf"],
        "lum_marg": lum_tabs["marg_cdf"],
        "twosided": np.bool_(props.get("_twosided", False)),
        "_static": static,
    }


# --- per-slot table views -------------------------------------------------------

def _statics(scene):
    for kind, slots in getattr(scene.config, "bsdf_static", ()):
        if kind == "measured":
            return slots
    return ()


def _slot_tables(params, st, s):
    """Statically slice this slot's stacked (possibly padded) arrays back to
    their true shapes so all marginal2d index math sees real sizes."""
    (P, T, L), (vh, vw), (lh, lw), (sh, sw), ndf_hw, sig_hw, iso, jac, red = st
    pv2 = (params["phi_i"][s][:P], params["theta_i"][s][:T])
    pv3 = pv2 + (params["wavelengths"][s][:L],)
    return dict(
        pv2=pv2, pv3=pv3, iso=iso, jac=jac, red=red,
        vndf={"data": params["vndf_data"][s][:P, :T, :vh, :vw],
              "cond_cdf": params["vndf_cond"][s][:P, :T, :vh, :vw - 1],
              "marg_cdf": params["vndf_marg"][s][:P, :T, :vh - 1]},
        lum={"data": params["lum_data"][s][:P, :T, :lh, :lw],
             "cond_cdf": params["lum_cond"][s][:P, :T, :lh, :lw - 1],
             "marg_cdf": params["lum_marg"][s][:P, :T, :lh - 1]},
        spectra={"data": params["spectra"][s][:P, :T, :L, :sh, :sw]},
        ndf={"data": params["ndf"][s][:ndf_hw[0], :ndf_hw[1]]},
        sigma={"data": params["sigma"][s][:sig_hw[0], :sig_hw[1]]},
    )


# --- angular parameterization (measured.cpp:398-412) -----------------------------

def _elevation(d):
    """Numerically stable acos(cos_theta) (measured.cpp:165-168)."""
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    dist = jnp.sqrt(dx * dx + dy * dy + (dz - 1.0) ** 2)
    return 2.0 * safe_asin(0.5 * dist)


def _u2theta(u):
    return u * u * (np.pi / 2.0)


def _u2phi(u):
    return (2.0 * u - 1.0) * np.pi


def _theta2u(theta):
    return jnp.sqrt(theta * (2.0 / np.pi))


def _phi2u(phi):
    return (phi + np.pi) * (0.5 / np.pi)


def _mulsign_neg(a, b):
    return jnp.where(b >= 0, -a, a)


def _lane_wavelengths(si, nc):
    if si.wavelengths.shape[-1]:
        return si.wavelengths
    reps = _RGB_REP_WAVELENGTHS[:nc] if nc <= 3 else \
        _RGB_REP_WAVELENGTHS + (550.0,) * (nc - 3)
    return jnp.broadcast_to(jnp.asarray(reps, jnp.float32),
                            si.t.shape + (nc,))


def _reduce_in(tabs, wi, wo=None):
    """Fold wi (and wo) into the measured sector for anisotropic data with
    symmetry reduction (measured.cpp:186-191, 284-292)."""
    if tabs["red"] < 2:
        return wi, wo, None, None
    sy = wi[..., 1]
    sx = wi[..., 0] if tabs["red"] == 4 else sy
    def fold(v):
        return jnp.stack([_mulsign_neg(v[..., 0], sx),
                          _mulsign_neg(v[..., 1], sy),
                          v[..., 2]], axis=-1)
    return fold(wi), (None if wo is None else fold(wo)), sx, sy


def _spectra_eval(tabs, pos, phi_i, theta_i, wl, active):
    """Per-channel spectral lookup at the VNDF-inverted position
    (measured.cpp:254-262, 312-320)."""
    nc = wl.shape[-1]
    out = []
    for c in range(nc):
        out.append(m2d.eval(tabs["spectra"], pos, tabs["pv3"],
                            (phi_i, theta_i, wl[..., c]), active))
    return jnp.stack(out, axis=-1)


def _invert_chain(tabs, wi, wo, active):
    """Shared eval/pdf chain: half-vector -> unit square -> VNDF invert.
    Returns (sample_pos, vndf_pdf, u_m, u_wi, phi_i, theta_i, m)."""
    m = normalize(wi + wo)
    theta_i = _elevation(wi)
    phi_i = jnp.arctan2(wi[..., 1], wi[..., 0])
    theta_m = _elevation(m)
    phi_m = jnp.arctan2(m[..., 1], m[..., 0])

    u_m_x = _theta2u(theta_m)
    u_m_y = _phi2u(phi_m - phi_i if tabs["iso"] else phi_m)
    u_m_y = u_m_y - jnp.floor(u_m_y)
    u_m = jnp.stack([u_m_x, u_m_y], axis=-1)
    u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], axis=-1)

    pos, vndf_pdf = m2d.invert(tabs["vndf"], u_m, tabs["pv2"],
                               (phi_i, theta_i), active)
    return pos, vndf_pdf, u_m, u_wi, phi_i, theta_i, m


def _sample_jacobian(u_m_x, sin_theta_m, wi, m):
    """d(wo)/d(u_m) of the warp chain (measured.cpp:227-228, 373-375)."""
    return jnp.maximum(2.0 * np.pi ** 2 * u_m_x * sin_theta_m, 1e-6) * 4.0 \
        * jnp.sum(wi * m, axis=-1)


def _eval_pdf_slot(tabs, si, wo_in, active, nc):
    wi0, wo0, _, _ = _reduce_in(tabs, si.wi, wo_in)
    cos_i = wi0[..., 2]
    cos_o = wo0[..., 2]
    act = active & (cos_i > 0) & (cos_o > 0)

    pos, vndf_pdf, u_m, u_wi, phi_i, theta_i, m = \
        _invert_chain(tabs, wi0, wo0, act)

    wl = _lane_wavelengths(si, nc)
    spec = _spectra_eval(tabs, pos, phi_i, theta_i, wl, act)
    if tabs["jac"]:
        ndf_v = m2d.eval(tabs["ndf"], u_m, (), (), act)
        sigma_v = m2d.eval(tabs["sigma"], u_wi, (), (), act)
        spec = spec * (ndf_v / jnp.maximum(4.0 * sigma_v, 1e-12))[..., None]

    lum_pdf = m2d.eval(tabs["lum"], pos, tabs["pv2"], (phi_i, theta_i), act)
    sin_theta_m = jnp.sqrt(jnp.clip(1.0 - m[..., 2] ** 2, 0.0, 1.0))
    pdf = vndf_pdf * lum_pdf / _sample_jacobian(u_m[..., 0], sin_theta_m,
                                                wi0, m)
    return (jnp.where(act[..., None], spec, 0.0),
            jnp.where(act & (pdf > 0), pdf, 0.0))


def _sample_slot(tabs, si, s2, active, nc):
    wi0, _, sx, sy = _reduce_in(tabs, si.wi)
    cos_i = wi0[..., 2]
    act = active & (cos_i > 0)

    theta_i = _elevation(wi0)
    phi_i = jnp.arctan2(wi0[..., 1], wi0[..., 0])
    u_wi = jnp.stack([_theta2u(theta_i), _phi2u(phi_i)], axis=-1)

    # luminance warp feeds the VNDF warp (measured.cpp:201-231)
    smp = jnp.stack([s2[..., 1], s2[..., 0]], axis=-1)
    smp, lum_pdf = m2d.sample(tabs["lum"], smp, tabs["pv2"],
                              (phi_i, theta_i), act)
    u_m, vndf_pdf = m2d.sample(tabs["vndf"], smp, tabs["pv2"],
                               (phi_i, theta_i), act)

    phi_m = _u2phi(u_m[..., 1])
    theta_m = _u2theta(u_m[..., 0])
    if tabs["iso"]:
        phi_m = phi_m + phi_i
    sin_t, cos_t = jnp.sin(theta_m), jnp.cos(theta_m)
    m = jnp.stack([jnp.cos(phi_m) * sin_t, jnp.sin(phi_m) * sin_t, cos_t],
                  axis=-1)

    wo = 2.0 * jnp.sum(m * wi0, -1, keepdims=True) * m - wi0
    pdf = vndf_pdf * lum_pdf / _sample_jacobian(u_m[..., 0], sin_t, wi0, m)

    wl = _lane_wavelengths(si, nc)
    spec = _spectra_eval(tabs, smp, phi_i, theta_i, wl, act)
    if tabs["jac"]:
        ndf_v = m2d.eval(tabs["ndf"], u_m, (), (), act)
        sigma_v = m2d.eval(tabs["sigma"], u_wi, (), (), act)
        spec = spec * (ndf_v / jnp.maximum(4.0 * sigma_v, 1e-12))[..., None]

    if sx is not None:
        wo = jnp.stack([_mulsign_neg(wo[..., 0], sx),
                        _mulsign_neg(wo[..., 1], sy),
                        wo[..., 2]], axis=-1)
    act = act & (wo[..., 2] > 0) & (pdf > 0)
    weight = jnp.where(act[..., None],
                       spec / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
    return wo, jnp.where(act, pdf, 0.0), weight


# --- registry interface -----------------------------------------------------------

def _nc(scene, si):
    cfg = scene.config
    return si.wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    statics = _statics(scene)
    nc = _nc(scene, si)
    two = params["twosided"]
    value = jnp.zeros(si.t.shape + (nc,))
    pdf = jnp.zeros(si.t.shape)
    for s, st in enumerate(statics):
        m = active & (slot == s)
        wi, flip = common.twosided_frame(jnp.broadcast_to(two[s], si.t.shape),
                                         si.wi)
        wo_s = jnp.where(flip[..., None], common.flip_z(wo), wo)
        tabs = _slot_tables(params, st, s)
        v, p = _eval_pdf_slot(tabs, si.replace(wi=wi), wo_s, m, nc)
        value = jnp.where(m[..., None], v, value)
        pdf = jnp.where(m, p, pdf)
    return value, pdf


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    statics = _statics(scene)
    nc = _nc(scene, si)
    two = params["twosided"]
    bs, weight = common.zero_bsdf_sample(si.t.shape, nc)
    for s, st in enumerate(statics):
        m = active & (slot == s)
        wi, flip = common.twosided_frame(jnp.broadcast_to(two[s], si.t.shape),
                                         si.wi)
        tabs = _slot_tables(params, st, s)
        wo, pdf, w = _sample_slot(tabs, si.replace(wi=wi), s2, m, nc)
        wo = jnp.where(flip[..., None], common.flip_z(wo), wo)
        sel = m
        bs = common.BSDFSample(
            wo=jnp.where(sel[..., None], wo, bs.wo),
            pdf=jnp.where(sel, pdf, bs.pdf),
            eta=bs.eta,
            sampled_type=jnp.where(
                sel, jnp.uint32(common.GlossyReflection | common.FrontSide),
                bs.sampled_type))
        weight = jnp.where(sel[..., None], w, weight)
    return bs, weight
