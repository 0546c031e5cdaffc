"""Measured polarized pBRDF (reference: src/bsdfs/measured_polarized.cpp —
the Baek et al. 2020 KAIST image-based polarimetric reflectance dataset).

A `.pbsdf` tensor file stores full 4x4 Mueller matrices on an isotropic
Rusinkiewicz grid (phi_d, theta_d, theta_h) x 5 wavelength bands. The
reference wraps the data in a ``Marginal2D<4, true>`` whose "2D grid" is the
4x4 matrix itself, with the four axes as conditioning parameters
(measured_polarized.cpp:99,154-166); evaluation at exact grid nodes
(j/3, i/3) picks element (i, j). Here the same multilinear parameter blend
gathers the whole 4x4 block per interpolation corner in one shot.

Sampling is data-independent: a fixed mixture of cosine-hemisphere (weight
0.1) and GGX visible-normal sampling at a user `alpha_sample` roughness
(measured_polarized.cpp:13,183-204) — any alpha is unbiased, only noise
varies. `eval_pdf` returns the unpolarized M00 x cos(theta_o); `eval_mueller`
performs the standard-frame rotation + Rusinkiewicz lookup + Stokes-basis
alignment of measured_polarized.cpp:218-289 for polarized transport.

Spectral variants evaluate at si.wavelengths (clamped to the measured
450-650nm range like the reference's Marginal2D parameter clamp); rgb/mono
variants use fixed representative primaries (the reference refuses
non-spectral modes, measured_polarized.cpp:102-103).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import mueller as mu
from ..core import warp
from ..core.marginal2d import _interp_corners
from ..core.math import normalize, safe_acos
from ..render import microfacet as mf
from . import common

FLAGS = common.GlossyReflection | common.FrontSide

_COSINE_WEIGHT = 0.1  # measured_polarized.cpp:13
_RGB_REP_WAVELENGTHS = (612.0, 549.0, 465.0)


def build(props, builder):
    if "fields" in props:
        fields = props["fields"]
    else:
        from ..utils.tensorfile import read_tensor_file
        fields = read_tensor_file(props["filename"])

    theta_h = np.asarray(fields["theta_h"], np.float32).ravel()
    theta_d = np.asarray(fields["theta_d"], np.float32).ravel()
    phi_d = np.asarray(fields["phi_d"], np.float32).ravel()
    wvls = np.asarray(fields["wvls"], np.float32).ravel()
    m = np.asarray(fields["M"], np.float32)

    P, T, H, L = len(phi_d), len(theta_d), len(theta_h), len(wvls)
    assert m.shape == (P, T, H, L, 4, 4), m.shape

    return {
        "m": m,
        "phi_d": phi_d, "theta_d": theta_d, "theta_h": theta_h,
        "wvls": wvls,
        "alpha_sample": np.float32(props.get("alpha_sample", 0.1)),
        "wavelength": np.float32(props.get("wavelength", -1.0)),
        "twosided": np.bool_(props.get("_twosided", False)),
        "_static": (P, T, H, L),
    }


def _statics(scene):
    for kind, slots in getattr(scene.config, "bsdf_static", ()):
        if kind == "measured_polarized":
            return slots
    return ()


def _lane_wavelengths(params, s, si, nc):
    fixed = params["wavelength"][s]
    if si.wavelengths.shape[-1]:
        wl = si.wavelengths
    else:
        reps = _RGB_REP_WAVELENGTHS[:nc] if nc <= 3 else \
            _RGB_REP_WAVELENGTHS + (550.0,) * (nc - 3)
        wl = jnp.broadcast_to(jnp.asarray(reps, jnp.float32),
                              si.t.shape + (nc,))
    return jnp.where(fixed > 0, fixed, wl)


def _phi_positive(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0, p + 2 * np.pi, p)


def _rotate_z(v, angle):
    """Rotation about +z (the reference's rotate_vector specialized to the
    axis it is always called with, measured_polarized.cpp:357-363)."""
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.stack([v[..., 0] * c - v[..., 1] * s,
                      v[..., 0] * s + v[..., 1] * c,
                      v[..., 2]], axis=-1)


def _rusinkiewicz(i, o):
    """(phi_d, theta_h, theta_d) of the isotropic Rusinkiewicz
    parameterization (measured_polarized.cpp:365-384)."""
    h = normalize(i + o)
    n = jnp.zeros_like(h).at[..., 2].set(1.0)
    b = _safe_norm(jnp.cross(n, h), fallback=(1.0, 0.0, 0.0))
    t = _safe_norm(jnp.cross(b, h), fallback=(0.0, 1.0, 0.0))
    td = safe_acos(jnp.sum(h * i, -1))
    th = safe_acos(h[..., 2])
    i_prj = _safe_norm(i - jnp.sum(i * h, -1, keepdims=True) * h,
                       fallback=(1.0, 0.0, 0.0))
    cos_pd = jnp.clip(jnp.sum(t * i_prj, -1), -1.0, 1.0)
    sin_pd = jnp.clip(jnp.sum(b * i_prj, -1), -1.0, 1.0)
    pd = jnp.arctan2(sin_pd, cos_pd)
    return pd, th, td


def _safe_norm(v, fallback):
    n2 = jnp.sum(v * v, -1, keepdims=True)
    ok = n2 > 1e-16
    v = jnp.where(ok, v, 1.0)
    v = v / jnp.sqrt(jnp.where(ok, jnp.sum(v * v, -1, keepdims=True), 1.0))
    return jnp.where(ok, v, jnp.asarray(fallback))


def _interp_mueller(params, st, s, phi_d, theta_d, theta_h, wl, active):
    """Parameter-interpolated 4x4 Mueller lookup: one 16-float gather per
    interpolation corner instead of the reference's 16 scalar eval() calls
    (measured_polarized.cpp:249-272). Returns (..., 4, 4)."""
    P, T, H, L = st
    pv = (params["phi_d"][s][:P], params["theta_d"][s][:T],
          params["theta_h"][s][:H], params["wvls"][s][:L])
    offs, wts = _interp_corners(pv, (phi_d, theta_d, theta_h, wl))
    table = params["m"][s][:P, :T, :H, :L].reshape(-1, 16)
    out = None
    for o, w in zip(offs, wts):
        idx = jnp.zeros_like(phi_d, dtype=jnp.int32) if o is None else o
        v = w[..., None] * jnp.take(table, idx, axis=0)
        out = v if out is None else out + v
    out = out.reshape(out.shape[:-1] + (4, 4))
    return jnp.where(active[..., None, None], out, 0.0)


def _mueller_per_channel(params, st, s, si, wi, wo, wl, active, mode):
    """Full polarized eval in std-frame coordinates; returns the per-channel
    Mueller stack (..., nc, 4, 4) already rotated into the implicit Stokes
    bases of -wo_hat / wi_hat (measured_polarized.cpp:218-289)."""
    wo_hat = wo if mode == common.RADIANCE else wi
    wi_hat = wi if mode == common.RADIANCE else wo

    phi_std = _phi_positive(wi_hat)
    wo_std = _rotate_z(wo_hat, -phi_std)
    wi_std = _rotate_z(wi_hat, -phi_std)
    pd, th, td = _rusinkiewicz(wo_std, wi_std)

    nc = wl.shape[-1]
    mats = []
    for c in range(nc):
        mats.append(_interp_mueller(params, st, s, pd, td, th, wl[..., c],
                                    active))
    m = jnp.stack(mats, axis=-3)  # (..., nc, 4, 4)

    # NaN-encoded invalid configurations -> 0 (measured_polarized.cpp:274-276)
    bad = jnp.any(jnp.isnan(m[..., 0, 0]), axis=-1)
    m = jnp.where(bad[..., None, None, None], 0.0, m)
    m = jnp.nan_to_num(m)
    m = m.at[..., 0, 0].set(jnp.maximum(m[..., 0, 0], 0.0))

    # Stokes frames of the standard configuration (Baek et al. Fig. 4)
    zo = -wo_std
    to = _safe_norm(jnp.cross(wo_std - wi_std, zo), (1.0, 0.0, 0.0))
    yo = _safe_norm(jnp.cross(to, zo), (0.0, 1.0, 0.0))
    xo = jnp.cross(yo, zo)
    zi = wi_std
    ti = _safe_norm(jnp.cross(wi_std - wo_std, zi), (1.0, 0.0, 0.0))
    yi = _safe_norm(jnp.cross(ti, zi), (0.0, 1.0, 0.0))
    xi = jnp.cross(yi, zi)

    xo_hat = _rotate_z(xo, phi_std)
    xi_hat = _rotate_z(xi, phi_std)
    m = mu.rotate_mueller_basis(
        m, -wo_hat[..., None, :], xo_hat[..., None, :],
        mu.stokes_basis(-wo_hat)[..., None, :],
        wi_hat[..., None, :], xi_hat[..., None, :],
        mu.stokes_basis(wi_hat)[..., None, :])
    return m


def _pdf(params, s, wi, wo, active):
    """Fixed cosine/GGX mixture (measured_polarized.cpp:315-338)."""
    alpha = params["alpha_sample"][s]
    h = normalize(wi + wo)
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo)
    pdf_micro = mf.pdf(mf.GGX, wi, h, alpha, alpha) \
        / jnp.maximum(4.0 * jnp.sum(wo * h, -1), 1e-12)
    pdf = _COSINE_WEIGHT * pdf_diff + (1.0 - _COSINE_WEIGHT) * pdf_micro
    return jnp.where(active & (wi[..., 2] > 0) & (wo[..., 2] > 0), pdf, 0.0)


def eval_pdf(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    cfg = scene.config
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    statics = _statics(scene)
    value = jnp.zeros(si.t.shape + (nc,))
    pdf = jnp.zeros(si.t.shape)
    for s, st in enumerate(statics):
        m = active & (slot == s)
        wi, flip = common.twosided_frame(
            jnp.broadcast_to(params["twosided"][s], si.t.shape), si.wi)
        wo_s = jnp.where(flip[..., None], common.flip_z(wo), wo)
        act = m & (wi[..., 2] > 0) & (wo_s[..., 2] > 0)
        wl = _lane_wavelengths(params, s, si, nc)

        wo_hat = wo_s if mode == common.RADIANCE else wi
        wi_hat = wi if mode == common.RADIANCE else wo_s
        phi_std = _phi_positive(wi_hat)
        pd, th, td = _rusinkiewicz(_rotate_z(wo_hat, -phi_std),
                                   _rotate_z(wi_hat, -phi_std))
        spec = []
        for c in range(nc):
            m44 = _interp_mueller(params, st, s, pd, td, th, wl[..., c], act)
            spec.append(m44[..., 0, 0])
        v = jnp.maximum(jnp.nan_to_num(jnp.stack(spec, -1)), 0.0)
        v = v * wo_s[..., 2:3]  # (value * cos_theta_o, cpp:312)
        value = jnp.where(m[..., None], jnp.where(act[..., None], v, 0.0),
                          value)
        pdf = jnp.where(m, _pdf(params, s, wi, wo_s, act), pdf)
    return value, pdf


def sample(scene, params, slot, si, s1, s2, active, mode=common.RADIANCE):
    cfg = scene.config
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    statics = _statics(scene)
    bs, weight = common.zero_bsdf_sample(si.t.shape, nc)
    for s, _st in enumerate(statics):
        m = active & (slot == s)
        wi, flip = common.twosided_frame(
            jnp.broadcast_to(params["twosided"][s], si.t.shape), si.wi)
        act = m & (wi[..., 2] > 0)
        alpha = params["alpha_sample"][s]

        wo_diff = warp.square_to_cosine_hemisphere(s2)
        mh, _ = mf.sample(mf.GGX, wi, jnp.broadcast_to(alpha, si.t.shape),
                          jnp.broadcast_to(alpha, si.t.shape), s2)
        wo_micro = 2.0 * jnp.sum(mh * wi, -1, keepdims=True) * mh - wi
        sel_diff = s1 < _COSINE_WEIGHT
        wo = jnp.where(sel_diff[..., None], wo_diff, wo_micro)

        wo_world = jnp.where(flip[..., None], common.flip_z(wo), wo)
        v, p = eval_pdf(scene, params,
                        jnp.full_like(slot, s), si, wo_world, m, mode)
        act_o = act & (wo[..., 2] > 0) & (p > 0)
        w = jnp.where(act_o[..., None],
                      v / jnp.maximum(p, 1e-20)[..., None], 0.0)
        bs = common.BSDFSample(
            wo=jnp.where(m[..., None], wo_world, bs.wo),
            pdf=jnp.where(m, jnp.where(act_o, p, 0.0), bs.pdf),
            eta=bs.eta,
            sampled_type=jnp.where(
                m, jnp.uint32(common.GlossyReflection | common.FrontSide),
                bs.sampled_type))
        weight = jnp.where(m[..., None], w, weight)
    return bs, weight


def eval_mueller(scene, params, slot, si, wo, active, mode=common.RADIANCE):
    """Polarization-aware eval: per-channel Mueller stack (..., nc, 4, 4)
    times cos(theta_o), in the implicit -wo_hat / wi_hat Stokes frames."""
    cfg = scene.config
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    statics = _statics(scene)
    out = jnp.zeros(si.t.shape + (nc, 4, 4))
    for s, st in enumerate(statics):
        m = active & (slot == s)
        wi, flip = common.twosided_frame(
            jnp.broadcast_to(params["twosided"][s], si.t.shape), si.wi)
        wo_s = jnp.where(flip[..., None], common.flip_z(wo), wo)
        act = m & (wi[..., 2] > 0) & (wo_s[..., 2] > 0)
        wl = _lane_wavelengths(params, s, si, nc)
        mm = _mueller_per_channel(params, st, s, si, wi, wo_s, wl, act, mode)
        mm = mm * wo_s[..., 2, None, None, None]
        out = jnp.where(m[..., None, None, None],
                        jnp.where(act[..., None, None, None], mm, 0.0), out)
    return out
