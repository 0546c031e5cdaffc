"""Spectra and textures: the value-providers for all scene parameters.

Design: the reference's ``Texture`` plugin tree (texture.h:23-201, src/spectra,
src/textures) becomes two flat SoA registries dispatched by masked sweeps over
the (static) set of kinds present in the scene — the TPU analog of Enoki's
vectorized vtables (SURVEY §5.9):

  - the *spectrum registry* maps wavelengths -> scalar value per object. In
    rgb/mono variants every spectrum is baked at scene-build time into a
    'baked' kind holding (n, nc) constants (the reference likewise collapses
    spectra to RGB in non-spectral variants via spectrum_to_rgb / srgb model).
  - the *texture registry* maps a SurfaceInteraction -> (..., nc) value, and
    bottoms out in spectrum lookups ('constant') or image data ('bitmap',
    'checkerboard').

Parameter refs inside other registries are plain int32 indices into these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import spectrum as sp
from ..core.gather import table_gather as tg


# =============================================================================
# Spectrum registry
# =============================================================================
#
# scene.spectra: dict kind -> dict of arrays. Global spectrum index i maps to
# (spec_kind[i], spec_slot[i]). Kind parameter layouts:
#   'baked':     value (n, nc)                              [rgb/mono variants]
#   'uniform':   value (n,)                                 [uniform.cpp:35-48]
#   'regular':   values (n, K) padded, lo (n,), hi (n,), count (n,)
#                                                           [regular.cpp:21-51]
#   'irregular': nodes (n, K), values (n, K), count (n,)    [irregular.cpp]
#   'srgb':      rgb (n, 3) — smooth spectral upsampling    [srgb.cpp:14-37]
#   'blackbody': temperature (n,), scale (n,)               [blackbody.cpp]
#   'd65':       scale (n,)                                 [d65.cpp]


def spectrum_eval(spectra: dict, spec_kind, spec_slot, kinds: tuple,
                  wavelengths, n_channels: int):
    """Evaluate spectrum objects for each lane.

    spec_kind/spec_slot: (...,) i32 per lane; wavelengths: (..., nw) (ignored
    for baked kinds). Returns (..., nc) with nc = n_channels (color modes) or
    nw (spectral mode).
    """
    if "baked" in kinds and len(kinds) == 1:
        vals = spectra["baked"]["value"]
        return tg(vals, spec_slot)

    out_w = wavelengths.shape[-1]
    out = jnp.zeros(spec_kind.shape + (out_w,))
    for k, kind in enumerate(kinds):
        m = (spec_kind == k)
        p = spectra[kind]
        if kind == "baked":
            v = jnp.broadcast_to(tg(p["value"], spec_slot), out.shape)
        elif kind == "uniform":
            v = jnp.broadcast_to(tg(p["value"], spec_slot)[..., None], out.shape)
        elif kind == "regular":
            lo = tg(p["lo"], spec_slot)[..., None]
            hi = tg(p["hi"], spec_slot)[..., None]
            vals = tg(p["values"], spec_slot)  # (..., K)
            K = vals.shape[-1]
            cnt = tg(p["count"], spec_slot)[..., None]
            t = (wavelengths - lo) / jnp.maximum(hi - lo, 1e-9) * (cnt - 1)
            i0 = jnp.clip(t.astype(jnp.int32), 0, K - 2)
            i0 = jnp.minimum(i0, jnp.maximum(cnt - 2, 0))
            f = jnp.clip(t - i0, 0.0, 1.0)
            v0 = jnp.take_along_axis(vals, i0, axis=-1)
            v1 = jnp.take_along_axis(vals, jnp.minimum(i0 + 1, K - 1), axis=-1)
            v = v0 * (1 - f) + v1 * f
            inside = (wavelengths >= lo) & (wavelengths <= hi)
            v = jnp.where(inside, v, 0.0)
        elif kind == "irregular":
            nodes = tg(p["nodes"], spec_slot)   # (..., K)
            vals = tg(p["values"], spec_slot)
            K = vals.shape[-1]
            cnt = tg(p["count"], spec_slot)[..., None]
            idx = jnp.clip(
                jnp.sum((wavelengths[..., None, :] >= nodes[..., :, None]).astype(jnp.int32),
                        axis=-2) - 1, 0, K - 2)
            idx = jnp.minimum(idx, jnp.maximum(cnt - 2, 0))
            x0 = jnp.take_along_axis(nodes, idx, -1)
            x1 = jnp.take_along_axis(nodes, idx + 1, -1)
            y0 = jnp.take_along_axis(vals, idx, -1)
            y1 = jnp.take_along_axis(vals, idx + 1, -1)
            f = jnp.clip((wavelengths - x0) / jnp.maximum(x1 - x0, 1e-9), 0, 1)
            v = y0 * (1 - f) + y1 * f
            last = jnp.take_along_axis(nodes, jnp.maximum(cnt - 1, 0), -1)
            inside = (wavelengths >= nodes[..., :1]) & (wavelengths <= last)
            v = jnp.where(inside, v, 0.0)
        elif kind == "srgb":
            coeff = tg(p["coeff"], spec_slot)  # (..., 3) sigmoid-polynomial coeffs
            v = srgb_model_eval(coeff, wavelengths)
        elif kind == "blackbody":
            T = tg(p["temperature"], spec_slot)[..., None]
            s = tg(p["scale"], spec_slot)[..., None]
            v = sp.blackbody_radiance(wavelengths, T) * s
        elif kind == "d65":
            s = tg(p["scale"], spec_slot)[..., None]
            v = d65_approx(wavelengths) * s
        elif kind == "srgb_d65":
            coeff = tg(p["coeff"], spec_slot)
            s = tg(p["scale"], spec_slot)[..., None]
            v = srgb_model_eval(coeff, wavelengths) * d65_approx(wavelengths) * s
        elif kind == "discrete":
            v = jnp.zeros_like(wavelengths)  # line spectrum: eval = 0 a.s.
        else:
            raise ValueError(f"unknown spectrum kind {kind}")
        out = jnp.where(m[..., None], v, out)
    return out


def srgb_model_eval(coeff, wavelengths):
    """Sigmoid-polynomial reflectance model (reference: srgb.h:9-21,
    Jakob & Hanika 2019). coeff: (..., 3); wavelengths nm."""
    x = coeff[..., 0:1] * wavelengths ** 2 + coeff[..., 1:2] * wavelengths + coeff[..., 2:3]
    return 0.5 * x / jnp.sqrt(1.0 + x * x) + 0.5


def d65_approx(wavelengths):
    """CIE D65 daylight illuminant, normalized to ~1 luminance scale.

    Analytic approximation: blackbody at 6504 K rescaled to unit mean over
    the visible range (the real D65 table can be swapped in later; emitters
    normalize against luminance so smooth errors are small)."""
    bb = sp.blackbody_radiance(wavelengths, 6504.0)
    bb_mean = sp.blackbody_radiance(jnp.asarray(560.0), 6504.0)
    return bb / bb_mean


# =============================================================================
# Texture registry
# =============================================================================
#
# scene.textures: dict kind -> params; tex_kind/tex_slot (n_textures,) tables.
# Kind layouts:
#   'constant':     spec (n,) i32 spectrum index
#   'checkerboard': spec0 (n,) i32, spec1 (n,) i32, scale_u, scale_v (later)
#   'bitmap':       data (n, H, W, C) padded, spec of nothing; raw rgb


def scene_spectrum_eval(scene, spec_idx, wavelengths):
    """Evaluate a spectrum index directly (no texture indirection) — used for
    non-spatially-varying quantities like conductor eta/k."""
    cfg = scene.config
    return spectrum_eval(scene.spectra, tg(scene.spec_kind, spec_idx),
                         tg(scene.spec_slot, spec_idx), cfg.spectrum_kinds,
                         wavelengths, cfg.variant.n_channels)


def texture_eval(scene, tex_index, si_uv, wavelengths, active=True,
                 si_extra=None):
    """Evaluate texture objects per lane -> (..., nc). ``si_extra``:
    optional dict with 'prim_index'/'prim_uv' for mesh-attribute lookups."""
    cfg = scene.config
    kinds = cfg.texture_kinds
    tex_kind = tg(scene.tex_kind, tex_index)
    tex_slot = tg(scene.tex_slot, tex_index)
    nc = wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    out = jnp.zeros(tex_kind.shape + (nc,))

    def spec_eval(spec_idx):
        return spectrum_eval(scene.spectra, tg(scene.spec_kind, spec_idx),
                             tg(scene.spec_slot, spec_idx),
                             cfg.spectrum_kinds,
                             wavelengths, cfg.variant.n_channels)

    for k, kind in enumerate(kinds):
        m = (tex_kind == k)
        p = scene.textures[kind]
        if kind == "constant":
            v = spec_eval(tg(p["spec"], tex_slot))
        elif kind == "checkerboard":
            iu = jnp.floor(si_uv[..., 0] * 2.0).astype(jnp.int32)
            iv = jnp.floor(si_uv[..., 1] * 2.0).astype(jnp.int32)
            odd = ((iu + iv) & 1) == 1
            v0 = spec_eval(tg(p["spec0"], tex_slot))
            v1 = spec_eval(tg(p["spec1"], tex_slot))
            v = jnp.where(odd[..., None], v1, v0)
        elif kind == "bitmap":
            data = scene.bitmap_data  # (n_bitmaps, H, W, 3)
            img = tg(p["image"], tex_slot)  # index into bitmap_data
            H, W = data.shape[1], data.shape[2]
            u = jnp.clip(si_uv[..., 0], 0.0, 1.0 - 1e-6) * (W - 1)
            v_ = jnp.clip(si_uv[..., 1], 0.0, 1.0 - 1e-6) * (H - 1)
            x0 = u.astype(jnp.int32)
            y0 = v_.astype(jnp.int32)
            fx = (u - x0)[..., None]
            fy = (v_ - y0)[..., None]
            x1 = jnp.minimum(x0 + 1, W - 1)
            y1 = jnp.minimum(y0 + 1, H - 1)
            if cfg.variant.is_spectral:
                # rgb2spec upsampling baked at scene build (bitmap_coeff/
                # scale pools, envmap.cpp:69-89 scheme): interpolate the
                # sigmoid-poly coefficients + brightness scale bilinearly,
                # then evaluate at the ray's hero wavelengths
                cf = scene.bitmap_coeff
                sc = scene.bitmap_scale
                k00 = cf[img, y0, x0]
                k01 = cf[img, y0, x1]
                k10 = cf[img, y1, x0]
                k11 = cf[img, y1, x1]
                coeff = (k00 * (1 - fx) * (1 - fy) + k01 * fx * (1 - fy)
                         + k10 * (1 - fx) * fy + k11 * fx * fy)
                s00 = sc[img, y0, x0]
                s01 = sc[img, y0, x1]
                s10 = sc[img, y1, x0]
                s11 = sc[img, y1, x1]
                fx1 = fx[..., 0]
                fy1 = fy[..., 0]
                scale = (s00 * (1 - fx1) * (1 - fy1) + s01 * fx1 * (1 - fy1)
                         + s10 * (1 - fx1) * fy1 + s11 * fx1 * fy1)
                v = srgb_model_eval(coeff, wavelengths) * scale[..., None]
            else:
                c00 = data[img, y0, x0]
                c01 = data[img, y0, x1]
                c10 = data[img, y1, x0]
                c11 = data[img, y1, x1]
                rgb = (c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy)
                       + c10 * (1 - fx) * fy + c11 * fx * fy)
                if cfg.variant.is_monochromatic:
                    v = jnp.mean(rgb, axis=-1, keepdims=True)
                else:
                    v = rgb
        elif kind == "mesh_attribute":
            # barycentric interpolation of per-vertex data
            # (mesh_attribute.cpp; mesh.h attribute system)
            geo = scene.geo
            attr = tg(p["attr"], tex_slot)
            f = tg(geo.faces, si_extra["prim_index"]) \
                if si_extra is not None else None
            if f is None:
                v = jnp.zeros(tex_kind.shape + (nc,))
            else:
                data = scene.mesh_attr_data  # (A, V, 3)
                u_ = si_extra["prim_uv"][..., 0]
                v_ = si_extra["prim_uv"][..., 1]
                w_ = 1.0 - u_ - v_
                a0 = data[attr, f[..., 0]]
                a1 = data[attr, f[..., 1]]
                a2 = data[attr, f[..., 2]]
                rgb = (a0 * w_[..., None] + a1 * u_[..., None]
                       + a2 * v_[..., None]) * tg(p["scale"], tex_slot)[..., None]
                if cfg.variant.is_monochromatic:
                    v = jnp.mean(rgb, -1, keepdims=True)
                elif cfg.variant.is_spectral:
                    v = jnp.broadcast_to(jnp.mean(rgb, -1, keepdims=True),
                                         rgb.shape[:-1] + (nc,))
                else:
                    v = rgb
        else:
            raise ValueError(f"unknown texture kind {kind}")
        out = jnp.where(m[..., None], v, out)
    return out


# =============================================================================
# Spectral importance sampling (Texture::sample_spectrum / pdf_spectrum,
# texture.h:23-201). Every continuous spectrum kind carries a build-time
# piecewise-linear sampling table (scene/build.py:_spectrum_sampling_table);
# sampling inverts that table's CDF (quadratic within a segment) and the pdf
# is the same table's density — one masked-sweep branch for all kinds.
# =============================================================================

def _table_invert_cdf(nodes, pdfv, cdf, u):
    """Invert the piecewise-linear-density CDF. nodes/pdfv/cdf: (..., P);
    u: (..., nw) uniforms. Returns wavelengths (..., nw)."""
    P = nodes.shape[-1]
    u_ = u[..., None, :]
    seg = jnp.clip(jnp.sum((u_ >= cdf[..., :, None]).astype(jnp.int32),
                           axis=-2) - 1, 0, P - 2)
    take = lambda a, i: jnp.take_along_axis(a, i, axis=-1)
    c0 = take(cdf, seg)
    x0 = take(nodes, seg)
    x1 = take(nodes, seg + 1)
    y0 = take(pdfv, seg)
    y1 = take(pdfv, seg + 1)
    dx = jnp.maximum(x1 - x0, 1e-9)
    du = u - c0
    slope = (y1 - y0) / dx
    disc = jnp.maximum(y0 * y0 + 2.0 * slope * du, 0.0)
    t_quad = 2.0 * du / jnp.maximum(y0 + jnp.sqrt(disc), 1e-12)
    t_lin = du / jnp.maximum(y0, 1e-12)
    t = jnp.where(jnp.abs(slope) * dx < 1e-9 * jnp.maximum(y0, 1e-9),
                  t_lin, t_quad)
    return x0 + jnp.clip(t, 0.0, dx)


def _table_pdf(nodes, pdfv, lam):
    """Density of the sampling table at wavelengths lam (..., nw)."""
    P = nodes.shape[-1]
    lam_ = lam[..., None, :]
    seg = jnp.clip(jnp.sum((lam_ >= nodes[..., :, None]).astype(jnp.int32),
                           axis=-2) - 1, 0, P - 2)
    take = lambda a, i: jnp.take_along_axis(a, i, axis=-1)
    x0 = take(nodes, seg)
    x1 = take(nodes, seg + 1)
    y0 = take(pdfv, seg)
    y1 = take(pdfv, seg + 1)
    f = jnp.clip((lam - x0) / jnp.maximum(x1 - x0, 1e-9), 0.0, 1.0)
    p = y0 * (1 - f) + y1 * f
    inside = (lam >= nodes[..., 0:1]) & (lam <= nodes[..., P - 1:P])
    return jnp.where(inside, p, 0.0)


def spectrum_sample(spectra, spec_kind, spec_slot, kinds, sample):
    """Importance-sample hero wavelengths from spectrum objects.

    sample: (...,) uniform; returns (wavelengths (..., nw), weight (..., nw))
    with weight = eval / pdf (regular.cpp:87-97 contract: for an exactly
    table-resolved spectrum the weight equals its integral). Discrete line
    spectra return their lines with weight = sum of line values."""
    ws = sp.sample_shifted(sample)                       # (..., nw) strata
    nw = ws.shape[-1]
    lam = jnp.broadcast_to(
        sp.WAVELENGTH_MIN + ws * (sp.WAVELENGTH_MAX - sp.WAVELENGTH_MIN),
        spec_kind.shape + (nw,))
    pdf = jnp.full_like(lam, 1.0 / (sp.WAVELENGTH_MAX - sp.WAVELENGTH_MIN))
    w_discrete = jnp.zeros_like(lam)
    is_discrete = jnp.zeros(spec_kind.shape + (1,), bool)
    for k, kind in enumerate(kinds):
        m = (spec_kind == k)
        p = spectra[kind]
        if kind == "baked":
            continue  # non-spectral variants never reach here
        if kind == "discrete":
            lines = tg(p["wavelengths"], spec_slot)      # (..., K)
            vals = tg(p["values"], spec_slot)
            cnt = tg(p["count"], spec_slot)[..., None]
            K = lines.shape[-1]
            valid = jnp.arange(K) < cnt
            vv = jnp.where(valid, vals, 0.0)
            total = jnp.sum(vv, -1, keepdims=True)
            cdf = jnp.cumsum(vv, -1) / jnp.maximum(total, 1e-20)
            idx = jnp.clip(jnp.sum((ws[..., None, :] >= cdf[..., :, None])
                                   .astype(jnp.int32), axis=-2), 0, K - 1)
            l_k = jnp.take_along_axis(lines, idx, -1)
            lam = jnp.where(m[..., None], l_k, lam)
            w_discrete = jnp.where(m[..., None],
                                   jnp.broadcast_to(total, l_k.shape),
                                   w_discrete)
            is_discrete = is_discrete | m[..., None]
        else:
            nodes = tg(p["smp_nodes"], spec_slot)
            pdfv = tg(p["smp_pdf"], spec_slot)
            cdf = tg(p["smp_cdf"], spec_slot)
            l_k = _table_invert_cdf(nodes, pdfv, cdf,
                                    jnp.broadcast_to(ws, nodes.shape[:-1] + (nw,)))
            p_k = _table_pdf(nodes, pdfv, l_k)
            lam = jnp.where(m[..., None], l_k, lam)
            pdf = jnp.where(m[..., None], p_k, pdf)
    val = spectrum_eval(spectra, spec_kind, spec_slot, kinds, lam, nw)
    weight = jnp.where(is_discrete, w_discrete,
                       val / jnp.maximum(pdf, 1e-20))
    return lam, weight


def spectrum_pdf(spectra, spec_kind, spec_slot, kinds, wavelengths):
    """Density of spectrum_sample at the given wavelengths (pdf_spectrum,
    texture.h contract; 0 for discrete kinds whose measure has atoms)."""
    pdf = jnp.full(spec_kind.shape + (wavelengths.shape[-1],),
                   1.0 / (sp.WAVELENGTH_MAX - sp.WAVELENGTH_MIN))
    for k, kind in enumerate(kinds):
        m = (spec_kind == k)
        p = spectra[kind]
        if kind == "baked":
            continue
        if kind == "discrete":
            pdf = jnp.where(m[..., None], 0.0, pdf)
        else:
            nodes = tg(p["smp_nodes"], spec_slot)
            pdfv = tg(p["smp_pdf"], spec_slot)
            p_k = _table_pdf(nodes, pdfv, wavelengths)
            pdf = jnp.where(m[..., None], p_k, pdf)
    return pdf


def scene_spectrum_sample(scene, spec_idx, sample):
    cfg = scene.config
    return spectrum_sample(scene.spectra, tg(scene.spec_kind, spec_idx),
                           tg(scene.spec_slot, spec_idx), cfg.spectrum_kinds,
                           sample)


def scene_spectrum_pdf(scene, spec_idx, wavelengths):
    cfg = scene.config
    return spectrum_pdf(scene.spectra, tg(scene.spec_kind, spec_idx),
                        tg(scene.spec_slot, spec_idx), cfg.spectrum_kinds,
                        wavelengths)


def texture_sample_spectrum(scene, tex_index, si_uv, sample, active=True):
    """Texture::sample_spectrum: 'constant' textures importance-sample their
    underlying spectrum; spatially-varying kinds (bitmap/checkerboard/
    mesh_attribute) sample uniformly over the global range with weight =
    eval * range (their spectral axis is flat)."""
    cfg = scene.config
    tex_kind = tg(scene.tex_kind, tex_index)
    tex_slot = tg(scene.tex_slot, tex_index)
    rng_w = sp.WAVELENGTH_MAX - sp.WAVELENGTH_MIN
    ws = sp.sample_shifted(sample)
    lam = jnp.broadcast_to(sp.WAVELENGTH_MIN + ws * rng_w,
                           tex_kind.shape + (ws.shape[-1],))
    weight = None
    for k, kind in enumerate(cfg.texture_kinds):
        m = (tex_kind == k)
        if kind == "constant":
            spec = tg(scene.textures["constant"]["spec"], tex_slot)
            l_k, w_k = scene_spectrum_sample(scene, spec, sample)
            lam = jnp.where(m[..., None], l_k, lam)
        else:
            w_k = None
        if weight is None and w_k is not None:
            weight = jnp.where(m[..., None], w_k, 0.0)
        elif w_k is not None:
            weight = jnp.where(m[..., None], w_k, weight)
    uni = texture_eval(scene, tex_index, si_uv, lam, active) * rng_w
    if weight is None:
        weight = uni
    else:
        const_k = cfg.texture_kinds.index("constant") \
            if "constant" in cfg.texture_kinds else -1
        weight = jnp.where((tex_kind == const_k)[..., None], weight, uni)
    return lam, jnp.where(active[..., None] if hasattr(active, "ndim")
                          else jnp.asarray(active)[..., None], weight, 0.0)


def texture_pdf_spectrum(scene, tex_index, si_uv, wavelengths):
    cfg = scene.config
    tex_kind = tg(scene.tex_kind, tex_index)
    tex_slot = tg(scene.tex_slot, tex_index)
    pdf = jnp.full(tex_kind.shape + (wavelengths.shape[-1],),
                   1.0 / (sp.WAVELENGTH_MAX - sp.WAVELENGTH_MIN))
    if "constant" in cfg.texture_kinds:
        k = cfg.texture_kinds.index("constant")
        spec = tg(scene.textures["constant"]["spec"], tex_slot)
        p_c = scene_spectrum_pdf(scene, spec, wavelengths)
        pdf = jnp.where((tex_kind == k)[..., None], p_c, pdf)
    return pdf
